"""Ensemble operators: span-cluster merge (P5) and per-token majority vote (P7).

Reference semantics:

* merge_predictions — plugin/plugin-python/models/transformer_presidio/
  models.py:30-99: sort all spans by start, cluster by overlap connectivity,
  then per cluster: (a) no primary (Presidio) member → keep every secondary
  span; (b) exactly one distinct primary label → emit ONE span covering the
  union of the whole cluster with that label; (c) conflicting primary labels
  → keep the longest primary span.
* majority_vote — plugin/plugin-python/models/ensemble/ensemble.py:37-92:
  all models emit one tag per whitespace token; the per-token mode wins
  (ties resolve to the first model's tag, like collections.Counter); non-O
  tokens become entities with offsets found by forward scan.

Both operate on byte offsets into the UTF-8 text, matching object_entities.
"""

from __future__ import annotations

from collections import Counter

from .entity import Entity, create_entity


def merge_predictions(
    primary: list[Entity], secondary: list[Entity], text: bytes
) -> list[Entity]:
    """Merge two span lists; `primary` wins conflicts (the Presidio role)."""
    items = [(e, True) for e in primary] + [(e, False) for e in secondary]
    items.sort(key=lambda x: (x[0].start, x[0].end))

    clusters: list[list[tuple[Entity, bool]]] = []
    cluster: list[tuple[Entity, bool]] = []
    cluster_end = -1
    for ent, is_primary in items:
        # NOTE `<=` with end-EXCLUSIVE spans means adjacent touching spans
        # (a.end == b.start) land in one cluster. That is the reference's
        # own comparison (models.py:55 `s <= cluster_end` on
        # python-slice-convention entities) — kept bug-for-bug.
        if cluster and ent.start <= cluster_end:
            cluster.append((ent, is_primary))
            cluster_end = max(cluster_end, ent.end)
        else:
            if cluster:
                clusters.append(cluster)
            cluster = [(ent, is_primary)]
            cluster_end = ent.end
    if cluster:
        clusters.append(cluster)

    merged: list[Entity] = []
    for cluster in clusters:
        prim = [e for e, is_p in cluster if is_p]
        sec = [e for e, is_p in cluster if not is_p]
        if not prim:
            merged.extend(sec)
            continue
        labels = {e.label for e in prim}
        if len(labels) == 1:
            start = min(e.start for e in prim + sec)
            end = max(e.end for e in prim + sec)
            merged.append(create_entity(prim[0].label, text, start, end))
        else:
            # conflicting primary labels: longest span wins (models.py:92-94;
            # the reference tiebreaks on score, which our spans don't carry —
            # smallest start is the deterministic stand-in)
            merged.append(
                max(prim, key=lambda e: (e.end - e.start, -e.start))
            )
    return merged


def majority_vote(text: bytes, model_tags: list[list[str]]) -> list[Entity]:
    """Per-whitespace-token majority vote across models' tag sequences.

    Tokenization is UNICODE whitespace (the reference's Python ``str.split``,
    ensemble.py:44), not ``bytes.split`` (ASCII-only) — e.g. U+00A0 breaks
    tokens under reference semantics, so the token count must match the tag
    sequences the models produced under that tokenization. Offsets stay
    byte-based: each unicode token is re-encoded and located by forward scan.
    """
    tokens = [t.encode("utf-8") for t in text.decode("utf-8").split()]
    for i, tags in enumerate(model_tags):
        if len(tags) != len(tokens):
            raise ValueError(
                f"model {i} emitted {len(tags)} tags for {len(tokens)} tokens"
            )
    entities: list[Entity] = []
    offset = 0
    for t_idx, tok in enumerate(tokens):
        idx = text.find(tok, offset)
        if idx == -1:
            idx = offset
        offset = idx + len(tok)
        choices = [model_tags[m][t_idx] for m in range(len(model_tags))]
        tag = Counter(choices).most_common(1)[0][0]
        if tag == "O":
            continue
        entities.append(create_entity(tag, text, idx, idx + len(tok)))
    return entities


class MergedModel:
    """P5-shaped model: primary.predict ∪ secondary.predict via the cluster
    merge. Registered as model_type='merged' (core.models)."""

    def __init__(self, primary, secondary):
        self.primary = primary
        self.secondary = secondary

    def predict(self, text: bytes) -> list[Entity]:
        return merge_predictions(
            self.primary.predict(text), self.secondary.predict(text), text
        )

    def get_tags(self) -> list[str]:
        tags: list[str] = []
        for m in (self.primary, self.secondary):
            if hasattr(m, "get_tags"):
                tags.extend(m.get_tags())
            elif hasattr(m, "patterns"):  # RegexModel
                tags.extend(m.patterns.keys())
        return sorted(set(tags))
