"""Per-document inference: the normative reference pipeline semantics.

Mirrors ``runInferenceOnObject`` + ``coalesceEntities`` + the preview builder
(internal/core/processor.go:438-686). This module is shared by the Spark
pandas-UDF kernels (batch loop over Arrow chunks) and the pytest oracle
(plain loop), so both execute literally the same code per document.

Web pages are far below the reference's 512 MB chunk cap
(internal/storage/parser.go:23), so 1 document = 1 chunk at offset 0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .entity import Entity, create_entity, sanitize_utf8
from .postprocess import filter_entities

# internal/core/processor.go:43-48
EXCLUDED_TAGS = frozenset(
    {"GENDER", "SEXUAL_ORIENTATION", "ETHNICITY", "SERVICE_CODE"}
)

PREVIEW_LIMIT = 1000  # processor.go:581

MAX_ENTITY_GAP = 1  # processor.go:520


@dataclass
class InferenceResult:
    entities: list[Entity] = field(default_factory=list)
    groups: list[str] = field(default_factory=list)
    tag_count: dict[str, int] = field(default_factory=dict)
    custom_tag_count: dict[str, int] = field(default_factory=dict)
    total_tokens: int = 0
    preview_tokens: list[str] = field(default_factory=list)
    preview_tags: list[str] = field(default_factory=list)


def coalesce_entities(label_to_entities: dict[str, list[Entity]]) -> list[Entity]:
    """processor.go:519-554 — sort by start, merge same-label gap<=1 runs.

    Merged text is re-sliced from RContext in Go; equivalently the merged
    span's text is contiguous in the source, which we reproduce by stitching
    ``current.r_context[:gap]`` exactly as the reference does (the contexts
    are decoded strings whose leading bytes are ASCII-safe for gap<=1 in all
    reference-reachable cases; see tests for multi-byte coverage).
    """
    flattened: list[Entity] = []
    for ents in label_to_entities.values():
        flattened.extend(ents)
    if not flattened:
        return []

    flattened.sort(key=lambda e: e.start)

    out: list[Entity] = []
    cur = flattened[0]
    for nxt in flattened[1:]:
        gap = nxt.start - cur.end
        if cur.label == nxt.label and 0 <= gap <= MAX_ENTITY_GAP:
            cur = Entity(
                label=cur.label,
                text=cur.text + cur.r_context[:gap] + nxt.text,
                start=cur.start,
                end=nxt.end,
                l_context=cur.l_context,
                r_context=nxt.r_context,
            )
        else:
            out.append(cur)
            cur = nxt
    out.append(cur)
    return out


def scan_custom_tags(
    text: bytes, custom_tags: dict[str, re.Pattern]
) -> dict[str, list[Entity]]:
    """Custom-tag regex scan with 20-byte contexts (processor.go:615-628)."""
    found: dict[str, list[Entity]] = {}
    for tag in sorted(custom_tags):
        pattern = custom_tags[tag]
        matches = [
            create_entity(tag, text, m.start(), m.end())
            for m in pattern.finditer(text)
        ]
        if matches:
            found[tag] = matches
    return found


def compile_custom_tags(custom_tags: dict[str, str]) -> dict[str, re.Pattern]:
    return {tag: re.compile(p.encode("utf-8")) for tag, p in custom_tags.items()}


def build_preview(
    preview_text: bytes,
    model,
    custom_tags: dict[str, re.Pattern],
) -> tuple[list[str], list[str]]:
    """createObjectPreview semantics (processor.go:438-517).

    Re-runs the model + custom tags on the preview text, coalesces, and emits
    alternating O / label segments covering the whole preview text. Spans of
    DIFFERENT labels can overlap (coalesce only merges same-label runs); the
    cursor walk then re-emits the overlapped bytes and, for a strictly
    contained span, steps backwards — byte-for-byte the reference's behavior
    (processor.go:483-500), deliberately preserved rather than "fixed".
    """
    spans = model.predict(preview_text)
    spans = filter_entities(preview_text, spans)

    for tag in sorted(custom_tags):
        for m in custom_tags[tag].finditer(preview_text):
            spans.append(create_entity(tag, preview_text, m.start(), m.end()))

    span_map: dict[str, list[Entity]] = {}
    for span in spans:
        span_map.setdefault(span.label, []).append(span)
    coalesced = coalesce_entities(span_map)

    tokens: list[str] = []
    tags: list[str] = []
    cursor = 0
    length = len(preview_text)
    for e in coalesced:
        if e.label in EXCLUDED_TAGS:
            continue
        if e.start > cursor:
            tokens.append(sanitize_utf8(preview_text[cursor : e.start]))
            tags.append("O")
        end = min(e.end, length)
        tokens.append(sanitize_utf8(preview_text[e.start : end]))
        tags.append(e.label)
        cursor = end
    if cursor < length:
        tokens.append(sanitize_utf8(preview_text[cursor:]))
        tags.append("O")
    return tokens, tags


def run_inference_on_object(
    text: str,
    model,
    tags: set[str],
    custom_tags: dict[str, re.Pattern],
    group_filters: dict[str, object] | None = None,
    build_previews: bool = True,
    precomputed_entities: list[Entity] | None = None,
) -> InferenceResult:
    """Full per-document pipeline (processor.go:565-686), single chunk.

    ``precomputed_entities`` lets a batch caller supply the RAW model
    output (e.g. from CnnCrfModel.predict_batch) — everything downstream
    (filtering, tag selection, coalescing) runs identically either way.
    """
    result = InferenceResult()
    tb = text.encode("utf-8")

    chunk_entities = (
        precomputed_entities
        if precomputed_entities is not None
        else model.predict(tb)
    )
    chunk_entities = filter_entities(tb, chunk_entities)

    label_to_entities: dict[str, list[Entity]] = {}
    for entity in chunk_entities:
        if entity.label in EXCLUDED_TAGS:
            continue
        if entity.label in tags:
            label_to_entities.setdefault(entity.label, []).append(entity)

    for tag, ents in scan_custom_tags(tb, custom_tags).items():
        label_to_entities.setdefault(tag, []).extend(ents)

    fields = text.split()
    result.total_tokens = len(fields)

    if build_previews:
        preview_text = " ".join(fields[:PREVIEW_LIMIT]).encode("utf-8")
        result.preview_tokens, result.preview_tags = build_preview(
            preview_text, model, custom_tags
        )

    if group_filters:
        for group_name in sorted(group_filters):
            if group_filters[group_name].matches(label_to_entities):
                result.groups.append(group_name)

    result.entities = coalesce_entities(label_to_entities)

    for entity in result.entities:
        if entity.label in custom_tags:
            result.custom_tag_count[entity.label] = (
                result.custom_tag_count.get(entity.label, 0) + 1
            )
        else:
            result.tag_count[entity.label] = result.tag_count.get(entity.label, 0) + 1

    return result
