"""PII redaction with stable placeholders.

Reference semantics: internal/chat/session.go:67-107 (``Redact``):
predict -> FilterEntities -> sort (start asc, end desc) -> skip overlaps ->
replace each span with a stable ``[LABEL_n]`` placeholder; the assignment
map persists across calls within a session so the same (text, label) pair
always gets the same placeholder.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .entity import Entity
from .postprocess import filter_entities


@dataclass
class TagMetadata:
    assigned: dict[str, str] = field(default_factory=dict)  # "text_LABEL" -> tag
    tag_map: dict[str, str] = field(default_factory=dict)  # "[LABEL_n]" -> text
    label_counts: dict[str, int] = field(default_factory=dict)


def redact(
    text: str, model, metadata: TagMetadata | None = None
) -> tuple[str, TagMetadata]:
    metadata = metadata or TagMetadata()
    tb = text.encode("utf-8")
    entities = filter_entities(tb, model.predict(tb))
    return redact_spans(tb, entities, metadata)


def redact_spans(
    text_bytes: bytes, entities: list[Entity], metadata: TagMetadata
) -> tuple[str, TagMetadata]:
    entities = sorted(entities, key=lambda e: (e.start, -e.end))
    out = bytearray()
    cursor = 0
    for ent in entities:
        if ent.start < cursor or ent.end > len(text_bytes):
            continue  # overlap or out-of-range: keep the earlier span's tag
        out += text_bytes[cursor : ent.start]
        key = f"{ent.text}_{ent.label}"
        user_tag = metadata.assigned.get(key)
        if user_tag is None:
            metadata.label_counts[ent.label] = (
                metadata.label_counts.get(ent.label, 0) + 1
            )
            user_tag = f"[{ent.label}_{metadata.label_counts[ent.label]}]"
            metadata.assigned[key] = user_tag
            metadata.tag_map[user_tag] = ent.text
        out += user_tag.encode("utf-8")
        cursor = ent.end
    out += text_bytes[cursor:]
    return out.decode("utf-8", errors="ignore"), metadata
