"""Entity spans with byte offsets and 20-byte contexts.

Reference semantics: internal/core/types/entity.go:5-26 —
``contextLength = 20``; Text/LContext/RContext are produced with
``strings.ToValidUTF8(s, "")`` which drops invalid UTF-8 byte runs; Start/End
are byte offsets into the document's UTF-8 text (Go string indexing).
"""

from __future__ import annotations

from typing import NamedTuple

CONTEXT_LENGTH = 20


def sanitize_utf8(b: bytes) -> str:
    """Decode bytes dropping invalid UTF-8 sequences.

    Matches Go's ``strings.ToValidUTF8(s, "")`` (entity.go:19-23): every run
    of invalid bytes is replaced by the empty string.
    """
    return b.decode("utf-8", errors="ignore")


class Entity(NamedTuple):
    label: str
    text: str
    start: int  # byte offset, inclusive
    end: int  # byte offset, exclusive
    l_context: str
    r_context: str


def create_entity(label: str, text_bytes: bytes, start: int, end: int) -> Entity:
    """Build an Entity with sanitized 20-byte contexts (entity.go:16-26)."""
    return Entity(
        label=label,
        text=sanitize_utf8(text_bytes[start:end]),
        start=start,
        end=end,
        l_context=sanitize_utf8(text_bytes[max(0, start - CONTEXT_LENGTH) : start]),
        r_context=sanitize_utf8(
            text_bytes[end : min(len(text_bytes), end + CONTEXT_LENGTH)]
        ),
    )
