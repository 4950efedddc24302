"""Length-preserving text cleaning with span maps.

Reference semantics: internal/core/preprocess.go:9-60. Punctuation adjacent
to whitespace is blanked (replaced by a space) in two passes, preserving byte
length; then ``\\S+`` tokens are re-joined with single spaces into a cleaned
text, with parallel span arrays mapping cleaned token positions back to the
original byte offsets. The cleaned text begins with one space (the Go builder
writes ' ' before every token, preprocess.go:50).

All offsets are byte offsets; inputs/outputs are ``bytes``.
"""

from __future__ import annotations

import re

PUNCT_CHARS = b"-,.!?:_\"'`)]}([{"

_PUNCT_CLASS = re.escape(PUNCT_CHARS)
_PUNCT_THEN_SPACE = re.compile(b"(\\S)[" + _PUNCT_CLASS + b"](\\s)")
_SPACE_THEN_PUNCT = re.compile(b"(\\s)[" + _PUNCT_CLASS + b"](\\S)")
_TOKEN = re.compile(rb"\S+")


def _replace_preserving_length(pattern: re.Pattern, text: bytes) -> bytes:
    new = pattern.sub(rb"\1 \2", text)
    if len(new) != len(text):
        raise ValueError(
            f"length changed during punctuation blanking: {len(text)} -> {len(new)}"
        )
    return new


def clean_text_with_spans(
    text: bytes,
) -> tuple[bytes, list[tuple[int, int]], list[tuple[int, int]]]:
    """Return (cleaned_text, original_spans, cleaned_spans), byte offsets."""
    text = _replace_preserving_length(_PUNCT_THEN_SPACE, text)
    text = _replace_preserving_length(_SPACE_THEN_PUNCT, text)

    original_spans: list[tuple[int, int]] = []
    cleaned_spans: list[tuple[int, int]] = []
    out = bytearray()

    for m in _TOKEN.finditer(text):
        token = m.group(0)
        out += b" "
        cleaned_start = len(out)
        out += token
        cleaned_end = len(out)
        original_spans.append((m.start(), m.end()))
        cleaned_spans.append((cleaned_start, cleaned_end))

    return bytes(out), original_spans, cleaned_spans


def split_text_custom_length(
    text: bytes, length: int = 100
) -> tuple[list[bytes], list[int]]:
    """Split into "sentences" of ``length`` non-whitespace tokens.

    Reference: internal/core/utils/text_utils.go:11-30 (DefaultSentenceLength
    = 100). Each sentence spans from the first token's start byte to the last
    token's end byte; returns (sentences, start_offsets).
    """
    idxs = [(m.start(), m.end()) for m in _TOKEN.finditer(text)]
    sentences: list[bytes] = []
    start_offsets: list[int] = []
    for i in range(0, len(idxs), length):
        end = min(i + length, len(idxs))
        start_offset = idxs[i][0]
        end_offset = idxs[end - 1][1]
        sentences.append(text[start_offset:end_offset])
        start_offsets.append(start_offset)
    return sentences, start_offsets
