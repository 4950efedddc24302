"""Golden tests for text cleaning and sentence splitting.

Ported from internal/core/utils/text_utils_test.go:10-51 and the
CleanTextWithSpans semantics of internal/core/preprocess.go:9-60.
"""

from ner_backend_spark.core.preprocess import (
    clean_text_with_spans,
    split_text_custom_length,
)


def test_split_text_custom_length_golden():
    # text_utils_test.go:18-37
    text = b"hello \n\n world \t\t how are you"
    sentences, offsets = split_text_custom_length(text, 2)
    assert sentences == [b"hello \n\n world", b"how are", b"you"]
    assert offsets == [0, 18, 26]


def test_split_text_empty():
    sentences, offsets = split_text_custom_length(b"", 100)
    assert sentences == [] and offsets == []


def test_split_text_default_100():
    tokens = b" ".join(b"tok%d" % i for i in range(250))
    sentences, offsets = split_text_custom_length(tokens, 100)
    assert len(sentences) == 3
    assert offsets[0] == 0
    # every sentence starts/ends on non-whitespace
    for s in sentences:
        assert not s.startswith(b" ") and not s.endswith(b" ")


def test_clean_text_length_preserving_blanking():
    cleaned, orig_spans, clean_spans = clean_text_with_spans(b"foo. bar (baz)")
    # '.' followed by space blanked; '(' after space blanked; trailing ')' at
    # end-of-string is NOT followed by \s so it stays.
    assert cleaned == b" foo bar baz)"
    assert orig_spans == [(0, 3), (5, 8), (10, 14)]
    assert clean_spans == [(1, 4), (5, 8), (9, 13)]


def test_clean_text_offsets_map_back():
    text = b"Call 012-345-6789 now."
    cleaned, orig_spans, clean_spans = clean_text_with_spans(text)
    for (os_, oe), (cs, ce) in zip(orig_spans, clean_spans):
        # same token text modulo blanked punctuation (lengths always equal)
        assert oe - os_ == ce - cs


def test_clean_text_leading_space_convention():
    cleaned, _, spans = clean_text_with_spans(b"x")
    assert cleaned == b" x"
    assert spans == [(1, 2)]
