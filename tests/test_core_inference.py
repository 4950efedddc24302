"""Per-document inference golden, ported from internal/core/processor_test.go:48-114."""

from ner_backend_spark.core.entity import Entity
from ner_backend_spark.core.inference import (
    coalesce_entities,
    compile_custom_tags,
    run_inference_on_object,
)
from ner_backend_spark.core.models import RegexModel
from ner_backend_spark.core.query import parse_query

TEST_DOC = (
    "This is a test doc. It contains a phone number: 012-345-6789, "
    "an email: test@email.com, and a special token a1b2c3."
)


def test_object_inference_golden():
    model = RegexModel(
        {
            "phone": r"\d{3}-\d{3}-\d{4}",
            "email": r"\w+@email\.com",
            "test": r"test",  # selected-tags filter must drop this label
        }
    )
    custom = compile_custom_tags({"special_token": r"(\w\d){3}"})
    groups = {
        "g1": parse_query('COUNT(phone) > 0 AND email CONTAINS "test"'),
        "g2": parse_query('COUNT(phone) > 1 AND email CONTAINS "test"'),
    }

    result = run_inference_on_object(
        TEST_DOC, model, {"phone", "email"}, custom, groups
    )

    phone, email, special = "012-345-6789", "test@email.com", "a1b2c3"
    p, e, s = TEST_DOC.index(phone), TEST_DOC.index(email), TEST_DOC.index(special)

    expected = [
        Entity("phone", phone, p, p + len(phone),
               TEST_DOC[p - 20 : p], TEST_DOC[p + len(phone) : p + len(phone) + 20]),
        Entity("email", email, e, e + len(email),
               TEST_DOC[e - 20 : e], TEST_DOC[e + len(email) : e + len(email) + 20]),
        Entity("special_token", special, s, s + len(special),
               TEST_DOC[s - 20 : s], TEST_DOC[s + len(special) :]),
    ]
    assert sorted(result.entities) == sorted(expected)

    assert result.groups == ["g1"]
    assert result.tag_count == {"phone": 1, "email": 1}
    assert result.custom_tag_count == {"special_token": 1}
    assert result.total_tokens == len(TEST_DOC.split())


def test_coalesce_merges_adjacent_same_label():
    # processor.go:519-554: same label, gap 0 or 1 -> merged, text stitched
    text = b"ab cd ef"
    e1 = Entity("X", "ab", 0, 2, "", " cd ef"[:20])
    e2 = Entity("X", "cd", 3, 5, "ab ", " ef")
    e3 = Entity("Y", "ef", 6, 8, "ab cd ", "")
    out = coalesce_entities({"X": [e1, e2], "Y": [e3]})
    assert [(e.label, e.text, e.start, e.end) for e in out] == [
        ("X", "ab cd", 0, 5),
        ("Y", "ef", 6, 8),
    ]
    assert out[0].r_context == " ef"  # inherits the right context of the tail


def test_coalesce_keeps_gap_two_apart():
    e1 = Entity("X", "ab", 0, 2, "", "  cd")
    e2 = Entity("X", "cd", 4, 6, "ab  ", "")
    out = coalesce_entities({"X": [e1, e2]})
    assert len(out) == 2


def test_preview_segments_cover_text():
    model = RegexModel({"phone": r"\d{3}-\d{3}-\d{4}"})
    result = run_inference_on_object(
        TEST_DOC, model, {"phone"}, {}, None, build_previews=True
    )
    # Alternating O/label segments re-concatenate to the preview text
    preview_text = " ".join(TEST_DOC.split()[:1000])
    assert "".join(result.preview_tokens) == preview_text
    assert "phone" in result.preview_tags
    assert len(result.preview_tokens) == len(result.preview_tags)
