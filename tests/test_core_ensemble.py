"""Ensemble operators (P5 merge, P7 majority vote) — golden semantics from
plugin/plugin-python/models/transformer_presidio/models.py:30-99 and
plugin/plugin-python/models/ensemble/ensemble.py:37-92."""

import pytest

from ner_backend_spark.core.ensemble import (
    MergedModel,
    majority_vote,
    merge_predictions,
)
from ner_backend_spark.core.entity import create_entity
from ner_backend_spark.core.models import load_model

TEXT = b"alice sent 012-345-6789 to bob at dusk"


def _e(label, start, end, text=TEXT):
    return create_entity(label, text, start, end)


def test_merge_disjoint_keeps_both():
    prim = [_e("PHONENUMBER", 11, 23)]
    sec = [_e("NAME", 0, 5)]
    got = merge_predictions(prim, sec, TEXT)
    assert {(e.label, e.start, e.end) for e in got} == {
        ("PHONENUMBER", 11, 23),
        ("NAME", 0, 5),
    }


def test_merge_overlap_same_label_unions_span():
    prim = [_e("NAME", 0, 5)]
    sec = [_e("NAME", 3, 10)]
    got = merge_predictions(prim, sec, TEXT)
    assert [(e.label, e.start, e.end) for e in got] == [("NAME", 0, 10)]
    assert got[0].text == TEXT[0:10].decode()


def test_merge_overlap_diff_label_primary_wins():
    prim = [_e("PHONENUMBER", 11, 23)]
    sec = [_e("DATE", 11, 23), _e("NAME", 20, 26)]
    got = merge_predictions(prim, sec, TEXT)
    assert [(e.label, e.start, e.end) for e in got] == [
        ("PHONENUMBER", 11, 26)  # same primary label -> union over cluster
    ]


def test_merge_conflicting_primary_labels_longest_wins():
    prim = [_e("PHONENUMBER", 11, 23), _e("DATE", 20, 24)]
    got = merge_predictions(prim, [], TEXT)
    assert [(e.label, e.start, e.end) for e in got] == [
        ("PHONENUMBER", 11, 23)
    ]


def test_merge_secondary_only_cluster_kept_verbatim():
    sec = [_e("NAME", 0, 5), _e("NAME", 3, 10)]
    got = merge_predictions([], sec, TEXT)
    assert len(got) == 2  # hf-only cluster: keep all, no union


def test_majority_vote_mode_and_offsets():
    text = b"bob bob calls bob"
    tags = [
        ["NAME", "O", "O", "NAME"],
        ["NAME", "NAME", "O", "O"],
        ["NAME", "O", "VERB", "NAME"],
    ]
    got = majority_vote(text, tags)
    # token 0: NAME x3; token 1: O wins 2-1; token 2: O wins 2-1;
    # token 3: NAME wins 2-1; forward scan pins it to the THIRD 'bob'
    assert [(e.label, e.start, e.end, e.text) for e in got] == [
        ("NAME", 0, 3, "bob"),
        ("NAME", 14, 17, "bob"),
    ]


def test_majority_vote_tie_first_model_wins():
    text = b"x"
    got = majority_vote(text, [["NAME"], ["O"]])
    # Counter ties resolve by first insertion, like the reference's
    # most_common(1) (ensemble.py:54-56)
    assert [(e.label, e.text) for e in got] == [("NAME", "x")]


def test_majority_vote_length_mismatch_raises():
    with pytest.raises(ValueError, match="tags for"):
        majority_vote(b"a b", [["O"]])


def test_majority_vote_unicode_whitespace_tokens():
    # U+00A0 (no-break space) splits under the reference's str.split but not
    # under bytes.split — the vote must use unicode tokenization with
    # byte-accurate offsets (ADVICE r1)
    text = "alice bob".encode("utf-8")
    got = majority_vote(text, [["NAME", "CITY"]])
    assert [(e.label, e.text, e.start, e.end) for e in got] == [
        ("NAME", "alice", 0, 5),
        ("CITY", "bob", 7, 10),  # U+00A0 is 2 bytes
    ]


def test_merged_model_registry_end_to_end():
    model = load_model(
        "merged",
        {
            "primary": {
                "type": "regex",
                "params": {"patterns": {"PHONE": r"\d{3}-\d{3}-\d{4}"}},
            },
            "secondary": {
                "type": "regex",
                "params": {"patterns": {"NUM": r"\d{3}-\d{3}"}},
            },
        },
    )
    assert isinstance(model, MergedModel)
    got = model.predict(TEXT)
    # secondary NUM (11,18) overlaps primary PHONE (11,23), diff labels ->
    # single primary label in cluster -> union span (same end here)
    assert [(e.label, e.start, e.end) for e in got] == [("PHONE", 11, 23)]
    assert model.get_tags() == ["NUM", "PHONE"]


def test_merge_adjacent_touching_spans_cluster_reference_faithful():
    # end-exclusive spans (11,23) and (23,26) share no bytes, but the
    # reference clusters on `s <= cluster_end` (models.py:55) so they merge;
    # we pin that bug-for-bug
    prim = [_e("PHONENUMBER", 11, 23)]
    sec = [_e("PHONENUMBER", 23, 26)]
    got = merge_predictions(prim, sec, TEXT)
    assert [(e.label, e.start, e.end) for e in got] == [("PHONENUMBER", 11, 26)]
