"""Query-DSL parser goldens ported from internal/core/query_parser_test.go:9-123."""

import sys

import pytest

from ner_backend_spark.core.entity import Entity
from ner_backend_spark.core.query import (
    AndFilter,
    CountFilter,
    NotFilter,
    OrFilter,
    QueryParseError,
    StringEqFilter,
    SubstringFilter,
    parse_query,
)


def ent(label, text):
    return Entity(label, text, 0, len(text), "", "")


def test_parse_substring():
    f = parse_query('label1 CONTAINS "value"')
    assert f == SubstringFilter("label1", "value")


def test_parse_count_lt():
    # query_parser_test.go: COUNT(label1) < 10 -> CountFilter{min:-1, max:10}
    f = parse_query("COUNT(label1) < 10")
    assert f == CountFilter("label1", -1, 10)


def test_parse_count_gt_eq():
    assert parse_query("COUNT(x) > 4") == CountFilter("x", 4, sys.maxsize)
    assert parse_query("COUNT(x) = 4") == CountFilter("x", 3, 5)


def test_parse_and_or_not_nesting():
    f = parse_query(
        'label1 CONTAINS "value1" AND (label2 = "value2" OR NOT COUNT(label3) > 4)'
    )
    assert f == AndFilter(
        (
            SubstringFilter("label1", "value1"),
            OrFilter(
                (
                    StringEqFilter("label2", "value2"),
                    NotFilter(CountFilter("label3", 4, sys.maxsize)),
                )
            ),
        )
    )


def test_or_of_ands_precedence():
    # a AND b OR c parses as (a AND b) OR c
    f = parse_query('a = "1" AND b = "2" OR c = "3"')
    assert isinstance(f, OrFilter)
    assert isinstance(f.filters[0], AndFilter)


def test_parse_error_incomplete():
    with pytest.raises(QueryParseError):
        parse_query("label1 CONTAINS")


def test_count_semantics_exclusive_bounds():
    f = parse_query("COUNT(phone) < 2")
    assert f.matches({"phone": [ent("phone", "a")]})
    assert f.matches({})  # count 0 > min -1
    assert not f.matches({"phone": [ent("phone", "a"), ent("phone", "b")]})


def test_substring_case_sensitive():
    f = parse_query('l CONTAINS "Abc"')
    assert not f.matches({"l": [ent("l", "abc")]})
    assert f.matches({"l": [ent("l", "xAbcy")]})


def test_string_compare_bytewise():
    lt = parse_query('l < "b"')
    gt = parse_query('l > "b"')
    assert lt.matches({"l": [ent("l", "a")]})
    assert not lt.matches({"l": [ent("l", "b")]})
    assert gt.matches({"l": [ent("l", "c")]})


SEARCH_SEED = {
    "object1": [ent("label1", "text1"), ent("label3", "text3"), ent("label4", "12xyz34")],
    "object2": [ent("label2", "text2")],
    "object3": [ent("label3", "abc"), ent("label4", "12xyz34")],
    "object4": [ent("label3", "12xyz34")],
}

SEARCH_QUERY = 'label4 CONTAINS "xyz" AND (COUNT(label2) > 0 OR label3 = "abc")'


def test_group_backend_semantics_on_search_seed():
    """The normative per-object backend (filters.go) on the api_test seed.

    Note this intentionally differs from the reference /search endpoint's
    result {object1, object3}: the SQL backend's COUNT subquery
    (query_parser.go:294-307) compares o.object to itself, so COUNT is
    report-wide there. Per-object semantics match only object3.
    """
    f = parse_query(SEARCH_QUERY)
    matched = set()
    for obj, ents in SEARCH_SEED.items():
        by_label: dict[str, list[Entity]] = {}
        for e in ents:
            by_label.setdefault(e.label, []).append(e)
        if f.matches(by_label):
            matched.add(obj)
    assert matched == {"object3"}


def test_search_backend_golden():
    """api_test.go:473-513 — the /search endpoint golden {object1, object3},
    reproduced bug-for-bug (report-wide COUNT, row-level string predicates)."""
    from ner_backend_spark.core.search import search_objects

    rows = [
        (obj, e.label, e.text) for obj, ents in SEARCH_SEED.items() for e in ents
    ]
    assert search_objects(SEARCH_QUERY, rows) == {"object1", "object3"}


def test_auto_tune_k_reference_semantics():
    from ner_backend_spark.core.search import auto_tune_k, median_word_count

    # utils.go:202-231 golden behavior
    assert median_word_count([]) == 0
    assert median_word_count([5]) == 5
    assert median_word_count([2, 10]) == 6
    assert median_word_count([1, 2, 4, 9]) == 3  # (2+4)//2
    assert auto_tune_k([], 10, 100.0) == 10  # empty -> baseK
    import math
    want = max(int(10 * math.log(1 + 100.0 / 5)), 2)
    assert auto_tune_k([5], 10, 100.0) == want
    assert auto_tune_k([10**9], 10, 1.0) == 2  # floor at 2


def test_unquote_preserves_non_ascii():
    """Round-3 review: the unicode_escape round-trip mojibake'd non-ASCII
    literals ('Müller' -> 'MÃ¼ller'), silently emptying such queries."""
    from types import SimpleNamespace

    from ner_backend_spark.core.query import parse_query

    f = parse_query('NAME = "Müller"')
    ents = {"NAME": [SimpleNamespace(text="Müller")]}
    assert f.matches(ents)
    f2 = parse_query('CITY CONTAINS "東京"')
    assert f2.matches({"CITY": [SimpleNamespace(text="in 東京 now")]})
    # escapes still resolve
    f3 = parse_query('X = "a\\"b\\u00fcc"')
    assert f3.matches({"X": [SimpleNamespace(text='a"büc')]})


def test_unquote_byte_escape_semantics():
    """Round-4 advice: Go strconv.Unquote treats \\xNN / octal escapes as
    raw BYTES in double-quoted strings — "\\xc3\\xbc" is 'ü' (its UTF-8
    bytes), not 'Ã¼' (two code points); \\' is rejected; octal > \\377 and
    surrogate \\u escapes are errors."""
    from types import SimpleNamespace

    import pytest

    from ner_backend_spark.core.query import (
        QueryParseError,
        _unquote,
        parse_query,
    )

    assert _unquote('"\\xc3\\xbc"') == "ü"
    assert _unquote('"\\303\\274"') == "ü"  # same bytes, octal
    assert _unquote('"\\x41\\102"') == "AB"  # ASCII-range bytes
    f = parse_query('NAME = "M\\xc3\\xbcller"')
    assert f.matches({"NAME": [SimpleNamespace(text="Müller")]})
    # a lone invalid-UTF-8 byte never matches real text, like Go's
    # byte-wise compare against valid-UTF-8 documents
    f2 = parse_query('X = "\\xff"')
    assert not f2.matches({"X": [SimpleNamespace(text="\xff")]})
    with pytest.raises(QueryParseError):
        _unquote("\"\\'\"")  # strconv.Unquote: unknown escape in ""
    with pytest.raises(QueryParseError):
        _unquote('"\\777"')  # octal value > 255
    with pytest.raises(QueryParseError):
        _unquote('"\\ud800"')  # surrogate half
