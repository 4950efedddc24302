"""The /search endpoint's SQL-backend semantics, reproduced bug-for-bug.

Reference: internal/core/query_parser.go ToSql (:151-346) evaluated as
``SELECT DISTINCT object FROM object_entities WHERE report_id=? AND <expr>``
(internal/api/api.go:775-800).

Two deliberate divergences from the normative in-memory backend
(filters.go), both enshrined by the reference's own golden test
(api_test.go:473-513):

1. String predicates are ROW-level: a row matches ``l CONTAINS "s"`` iff
   that row's label equals l and its text contains s; an object matches the
   whole expression iff ANY of its rows does.
2. COUNT is REPORT-wide, not per-object: the generated subquery's predicate
   ``o.object = object`` resolves both columns to the inner table (SQL name
   scoping), so it is a tautology and the count covers every row of the
   report. CONTAINS in SQL is LIKE '%s%' (case-sensitivity follows the DB
   collation; we keep it case-sensitive like SQLite's default LIKE is not —
   we match the Go string semantics used elsewhere).

The group-membership path (object_groups) does NOT use this module; it uses
core.query.Filter.matches / spark.query_compile.
"""

from __future__ import annotations

from .query import (
    AndFilter,
    CountFilter,
    NotFilter,
    OrFilter,
    StringEqFilter,
    StringGtFilter,
    StringLtFilter,
    SubstringFilter,
    parse_query,
)

Row = tuple[str, str, str]  # (object, label, text)


def _count_op(node: CountFilter, total: int) -> bool:
    # ToSql uses the plain operator (query_parser.go:299-305): reconstruct it
    # from the (min, max) encoding built by ToFilter.
    if node.min == -1:  # "<"
        return total < node.max
    if node.max == node.min + 2:  # "="
        return total == node.min + 1
    return total > node.min  # ">"


def _eval_row(node, label: str, text: str, label_totals: dict[str, int]) -> bool:
    if isinstance(node, AndFilter):
        return all(_eval_row(f, label, text, label_totals) for f in node.filters)
    if isinstance(node, OrFilter):
        return any(_eval_row(f, label, text, label_totals) for f in node.filters)
    if isinstance(node, NotFilter):
        return not _eval_row(node.filter, label, text, label_totals)
    if isinstance(node, CountFilter):
        return _count_op(node, label_totals.get(node.label, 0))
    if isinstance(node, SubstringFilter):
        return label == node.label and node.substr in text
    if isinstance(node, StringEqFilter):
        return label == node.label and text == node.value
    if isinstance(node, StringLtFilter):
        return label == node.label and text < node.value
    if isinstance(node, StringGtFilter):
        return label == node.label and text > node.value
    raise TypeError(f"unknown filter node: {node!r}")


def search_objects(query: str, rows: list[Row]) -> set[str]:
    """Objects with at least one row satisfying the row-level expression."""
    tree = parse_query(query)
    label_totals: dict[str, int] = {}
    for _obj, label, _text in rows:
        label_totals[label] = label_totals.get(label, 0) + 1
    return {
        obj
        for obj, label, text in rows
        if _eval_row(tree, label, text, label_totals)
    }


def median_word_count(token_counts: list[int]) -> int:
    """internal/api/utils.go:202-219: integer-division median of sorted
    per-sample token counts (even length averages the middle pair with
    integer division)."""
    if not token_counts:
        return 0
    counts = sorted(token_counts)
    mid = len(counts) // 2
    if len(counts) % 2 == 0:
        return (counts[mid - 1] + counts[mid]) // 2
    return counts[mid]


def auto_tune_k(token_counts: list[int], base_k: int, alpha: float) -> int:
    """internal/api/utils.go:221-231: retrieval-k heuristic — shorter
    feedback samples need more records (k up), longer ones fewer (k down);
    k = base_k * ln(1 + alpha/median), floored at 2."""
    import math

    count = median_word_count(token_counts)
    if count <= 0:
        return base_k
    k = float(base_k) * math.log(1 + alpha / float(count))
    return max(int(k), 2)
