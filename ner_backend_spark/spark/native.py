"""JVM-native operators for regex entity scans (no Python in the plan).

The reference's custom-tag scan (internal/core/processor.go:615-628) is a
pure regex-findall per document. When offsets/contexts are not needed, it is
expressible entirely with built-in functions (``regexp_extract_all`` +
``explode``), staying inside whole-stage codegen — strictly faster than the
pandas-UDF path and exactly reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regex_entities(
    df: DataFrame, id_col: str, text_col: str, patterns: dict[str, str]
) -> DataFrame:
    """(id_col, label, text) — one row per regex match per label.

    Pattern language must stay in the ASCII-regex common subset of Java
    regex / RE2 / Python re (\\b, \\w, \\d are ASCII in all three).
    """
    parts = [
        df.select(
            F.col(id_col),
            F.lit(label).alias("label"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias("text"),
        )
        for label, pattern in sorted(patterns.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def regex_entity_counts(
    df: DataFrame, id_col: str, text_col: str, patterns: dict[str, str]
) -> DataFrame:
    """(id_col, cnt_<label> ...) — match counts per label, single scan."""
    cols = {
        f"cnt_{label}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).cast("long")
        for label, pattern in sorted(patterns.items())
    }
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])
