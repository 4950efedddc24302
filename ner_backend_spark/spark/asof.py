"""As-of and range (interval) joins — operators Spark's API lacks.

For each left row, attach the right row with the greatest right
timestamp <= (or <, with ``inclusive=False``) the left timestamp within
the same key group — the standard point-in-time lookup (latest price at
order time, last view before a click, config active at event time).

Implementation is the union trick, NOT a join: tag both sides, union,
and take a running ``last(value, ignorenulls=True)`` over a window
partitioned by the key and ordered by (ts, side). That is ONE shuffle
on the key + one sort — per-key work is linear in |left|+|right|,
regardless of how many right rows precede each left row. A naive
join-then-max formulation (left ⋈ right ON key AND r.ts <= l.ts, then
argmax per left row) materializes O(|left| * |right|) intermediate rows
per key — quadratic on hot keys, the exact blowup the 100 TB design
rules out. DuckDB's ASOF JOIN (the oracle) implements the same
semantics natively.

Right-side rows must be unique per (key, ts) for the result to be
well-defined; callers aggregate first (the gate query takes
max(value) per (user_id, ts)). Right rows whose value columns are all
NULL still count as matches (they travel inside a non-null struct), so
the semantics agree with DuckDB ASOF JOIN even for NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join: all left columns + right ``value_cols`` (null
    when no right row precedes).

    ``inclusive=True`` matches right rows with right_ts <= left_ts
    (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``); ``False`` is strict.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    bad = set(value_cols) & set(left.columns)
    if bad:
        raise ValueError(f"right value columns collide with left: {bad}")

    l_tag = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    # value columns ride in a STRUCT, not bare: the struct itself is
    # never null for a right row even when every field is null, so the
    # running last(ignorenulls=True) below distinguishes "a right row
    # exists with a NULL value" (match it, return NULL — what DuckDB
    # ASOF JOIN does) from "no right row yet" (carry nothing). Bare
    # columns would conflate the two and carry a stale earlier match
    # over a legitimately-NULL later one.
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*value_cols).alias("_asof_payload"),
    )
    # at equal ts: side 0 (right) sorts first when inclusive, so the
    # running last() has already absorbed it when the left row is read;
    # strict mode flips the tie order so an equal-ts right row is unseen
    if not inclusive:
        r_tag = r_tag.withColumn("_asof_side", F.lit(2))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_asof_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof_payload.{c}").alias(c) for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 900,
) -> DataFrame:
    """Join point rows to interval rows with
    ``start_ts <= point_ts < end_ts`` within the same ``on`` key —
    the interval/range join (events inside maintenance windows, reads
    inside transactions, spans inside sessions).

    Naively this is a non-equi join: Spark plans key-equality +
    inequality as a *shuffled* join that still compares every point
    against every interval of its key — O(|P| * |I|) per key, the hot-
    key quadratic the 100 TB design rules out. The standard fix (used
    by every warehouse range-join implementation, e.g. Databricks'
    range-join hints) is **binning**: quantize time into fixed bins,
    explode each interval into the bins it overlaps, and equi-join on
    (key, bin) before applying the exact range predicate. Per-key cost
    becomes O(|P| + |I| * bins_per_interval + matches): one hash
    shuffle, no quadratic comparisons, and Catalyst plans it as an
    ordinary hash join (broadcast when the exploded interval side is
    small).

    A point lies in exactly one bin, so a (point, interval) pair can
    match at most once — no post-join dedup is needed.

    ``bin_seconds`` should be on the order of the typical interval
    length: too coarse puts many intervals in a bin (back toward
    quadratic), too fine explodes the interval side.
    """
    # integer-microsecond bin math (timestamps may be NTZ, which cannot
    # cast to double; and float division would mis-bin near boundaries)
    bin_us = bin_seconds * 1_000_000

    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    p_bin = F.floor(_us(point_ts) / F.lit(bin_us)).cast("bigint")
    start_bin = F.floor(_us(start_ts) / F.lit(bin_us)).cast("bigint")
    # end is exclusive: the last overlapped bin holds end - 1 microsecond
    end_bin = F.floor((_us(end_ts) - 1) / F.lit(bin_us)).cast("bigint")
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(start_bin, F.greatest(start_bin, end_bin))),
    )
    pt = points.withColumn("_bin", p_bin)
    cond = (
        (pt[on] == iv[on])
        & (pt["_bin"] == iv["_bin"])
        & (pt[point_ts] >= iv[start_ts])
        & (pt[point_ts] < iv[end_ts])
    )
    return pt.join(iv, cond).select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in (on,)],
    )
