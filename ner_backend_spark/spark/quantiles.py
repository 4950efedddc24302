"""Exact distributed quantiles via rank interpolation.

Spark's built-in exact ``percentile`` aggregate buffers every value of
a group in executor memory (OpenHashMap per group) — fine for a gate
run, fatal for a 100 TB group. ``approx_percentile`` (KLL-ish) is the
usual answer but is not reproducible cross-engine. This module gives a
third shape: the textbook *rank interpolation* (the SQL-standard
``percentile_cont`` definition, k = (n-1)*p) computed with a window
sort + a broadcast join — per-group memory is O(1), the only wide
exchange is the sort by (group, value), and any number of probability
points share that single sort.

Plan shape:
  1. rn    = row_number over (partition group order by value)  [1 sort]
  2. n     = count per group (tiny aggregate)
  3. tgt   = n x probability points: lo/hi ranks + frac  [broadcast]
  4. semi-size join rn IN (lo, hi) against the BROADCAST target table
     -> at most 2 rows per (group, p) survive
  5. q = lo_val + frac * (hi_val - lo_val), the exact
     ``percentile_cont`` value (DuckDB ``quantile_cont`` is the oracle)

At 100 TB the sort in (1) is the cost — identical to what any exact
quantile needs — and everything downstream is O(groups * |ps|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    out_digits: int = 6,
) -> DataFrame:
    """(group_col, p, q): exact interpolated quantile per group.

    ``q`` is rounded to ``out_digits`` decimals — the interpolation is
    the same real-valued formula as percentile_cont/quantile_cont, but
    engines differ in the last ulp of ``lo + frac*(hi-lo)`` vs
    ``(1-frac)*lo + frac*hi``, so gate outputs are rounded.
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    # counts over the UNFILTERED input: count(value_col) excludes NULLs
    # natively, so a group whose values are all NULL appears with _n = 0
    # — quantile_cont emits those with a NULL quantile, and deriving the
    # output grid from this frame re-attaches them without a third scan
    # of the input (round-7 ADVICE on the round-6 null-filter fix)
    counts = df.groupBy(group_col).agg(F.count(value_col).alias("_n"))
    pdim_all = F.explode(
        F.array(*[F.lit(float(p)) for p in ps])
    ).alias("p")
    # all-null groups, carried to the output as (group, p, NULL) via a
    # UNION branch over the (tiny) counts aggregate — a join-back would
    # add a second sort/shuffle to the plan for a group-count-sized fixup
    null_groups = counts.where(F.col("_n") == 0).select(
        group_col, pdim_all, F.lit(None).cast("double").alias("q")
    )
    # percentile_cont ignores NULLs; without this filter row_number()
    # would rank null rows (Spark sorts nulls first ascending) while
    # count(value_col) excludes them, desynchronizing the rank math and
    # diverging from the DuckDB quantile_cont oracle.
    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    counts = counts.where(F.col("_n") > 0)
    pdim = F.explode(
        F.array(*[F.lit(float(p)) for p in ps])
    ).alias("p")
    # k = (n-1)*p as an exact expression; lo/hi ranks are 1-based
    targets = counts.select(group_col, "_n", pdim).select(
        group_col,
        "p",
        (F.col("_n").cast("double") - 1.0) * F.col("p").cast("double"),
    ).toDF(group_col, "p", "_k").select(
        group_col,
        "p",
        (F.floor("_k") + 1).cast("int").alias("_lo_rn"),
        (F.ceil("_k") + 1).cast("int").alias("_hi_rn"),
        (F.col("_k") - F.floor("_k").cast("double")).alias("_frac"),
    )
    tgt = F.broadcast(targets).alias("t")
    r = ranked.alias("r")
    joined = r.join(
        tgt,
        (F.col(f"r.{group_col}") == F.col(f"t.{group_col}"))
        & (
            (F.col("r._rn") == F.col("t._lo_rn"))
            | (F.col("r._rn") == F.col("t._hi_rn"))
        ),
    )
    per_p = joined.groupBy(F.col(f"t.{group_col}"), "t.p").agg(
        F.max(
            F.when(
                F.col("r._rn") == F.col("t._lo_rn"), F.col(f"r.{value_col}")
            )
        ).alias("_lo"),
        F.max(
            F.when(
                F.col("r._rn") == F.col("t._hi_rn"), F.col(f"r.{value_col}")
            )
        ).alias("_hi"),
        F.first("t._frac").alias("_frac"),
    )
    # at an integral rank (p=1.0, or k hitting a row exactly) the hi row
    # is unused — and for p=1.0 rank n+1 doesn't even exist, so the
    # interpolation term must not be evaluated (null would propagate)
    q = F.when(F.col("_frac") == 0.0, F.col("_lo")).otherwise(
        F.col("_lo") + F.col("_frac") * (F.col("_hi") - F.col("_lo"))
    )
    computed = per_p.select(
        group_col,
        "p",
        F.round(q, out_digits).alias("q"),
    )
    return computed.unionByName(null_groups)


def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    bin_width: float = 1.0,
) -> DataFrame:
    """(group_col, p, q_lo, q_hi): MERGEABLE approximate quantiles via a
    fixed-width histogram sketch — the 100-TB shape when even the single
    global sort of :func:`group_quantiles` is too expensive, and the
    deterministic stand-in for approx_percentile (whose KLL compaction
    is not reproducible cross-engine).

    Sketch: bin = floor(value / bin_width) (floored integer division —
    deterministic IEEE double math both engines share), one map-side-
    combined groupBy(group, bin) whose shuffle carries O(groups x
    occupied-bins) rows regardless of input size; two histograms merge
    by adding bin counts, so the sketch composes across partitions,
    corpora, and streaming micro-batches. The quantile bin is the first
    whose CUMULATIVE count reaches ceil(p * n) — computed with one
    window over the BIN table (bin-sized, never value-sized) — and the
    answer is that bin's [q_lo, q_hi) edge pair: a certificate interval
    containing the exact quantile, with error bounded by bin_width by
    construction (no interpolation guesswork presented as exactness).

    The rank target ceil(p*n) is the inverted-CDF / SQL ``percentile_
    disc`` rank, computed in integer space (ceil of an exact product of
    a double and a bigint — both engines fold identically for the gate's
    probability grid). NULL values are excluded from n (the
    quantile_cont convention shared with group_quantiles); all-NULL
    groups emit no rows here (the sketch has no bins to certify).
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    from .kg import _materialize

    # lineage cut on the bin table (bin-sized, tiny): it feeds BOTH the
    # cumulative window and the per-group totals — without the cut each
    # consumer re-plans the corpus scan (plan-asserted single-scan in
    # test_plan_contracts)
    binned = _materialize(
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width)))
            .cast("long")
            .alias("_bin"),
        )
        .groupBy(group_col, "_bin")
        .agg(F.count(F.lit(1)).alias("_c")),
        eager=False,
    )
    w = Window.partitionBy(group_col).orderBy("_bin")
    cum = binned.withColumn(
        "_cum",
        F.sum("_c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    n = binned.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    pdim = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    tgt = n.select(group_col, pdim, "_n").select(
        group_col,
        "p",
        F.ceil(F.col("p") * F.col("_n").cast("double")).cast("long").alias(
            "_k"
        ),
    )
    # first bin whose cumulative count reaches the rank target: windowed
    # min over the (bin-sized) joined frame, keyed per (group, p)
    hit = cum.join(F.broadcast(tgt), group_col).filter(
        F.col("_cum") >= F.col("_k")
    )
    w2 = Window.partitionBy(group_col, "p").orderBy("_bin")
    return (
        hit.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .select(
            group_col,
            "p",
            (F.col("_bin").cast("double") * F.lit(float(bin_width))).alias(
                "q_lo"
            ),
            (
                (F.col("_bin") + F.lit(1)).cast("double")
                * F.lit(float(bin_width))
            ).alias("q_hi"),
        )
    )
