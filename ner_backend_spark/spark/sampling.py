"""Deterministic sampling + table maintenance ops for training-data curation.

At 100 TB, "give me 1% of every language" must be (a) a single scan with no
shuffle, (b) reproducible run-to-run and across resumes, (c) expressible as
a pushed-down filter. Spark's ``df.sample`` is none of these (its seed is
combined with the partition index, so repartitioning changes membership).
Hash-bernoulli sampling — keep a row iff
``pmod(xxhash64(key), 10^6) < rate * 10^6`` — is all three; membership is a
pure function of the key, so the python oracle replays it exactly through
the pinned xxhash64 replica (core/spark_hash.py).

``compact`` is the companion maintenance op: a partitioned table written by
many tasks accumulates small files; rewriting each partition to
size-targeted files keeps scans at full throughput (an Iceberg
rewrite_data_files analogue for the parquet sink).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff
    ``pmod(xxhash64(salt, key), 1e6) < rate * 1e6``.

    Membership depends only on the key value (stable across partitionings,
    retries, resumes, and engines); distinct salts give independent samples
    (e.g. train/validation splits that never overlap rows for salt-disjoint
    rates summing <= 1).
    """
    threshold = int(rate * _DENOM)
    h = F.pmod(F.xxhash64(F.lit(salt), F.col(key)), F.lit(_DENOM))
    return df.filter(h < threshold)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling in ONE scan, no shuffle.

    ``rates`` maps stratum value -> keep rate; unlisted strata use
    ``default_rate``. The rate lookup compiles to a broadcast-free literal
    CASE WHEN (strata sets are small — languages, quality buckets); the
    whole operator is a filter, so it pushes down past projections and
    combines with partition pruning.
    """
    thresh = F.lit(int(default_rate * _DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum) == value, F.lit(int(rate * _DENOM))
        ).otherwise(thresh)
    h = F.pmod(F.xxhash64(F.lit(salt), F.col(key)), F.lit(_DENOM))
    return df.filter(h < thresh)


def split(
    df: DataFrame, key: str, weights: dict[str, float], salt: str = ""
) -> dict[str, DataFrame]:
    """Disjoint deterministic splits (train/val/test) from one hash.

    Weights need not sum to 1 (the remainder is dropped). Each split is a
    contiguous hash range, so splits are disjoint BY CONSTRUCTION — no
    membership list, no join, stable under re-runs.
    """
    out: dict[str, DataFrame] = {}
    lo = 0
    h = F.pmod(F.xxhash64(F.lit(salt), F.col(key)), F.lit(_DENOM))
    for name, w in weights.items():
        hi = lo + int(w * _DENOM)
        out[name] = df.filter((h >= F.lit(lo)) & (h < F.lit(hi)))
        lo = hi
    if lo > _DENOM:
        raise ValueError("split weights exceed 1.0")
    return out


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    stratum: str | None = None,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: top-k rows per
    stratum by *priority* (Duffield-Lund-Thorup priority sampling /
    A-ES family): priority = weight / u, with u a deterministic uniform
    from the row key. Rows with weight w are included with probability
    proportional to w (for k << n), membership is a pure function of
    the key (stable across partitionings and resumes), and the plan is
    one window sort — no per-group state, no rejection loop.

    Determinism across engines: u = (md5_52(key) + 1) / 2^52 and the
    priority division are single IEEE-754 ops on exactly-representable
    integers, so any engine computes the bit-identical priority; ties
    are broken by key.

    At scale the ``row_number() <= k`` shape matters: Spark's
    WindowGroupLimit rewrite (3.5+) pushes the limit below the
    exchange, so each map task ships only its local top-k per stratum —
    the shuffle carries O(tasks * k), not the corpus.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    priority = (
        F.col(weight_col).cast("double")
        * F.lit(float(1 << 52))
        / (h + F.lit(1)).cast("double")
    )
    part = [stratum] if stratum else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(
        priority.desc(), F.col(key).asc()
    )
    return (
        df.withColumn("_ws_rn", F.row_number().over(w))
        .filter(F.col("_ws_rn") <= k)
        .drop("_ws_rn")
    )


def source_mix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """(source, n_docs, n_tokens, token_share, target_weight, boost):
    the data-mixing allocation a multi-source training run materializes
    before sampling — per-source corpus shares plus the temperature-
    reweighted target mixture

        target_weight(s) = share(s)^T / Σ_s' share(s')^T

    (T=1 keeps the natural mix, T=0 is uniform over sources, T∈(0,1)
    upsamples the tail — the multilingual/多-domain mixing rule of
    Lample & Conneau 2019 §3.1 and the Pile/DoReMi static-mix setups).
    ``boost = target_weight / token_share`` is the per-source
    oversampling factor to feed :func:`stratified_sample` /
    :func:`weighted_sample` rates.

    Plan: ONE scan of the corpus into a map-side-combined
    groupBy(source); everything after operates on the source-cardinality
    frame (domains, not documents — even at web scale that is ~10^6
    rows), with the two one-row totals attached by broadcast cross
    joins, never a corpus-sized shuffle. Emitted floats are rounded to
    ``round_digits``; raw quotients stay unrounded until emission so
    both engines compute identical doubles (the pagerank discipline).
    """
    from .kg import _materialize
    from .textstats import token_count

    # lineage cut on the source-cardinality aggregate: `per` is referenced
    # three times below (tot, shared×2) — without the cut the corpus
    # groupBy re-plans per reference and only RUNTIME exchange reuse
    # (not a contract) saves the extra 100 TB scans; cut, the corpus
    # scan provably executes once (plan-asserted in test_plan_contracts)
    per = _materialize(
        docs.groupBy(F.col(source_col).alias("source")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        ),
        eager=False,
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("_tot"))
    shared = per.join(F.broadcast(tot)).withColumn(
        "_share", F.col("n_tokens").cast("double") / F.col("_tot")
    )
    z = shared.agg(
        F.sum(F.pow(F.col("_share"), F.lit(temperature))).alias("_z")
    )
    tw = F.pow(F.col("_share"), F.lit(temperature)) / F.col("_z")
    return (
        shared.join(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("_share"), round_digits).alias("token_share"),
            F.round(tw, round_digits).alias("target_weight"),
            F.round(tw / F.col("_share"), round_digits).alias("boost"),
        )
    )


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 512,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet table into ~target_mb files; returns file count.

    The parquet analogue of Iceberg's rewrite_data_files: reads the table,
    computes the output file count from the on-disk byte size, and rewrites
    with a repartition — preserving directory partitioning if
    ``partition_cols`` is given. Use after many incremental/streaming
    appends have fragmented the table.
    """
    df = spark.read.parquet(path)
    # on-disk size via the file index (no data scan)
    total_bytes = _table_bytes(df)
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        # hash-distribute on the partition columns: every partition value
        # lands in exactly ONE task, so each directory gets one file — a
        # plain round-robin repartition would scatter every partition's
        # rows across all tasks and write n_files files into EVERY
        # directory (more fragments than before compacting)
        writer = (
            df.repartition(n_files, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(tmp)
    # swap via rename-aside so a crash can't destroy the only copy
    import shutil

    old = path.rstrip("/") + "__compact_old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return len(spark.read.parquet(path).inputFiles())


def _table_bytes(df: DataFrame) -> int:
    import os

    return sum(
        os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
        for f in df.inputFiles()
    )
