"""Deterministic sampling + compaction: membership stability, stratum rates,
disjoint splits, small-file rewrite."""

import pytest
from pyspark.sql import functions as F

from ner_backend_spark.core.spark_hash import spark_xxhash64
from ner_backend_spark.spark import sampling


@pytest.fixture()
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_sample_stable_under_repartition(spark, docs):
    a = {r[0] for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r[0]
        for r in sampling.hash_sample(
            docs.repartition(17, "lang"), "doc_id", 0.3
        ).collect()
    }
    assert a == b
    assert 0.25 < len(a) / 3000 < 0.35


def test_hash_sample_matches_python_replica(spark, docs):
    got = {r[0] for r in sampling.hash_sample(docs, "doc_id", 0.2, salt="s").collect()}
    want = {
        i
        for i in range(3000)
        if spark_xxhash64("s", ("long", i)) % 1_000_000 < 200_000
    }
    assert got == want


def test_stratified_rates(spark, docs):
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_rate=0.0
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert "zh" not in counts  # default_rate=0 drops unlisted strata
    assert 400 < counts["en"] < 600  # 1000 en docs @ 0.5
    assert 60 < counts["de"] < 140  # 1000 de docs @ 0.1


def test_split_disjoint_and_stable(spark, docs):
    parts = sampling.split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {k: {r[0] for r in v.collect()} for k, v in parts.items()}
    assert ids["train"] | ids["val"] | ids["test"] == set(range(3000))
    assert not (ids["train"] & ids["val"])
    assert not (ids["val"] & ids["test"])
    assert not (ids["train"] & ids["test"])
    with pytest.raises(ValueError):
        sampling.split(docs, "doc_id", {"a": 0.9, "b": 0.2})


def test_compact_rewrites_small_files(spark, docs, tmp_path):
    path = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(path)
    assert len(spark.read.parquet(path).inputFiles()) == 40
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n = sampling.compact(spark, path, target_mb=512)
    assert n == 1
    assert len(spark.read.parquet(path).inputFiles()) == 1
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_xxhash64_long_override_pinned_vs_spark(spark):
    df = spark.createDataFrame([(5,), (123456789012,)], "v long")
    got = [r[0] for r in df.select(F.xxhash64(F.lit("s"), "v")).collect()]
    want = [
        spark_xxhash64("s", ("long", 5)),
        spark_xxhash64("s", ("long", 123456789012)),
    ]
    assert got == want


def test_stratified_sample_prunes_columns(spark, tmp_path):
    """The sampler is a pure filter: scan reads only (doc_id, lang), and no
    shuffle appears in the plan."""
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "text " * 50, ["en", "de"][i % 2]) for i in range(100)],
        "doc_id long, text string, lang string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5}, default_rate=0.1
    ).select("doc_id", "lang")
    plan = out._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema
    assert "Exchange" not in plan


def test_bpe_token_count_golden(spark):
    from ner_backend_spark.spark.textstats import bpe_token_count
    from pyspark.sql import functions as F2

    rows = [
        ("it's a test", 4),          # it / 's / a / test
        ("hello, world!", 4),        # hello / , / world / !
        ("a1b2", 4),                 # a / 1 / b / 2
        ("  spaced   out  ", 2),
        ("", 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(bpe_token_count(F2.col("text"))).collect()]
    assert got == [n for _, n in rows]


def test_compact_partitioned_one_file_per_dir(spark, docs, tmp_path):
    import os

    path = str(tmp_path / "part")
    docs.repartition(12).write.partitionBy("lang").parquet(path)
    # fragmented: 12 files per lang dir
    assert len(spark.read.parquet(path).inputFiles()) > 3
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n = sampling.compact(spark, path, target_mb=512, partition_cols=["lang"])
    assert n == 3  # one file per lang directory
    for lang in ("en", "de", "zh"):
        files = [
            f for f in os.listdir(os.path.join(path, f"lang={lang}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_source_mix_hand_values(spark):
    import math

    from ner_backend_spark.spark.sampling import source_mix

    docs = spark.createDataFrame(
        [
            (1, "one two", "a"),
            (2, "three four five", "a"),
            (3, "six", "a"),
            (4, "seven eight", "b"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r for r in source_mix(docs, temperature=0.5).collect()
    }
    # a: 3 docs, 6 tokens; b: 1 doc, 2 tokens; total 8
    assert (got["a"]["n_docs"], got["a"]["n_tokens"]) == (3, 6)
    assert (got["b"]["n_docs"], got["b"]["n_tokens"]) == (1, 2)
    sa, sb = 6 / 8, 2 / 8
    z = math.sqrt(sa) + math.sqrt(sb)
    assert got["a"]["token_share"] == round(sa, 6)
    assert got["b"]["token_share"] == round(sb, 6)
    assert got["a"]["target_weight"] == round(math.sqrt(sa) / z, 6)
    assert got["b"]["target_weight"] == round(math.sqrt(sb) / z, 6)
    # temperature < 1 upsamples the tail source, downsamples the head
    assert got["b"]["boost"] > 1.0 > got["a"]["boost"]


def test_source_mix_temperature_one_is_natural(spark):
    from ner_backend_spark.spark.sampling import source_mix

    docs = spark.createDataFrame(
        [(i, "w " * (i + 1), f"s{i % 3}") for i in range(9)],
        "doc_id long, text string, source string",
    )
    rows = source_mix(docs, temperature=1.0).collect()
    for r in rows:
        assert r["target_weight"] == r["token_share"], r
        assert r["boost"] == 1.0, r
