"""Sink abstraction: one partition spec, parquet + Iceberg lowerings.

The ParquetSink must reproduce round-1's hand-written layouts byte-for-byte
(checkpoint.py prunes on partition_id=pmod(xxhash64(url), n)); the Iceberg
lowering must produce the native transform expressions the north_star names
(bucket(n, url), days(warc_ts)) — the write itself needs a catalog the
sandbox doesn't have, so we pin the transform plan, not the table.
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from ner_backend_spark.spark import sinks


@pytest.fixture()
def pages(spark):
    return spark.createDataFrame(
        [
            (f"https://d{i % 3}.example.com/p{i}",
             datetime.datetime(2025, 1, 1 + i % 5, i % 24, 0, 0),
             float(i))
            for i in range(40)
        ],
        "url string, warc_ts timestamp, v double",
    )


def test_parquet_bucket_matches_legacy_layout(spark, pages, tmp_path):
    sink = sinks.ParquetSink(str(tmp_path))
    sink.write(
        pages, "entities",
        spec=(sinks.bucket(8, "url", alias="partition_id"),),
    )
    dirs = sorted(
        d for d in os.listdir(tmp_path / "entities")
        if d.startswith("partition_id=")
    )
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)
    back = spark.read.parquet(str(tmp_path / "entities"))
    # bucket assignment is exactly checkpoint.py's pruning function
    bad = back.filter(
        F.col("partition_id") != F.pmod(F.xxhash64("url"), F.lit(8))
    )
    assert bad.isEmpty()
    assert back.count() == 40


def test_parquet_time_transform_partitions(spark, pages, tmp_path):
    sink = sinks.ParquetSink(str(tmp_path))
    sink.write(pages, "by_day", spec=(sinks.days("warc_ts"),))
    dirs = sorted(
        d for d in os.listdir(tmp_path / "by_day")
        if d.startswith("warc_ts_days=")
    )
    assert dirs == [
        "warc_ts_days=2025-01-01",
        "warc_ts_days=2025-01-02",
        "warc_ts_days=2025-01-03",
        "warc_ts_days=2025-01-04",
        "warc_ts_days=2025-01-05",
    ]
    # raw timestamp column survives the round-trip unchanged
    back = spark.read.parquet(str(tmp_path / "by_day"))
    assert back.count() == 40
    assert set(back.columns) == {"url", "warc_ts", "v", "warc_ts_days"}


def test_parquet_identity_distribute_sort(spark, pages, tmp_path):
    sink = sinks.ParquetSink(str(tmp_path))
    df = pages.withColumn("pred", F.lit("HAS_X"))
    sink.write(
        df, "triples",
        spec=(sinks.identity("pred"),),
        distribute=(4, ["url"]),
        sort_within=["url"],
    )
    assert os.path.isdir(tmp_path / "triples" / "pred=HAS_X")
    back = spark.read.parquet(str(tmp_path / "triples"))
    assert back.count() == 40


def test_iceberg_transform_lowering():
    spec = (
        sinks.bucket(64, "url"),
        sinks.days("warc_ts"),
        sinks.identity("lang"),
    )
    cols = sinks.iceberg_transforms(spec)
    reprs = [str(c) for c in cols]
    assert "bucket" in reprs[0] and "url" in reprs[0]
    assert "days" in reprs[1] and "warc_ts" in reprs[1]
    assert "lang" in reprs[2]


def test_invalid_spec_rejected():
    with pytest.raises(ValueError):
        sinks.PartitionField("zorp", "url")
    with pytest.raises(ValueError):
        sinks.bucket(0, "url")


def test_write_triples_via_sink_default(spark, tmp_path):
    """kg.write_triples keeps its legacy path-based call shape."""
    from ner_backend_spark.spark import kg

    triples = spark.createDataFrame(
        [("u1", "HAS_EMAIL", "a@b.c"), ("u2", "IN_GROUP", "g1")],
        "subj string, pred string, obj string",
    )
    path = str(tmp_path / "triples")
    kg.write_triples(triples, path, n_buckets=2)
    assert os.path.isdir(tmp_path / "triples" / "pred=HAS_EMAIL")
    assert spark.read.parquet(path).count() == 2


def test_iceberg_writer_v2_plan_builds_without_catalog(spark):
    """VERDICT r2 "Next round" #9 (CI-lite drop-in check): IcebergSink must
    construct the full DataFrameWriterV2 plan — writeTo(table).using(
    'iceberg').partitionedBy(<native transforms>) — and fail only at
    CATALOG RESOLUTION, never earlier (a lowering bug would raise before
    analysis: bad transform name, invalid Column, wrong arity)."""
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "en")],
        "url string, ts string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")
    sink = sinks.IcebergSink("no_such_catalog.ns")
    spec = (sinks.bucket(64, "url"), sinks.days("warc_ts"), sinks.identity("lang"))
    with pytest.raises(Exception) as exc:
        sink.write(df, "pages", spec=spec, mode="append")
    msg = str(exc.value)
    # the failure must be the missing catalog/table — proof the V2 plan
    # passed construction and reached resolution
    assert "no_such_catalog" in msg or "TABLE_OR_VIEW_NOT_FOUND" in msg, msg


def test_iceberg_writer_v2_rejects_unknown_mode(spark):
    df = spark.range(1).withColumnRenamed("id", "url")
    with pytest.raises(ValueError):
        sinks.IcebergSink("c.ns").write(df, "t", mode="merge")


def test_bucketed_tables_join_without_shuffle(spark, pages):
    """The co-located-join contract: two managed tables bucketed
    identically on the join key sort-merge-join with ZERO shuffle exchange
    on either side (the catalog keeps the bucket metadata; at 100 TB this
    removes the dominant shuffle from every entities ⋈ groups / url-keyed
    join). Broadcast is disabled via a MERGE hint so the assertion can't
    be satisfied trivially."""
    other = pages.select("url", (F.length("url")).alias("url_len"))
    sink = sinks.BucketedTableSink()
    try:
        sink.write(
            pages, "bt_pages",
            spec=(sinks.bucket(4, "url"),), sort_within=["url"],
        )
        sink.write(
            other, "bt_meta",
            spec=(sinks.bucket(4, "url"),), sort_within=["url"],
        )
        a = spark.table("bt_pages")
        b = spark.table("bt_meta")
        joined = a.hint("merge").join(b, "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        want = pages.count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_pages")
        spark.sql("DROP TABLE IF EXISTS bt_meta")


def test_bucketed_sink_rejects_bad_specs(spark, pages):
    sink = sinks.BucketedTableSink()
    with pytest.raises(ValueError):
        sink.write(pages, "t", spec=())
    with pytest.raises(ValueError):
        sink.write(pages, "t", spec=(sinks.bucket(4, "url"), sinks.days("warc_ts")))
