"""Stateful streaming ops: first-seen dedup (GroupState) + gap sessions.

Each test drives a real streaming query end-to-end: file source ->
availableNow trigger -> memory sink, with restarts over the same checkpoint
to prove state survives.
"""

import datetime

from pyspark.sql import functions as F

from ner_backend_spark.fixtures import PAGES_SCHEMA
from ner_backend_spark.streaming.stateful import (
    stream_first_seen,
    stream_sessions,
)


def _page(i, text):
    return (
        f"https://example.com/p{i}",
        datetime.datetime(2025, 1, 1, 0, 0, 0),
        text.encode(),
        text,
        "en",
    )


def _run_first_seen(spark, in_path, ckpt, out_path):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(in_path)
    )
    q = (
        stream_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        r["fingerprint"]: (r["url"], r["n_duplicates"])
        for r in spark.read.parquet(out_path).collect()
    }


def test_first_seen_dedup_within_and_across_triggers(spark, tmp_path):
    in_path = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_path = str(tmp_path / "out")

    # batch 1: "dup" text appears 3x (urls p1<p2<p5), "solo" once
    spark.createDataFrame(
        [_page(1, "dup"), _page(2, "dup"), _page(5, "dup"), _page(3, "solo")],
        PAGES_SCHEMA,
    ).write.parquet(in_path)
    got = _run_first_seen(spark, in_path, ckpt, out_path)
    assert len(got) == 2
    fp_dup = [fp for fp, (u, _) in got.items() if u.endswith("p1")]
    assert len(fp_dup) == 1 and got[fp_dup[0]] == (
        "https://example.com/p1", 2,
    )

    # batch 2 (restart, same checkpoint): more "dup" copies -> NOT re-emitted
    # (state survives the restart); one genuinely new text -> emitted
    spark.createDataFrame(
        [_page(7, "dup"), _page(8, "fresh")], PAGES_SCHEMA
    ).write.mode("append").parquet(in_path)
    got2 = _run_first_seen(spark, in_path, ckpt, out_path)
    assert len(got2) == 3  # dup NOT re-emitted despite the new p7 copy
    new = {u for u, _ in got2.values()} - {u for u, _ in got.values()}
    assert new == {"https://example.com/p8"}


def test_stream_sessions_gap_merge(spark, tmp_path):
    in_path = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2025, 1, 1, 0, 0, 0)

    def ev(user, minutes):
        return (user, t0 + datetime.timedelta(minutes=minutes))

    # u1: events at 0,10,20 (one session) then 120,125 (second session)
    # u2: single event
    rows = [ev("u1", 0), ev("u1", 10), ev("u1", 20), ev("u1", 120),
            ev("u1", 125), ev("u2", 5)]
    spark.createDataFrame(rows, "user_id string, ts timestamp").write.parquet(
        in_path
    )
    stream = spark.readStream.schema("user_id string, ts timestamp").parquet(
        in_path
    )
    q = (
        stream_sessions(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("select * from sess").collect()
    }
    assert got == {
        ("u1", t0, 3),
        ("u1", t0 + datetime.timedelta(minutes=120), 2),
        ("u2", t0 + datetime.timedelta(minutes=5), 1),
    }


def test_first_seen_running_total_readable_from_state_store(spark, tmp_path):
    """The all-time duplicate count lives in keyed state; pin that the
    documented `spark.read.format("statestore")` path actually surfaces
    it (docstring claim -> executable contract)."""
    import os

    from ner_backend_spark.streaming.stateful import stream_first_seen

    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    with open(f"{in_dir}/a.json", "w") as f:
        f.write('{"url":"u1","text":"same"}\n{"url":"u2","text":"same"}\n')
    stream = spark.readStream.schema("url string, text string").json(in_dir)
    q = (
        stream_first_seen(stream).writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(str(tmp_path / "ckpt"))
    rows = state.collect()
    assert len(rows) == 1
    assert rows[0]["value"][0][1] == 1  # (first_url, n_duplicates) = (u1, 1)


def test_streaming_histogram_sketch_merges_to_batch(spark, tmp_path):
    """The binned-quantile histogram is the streaming-friendly quantile
    sketch: per-micro-batch bin counts ACCUMULATE (histograms add), so a
    foreachBatch consumer that merges bin tables converges to the batch
    sketch — and the quantile certificates read from the merged state
    equal the batch operator's output exactly."""
    from pyspark.sql import functions as F

    from ner_backend_spark.spark.quantiles import binned_quantiles

    rows = [("g1", float((i * 37) % 500)) for i in range(600)] + [
        ("g2", float((i * 13) % 90)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    in_path = str(tmp_path / "vals_in")
    df.repartition(5).write.parquet(in_path)

    state_path = str(tmp_path / "bins_state")
    ckpt = str(tmp_path / "ckpt")

    def merge_bins(batch_df, batch_id):
        bins = (
            batch_df.filter(F.col("value").isNotNull())
            .select(
                "grp",
                F.floor(F.col("value") / F.lit(25.0)).cast("long").alias(
                    "_bin"
                ),
            )
            .groupBy("grp", "_bin")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        bins.write.mode("append").parquet(state_path)

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(in_path)
        .writeStream.foreachBatch(merge_bins)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # merged state: sum bin counts across micro-batches, then the same
    # rank-certificate arithmetic the batch operator runs
    merged = (
        spark.read.parquet(state_path)
        .groupBy("grp", "_bin")
        .agg(F.sum("_c").alias("_c"))
    )
    w_cum = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    cum = merged.withColumn(
        "_cum",
        F.sum("_c").over(
            w_cum.partitionBy("grp")
            .orderBy("_bin")
            .rowsBetween(w_cum.unboundedPreceding, w_cum.currentRow)
        ),
    )
    n = merged.groupBy("grp").agg(F.sum("_c").alias("_n"))
    got = {}
    for p in (0.5, 0.9):
        tgt = n.select(
            "grp",
            F.ceil(F.lit(p) * F.col("_n").cast("double"))
            .cast("long")
            .alias("_k"),
        )
        hit = (
            cum.join(tgt, "grp")
            .filter(F.col("_cum") >= F.col("_k"))
            .groupBy("grp")
            .agg(F.min("_bin").alias("_bin"))
        )
        for r in hit.collect():
            got[(r["grp"], p)] = (r["_bin"] * 25.0, (r["_bin"] + 1) * 25.0)

    want = {
        (r["grp"], r["p"]): (r["q_lo"], r["q_hi"])
        for r in binned_quantiles(
            df, "grp", "value", [0.5, 0.9], bin_width=25.0
        ).collect()
    }
    assert got == want
