"""Streaming ingest: pages arriving as files -> entities, incrementally.

The reference's "streaming" is queue-driven batch (SURVEY §2.10) — new
objects land in a bucket and workers drain tasks. The Spark-native
equivalent is Structured Streaming over the landing directory:

    readStream(parquet pages) -> tag_documents (same Arrow kernel as batch)
    -> writeStream(append, exactly-once per file via the stream checkpoint)

The stream checkpoint subsumes the reference's task-status resume (M4): a
restarted stream continues from the last committed file offset without
reprocessing. Windowed per-label counts with a watermark cover the running
``report_tags`` counters for late-arriving pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..fixtures import PAGES_SCHEMA
from ..spark.tagger import ReportConfig, explode_entities, tag_documents


def read_pages_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def stream_entities(
    pages_stream: DataFrame,
    config: ReportConfig,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """Incremental text->entities; append sink, exactly-once per input file.

    With ``n_buckets`` the sink is partitioned by the same
    ``pmod(xxhash64(url), n)`` bucket as the batch layout
    (checkpoint.with_partition_id), so a stream-fed entities table is
    directly consumable by the bucket-pruned batch readers and the KG layer.
    """
    rows = tag_documents(pages_stream, config)
    entities = explode_entities(rows)
    if n_buckets is not None:
        entities = entities.withColumn(
            "partition_id", F.pmod(F.xxhash64("url"), F.lit(n_buckets))
        )
    writer = (
        entities.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if n_buckets is not None:
        writer = writer.partitionBy("partition_id")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_label_counts(
    pages_stream: DataFrame,
    config: ReportConfig,
    checkpoint_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    queryName: str = "label_counts",
    output_mode: str = "append",
) -> StreamingQuery:
    """Windowed per-label counts with late-data handling — the streaming
    form of report_tags (A2) over event time.

    The event time ``warc_ts`` rides through the tagger kernel as a
    passthrough column, the watermark is applied to the *tagged* stream, and
    the aggregate is a real tumbling ``window(warc_ts, ...)`` group — rows
    older than the watermark are dropped by the stateful aggregation
    (late-data pytest: tests/test_streaming_multimodal_redact.py). In the
    default ``append`` mode a window's counts emit once, when the watermark
    passes its end.
    """
    rows = tag_documents(pages_stream, config, passthrough=("warc_ts",))
    ents = rows.select("warc_ts", F.explode("entities").alias("e")).select(
        "warc_ts", F.col("e.label").alias("label")
    )
    counts = (
        ents.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "label")
        .count()
        .select(
            F.col("win.start").alias("win_start"),
            "label",
            F.col("count").alias("n"),
        )
    )
    return (
        counts.writeStream.format("memory")
        .queryName(queryName)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
