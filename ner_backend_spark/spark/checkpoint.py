"""Partition-grained checkpointing: resumable jobs with lineage + metrics.

Reference semantics being reproduced (SURVEY §2.10 M4/M6): the worker
restores from the `inference_tasks` status table on restart — already
COMPLETED shards are not reprocessed (cmd/local/main.go:75-106,
internal/database/utils.go:28-52). Here the "shard" is a deterministic url
hash bucket:

    partition_id = pmod(xxhash64(url), n_buckets)

A run writes each bucket's outputs to ``<base>/entities/partition_id=<p>``
and then appends a checkpoint row (COMPLETED, counters, lineage, timestamps).
A resumed run reads the checkpoint table, anti-joins completed buckets, and
processes only the rest. Writes are idempotent per bucket (dynamic partition
overwrite), so a job killed mid-bucket rewrites that bucket without
double-counting — this replaces the reference's non-idempotent
``count = count + ?`` counters (processor.go:264-266).

Aggregates (report_tags etc.) are recomputed from the materialized entities
table after all buckets complete, so they are exact regardless of how many
times any bucket was attempted.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .pipeline import run_report
from .tagger import ReportConfig

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("partition_id", LongType(), False),
        StructField("status", StringType(), False),
        StructField("run_id", StringType(), False),
        StructField("start_ts", DoubleType(), False),
        StructField("end_ts", DoubleType(), False),
        StructField("n_docs", LongType(), False),
        StructField("n_entities", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("lineage", StringType(), False),
    ]
)

STATUS_COMPLETED = "COMPLETED"


def with_partition_id(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "partition_id", F.pmod(F.xxhash64("url"), F.lit(n_buckets))
    )


def completed_partitions(spark: SparkSession, base_path: str) -> set[int]:
    path = f"{base_path}/checkpoints"
    try:
        rows = (
            spark.read.schema(CHECKPOINT_SCHEMA)
            .parquet(path)
            .filter(F.col("status") == STATUS_COMPLETED)
            .select("partition_id")
            .distinct()
            .collect()
        )
    except Exception:
        return set()
    return {r["partition_id"] for r in rows}


def read_checkpoints(spark: SparkSession, base_path: str) -> DataFrame:
    return spark.read.schema(CHECKPOINT_SCHEMA).parquet(
        f"{base_path}/checkpoints"
    )


class CheckpointedReportRunner:
    """Run a report over `pages` with per-bucket commit + resume.

    Buckets are processed in groups of ``buckets_per_commit`` (a commit
    barrier amortizes job overhead while bounding recomputation loss, like
    the reference's 10 GB shard target, processor.go:715-719). Each commit:

      1. filters pages to the bucket group (partition pruning on the hash),
      2. runs the single-pass tagger,
      3. writes entities under partition_id=... (idempotent overwrite),
      4. appends COMPLETED checkpoint rows with counters + lineage.

    ``fail_after_commits`` injects a crash for the kill/resume tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        config: ReportConfig,
        base_path: str,
        n_buckets: int = 16,
        buckets_per_commit: int = 4,
    ):
        self.spark = spark
        self.config = config
        self.base_path = base_path
        self.n_buckets = n_buckets
        self.buckets_per_commit = buckets_per_commit

    def run(
        self, pages: DataFrame, fail_after_commits: int | None = None
    ) -> dict:
        run_id = str(uuid.uuid4())
        done = completed_partitions(self.spark, self.base_path)
        todo = [p for p in range(self.n_buckets) if p not in done]
        lineage = json.dumps(
            {
                "run_id": run_id,
                "config_model": self.config.model_type,
                "n_buckets": self.n_buckets,
                "source": "pages",
            }
        )

        pages_p = with_partition_id(pages, self.n_buckets)

        commits = 0
        for i in range(0, len(todo), self.buckets_per_commit):
            group = todo[i : i + self.buckets_per_commit]
            t0 = time.time()
            subset = pages_p.filter(F.col("partition_id").isin(group))
            out = run_report(subset.select("url", "text"), self.config)

            # one pass over the group: cache report_rows for the three sinks
            rows = out.report_rows.withColumn(
                "partition_id", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets))
            ).persist()

            entities = rows.select(
                "url", "partition_id", F.explode("entities").alias("e")
            ).select("url", "partition_id", "e.*")
            (
                entities.write.mode("overwrite")
                .partitionBy("partition_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{self.base_path}/entities")
            )
            groups_df = rows.select(
                "url", "partition_id", F.explode("groups").alias("group_name")
            )
            (
                groups_df.write.mode("overwrite")
                .partitionBy("partition_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{self.base_path}/object_groups")
            )

            stats = (
                rows.groupBy("partition_id")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.size("entities")).alias("n_entities"),
                    F.sum("total_tokens").alias("n_tokens"),
                )
                .collect()
            )
            rows.unpersist()
            by_pid = {r["partition_id"]: r for r in stats}
            t1 = time.time()

            ckpt_rows = [
                (
                    int(p),
                    STATUS_COMPLETED,
                    run_id,
                    float(t0),
                    float(t1),
                    int(by_pid[p]["n_docs"]) if p in by_pid else 0,
                    int(by_pid[p]["n_entities"]) if p in by_pid else 0,
                    int(by_pid[p]["n_tokens"]) if p in by_pid else 0,
                    lineage,
                )
                for p in group
            ]
            self.spark.createDataFrame(
                ckpt_rows, CHECKPOINT_SCHEMA
            ).write.mode("append").parquet(f"{self.base_path}/checkpoints")

            commits += 1
            if fail_after_commits is not None and commits >= fail_after_commits:
                raise RuntimeError(
                    f"injected failure after {commits} commits (run {run_id})"
                )

        # exact, idempotent aggregates recomputed from materialized entities
        self._finalize()
        return {"run_id": run_id, "processed_buckets": len(todo)}

    def _finalize(self) -> None:
        ents_path = f"{self.base_path}/entities"
        if not os.path.exists(ents_path):
            return
        entities = self.spark.read.parquet(ents_path)
        custom = {tag for tag, _ in self.config.custom_tags}
        counts = entities.filter(F.col("label").isNotNull()).groupBy(
            "label"
        ).count()
        counts.filter(
            ~F.col("label").isin(list(custom)) if custom else F.lit(True)
        ).withColumnRenamed("label", "tag").write.mode("overwrite").parquet(
            f"{self.base_path}/report_tags"
        )


def throughput_metrics(spark: SparkSession, base_path: str) -> dict:
    """Reference metric definitions (internal/api/api.go:886-1011):
    wall = MAX(end_ts) - MIN(start_ts); tokens/docs/entities summed over
    COMPLETED checkpoints; docs_per_sec over distinct partition commits."""
    df = read_checkpoints(spark, base_path).filter(
        F.col("status") == STATUS_COMPLETED
    )
    # latest attempt per partition wins
    latest = df.groupBy("partition_id").agg(
        F.max("end_ts").alias("end_ts"),
        F.min("start_ts").alias("start_ts"),
        F.last("n_docs").alias("n_docs"),
        F.last("n_entities").alias("n_entities"),
        F.last("n_tokens").alias("n_tokens"),
    )
    row = latest.agg(
        F.min("start_ts").alias("t0"),
        F.max("end_ts").alias("t1"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_entities").alias("entities"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    wall = max(row["t1"] - row["t0"], 1e-9)
    return {
        "wall_seconds": wall,
        "n_docs": row["docs"],
        "n_entities": row["entities"],
        "n_tokens": row["tokens"],
        "docs_per_sec": row["docs"] / wall,
        "tokens_per_sec": row["tokens"] / wall,
    }
