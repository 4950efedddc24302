"""SparkSession construction with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by parameter for
local testing:

* AQE on (runtime partition coalescing + skew-join splitting) — replaces the
  reference's greedy byte-budget shard planner
  (internal/storage/file_system_connector_utils.go:12-63).
* Arrow-batched Python UDFs with a bounded batch size — replaces the
  reference's 16-text / 2 MB gRPC batching
  (internal/core/python/model.go:176-215).
* maxPartitionBytes sized so a scan partition's text fits executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
DEFAULT_ARROW_BATCH = 1024  # texts per Arrow record batch into pandas UDFs


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition iff the plan has fewer partitions than the cluster has
    slots — the Spark analogue of the reference's byte-budget shard planner
    (internal/storage/file_system_connector_utils.go:12-63), which exists so
    a small listing still fans out across workers.

    At 100 TB the scan already yields thousands of splits and this is a
    no-op (no shuffle inserted); it only triggers for small inputs (e.g. one
    tiny parquet file -> 1 partition), where otherwise every Arrow UDF
    kernel downstream would run on a single core.
    """
    if df.isStreaming:
        # partitioning of a stream is governed by the source + shuffle conf;
        # .rdd is illegal here and micro-batches are already fanned out
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Cheap screen before the plan->RDD probe (the probe costs a driver-side
    # physical-plan conversion per call and defeats AQE stat reuse): with
    # filesMaxPartitionBytes=128MB and openCostInBytes=4MB a scan partition
    # bin-packs at most 32 files, so >= 32*target input files guarantees the
    # scan already fans out past `target` — skip the probe entirely. This is
    # the 100 TB fast path; tiny inputs fall through to the exact check.
    try:
        if len(df.inputFiles()) >= 32 * target:
            return df
    except Exception:
        pass  # plans without a file source (createDataFrame, range)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "ner-backend-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master_url: str | None = None,
) -> SparkSession:
    """``master_url`` (or env ``SPARK_GRAFT_MASTER``): connect to a real
    cluster manager (standalone/YARN/K8s) instead of local[cores] — the
    deployment path the north star targets (`spark-submit --py-files` onto
    multi-executor clusters). Executor sizing then comes from
    ``spark.executor.cores`` / ``spark.executor.memory`` in ``extra_conf``
    (or the cluster's defaults), and ``cores`` is ignored; executors
    resolve this package via ``spark.executorEnv.PYTHONPATH`` (set to the
    repo root by the cluster harness) or a shipped ``--py-files`` zip."""
    master_url = master_url or os.environ.get("SPARK_GRAFT_MASTER")
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master_url or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # reclaim reliable-checkpoint files (kg._materialize lineage cuts)
        # once their RDDs are GC'd — default false leaks one file set per
        # CC fixpoint round in long-lived sessions
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Reliable checkpoint dir (HDFS/S3 path on a cluster): flips the KG
    # layer's lineage cuts from localCheckpoint (executor-storage, not
    # fault-tolerant) to .checkpoint() — see spark/kg.py _materialize.
    ckpt_dir = os.environ.get("SPARK_CHECKPOINT_DIR")
    if ckpt_dir and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    return spark
