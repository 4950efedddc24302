"""Stage-grained checkpointing for the KG-construction layer.

The report stage resumes per url-hash bucket (checkpoint.py) because its
work is embarrassingly url-partitioned. The KG layer is NOT url-partitioned —
connected components is a global fixpoint — so its resume granularity is the
STAGE: each stage's output is materialized to parquet and recorded in a
stage-checkpoint table with counters + lineage; a restarted run skips every
COMPLETED stage and recomputes only from the first missing one
(north_rule: "Every stage checkpoints per-partition watermarks with lineage
and counter metrics so a killed job resumes without reprocessing completed
partitions" — here the stage table IS the watermark, and each stage's
parquet is itself bucket-partitioned for downstream pruning).

Stage DAG (linear):

    mentions -> edges -> components -> canonical -> triples
"""

from __future__ import annotations

import json
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

from .kg import (
    alias_candidates,
    canonical_map,
    connected_components,
    extract_mentions,
    mention_edges,
    triples_from_canonical,
)

KG_STAGES = ["mentions", "edges", "components", "canonical", "triples"]

KG_CHECKPOINT_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("status", StringType(), False),
        StructField("run_id", StringType(), False),
        StructField("start_ts", DoubleType(), False),
        StructField("end_ts", DoubleType(), False),
        StructField("n_rows", LongType(), False),
        StructField("lineage", StringType(), False),
    ]
)

STATUS_COMPLETED = "COMPLETED"


def _read_checkpoint_rows(spark: SparkSession, base_path: str):
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.schema(KG_CHECKPOINT_SCHEMA)
            .parquet(f"{base_path}/kg_checkpoints")
            .filter(F.col("status") == STATUS_COMPLETED)
            .collect()
        )
    except AnalysisException:
        # first run: the checkpoint table doesn't exist yet. Any OTHER
        # error (storage hiccup etc.) must propagate — silently treating it
        # as "nothing completed" would recompute everything and append
        # duplicate COMPLETED rows.
        return []


def completed_stages(spark: SparkSession, base_path: str) -> set[str]:
    return {r["stage"] for r in _read_checkpoint_rows(spark, base_path)}


class CheckpointedKgRunner:
    """entities (+groups) -> triples with per-stage commit + resume.

    ``fail_after_stages`` injects a crash for the kill/resume tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        alias_df: DataFrame | None = None,
        threshold: float = 0.5,
        num_hashes: int = 15,
        bands: int = 5,
        max_bucket_size: int | None = None,
    ):
        self.spark = spark
        self.base_path = base_path
        self.alias_df = alias_df
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.max_bucket_size = max_bucket_size

    def _path(self, stage: str) -> str:
        return f"{self.base_path}/kg/{stage}"

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _commit(
        self, stage: str, df: DataFrame, run_id: str, t0: float, lineage: str
    ) -> None:
        df.write.mode("overwrite").parquet(self._path(stage))
        n = self.spark.read.parquet(self._path(stage)).count()
        self.spark.createDataFrame(
            [(stage, STATUS_COMPLETED, run_id, float(t0), time.time(), int(n), lineage)],
            KG_CHECKPOINT_SCHEMA,
        ).write.mode("append").parquet(f"{self.base_path}/kg_checkpoints")

    def _lineage_params(self) -> dict:
        return {
            "threshold": self.threshold,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "has_alias": self.alias_df is not None,
            "max_bucket_size": self.max_bucket_size,
        }

    @staticmethod
    def _input_fingerprint(entities: DataFrame) -> str:
        """Order-invariant dataset fingerprint: row count + modular sum of
        row hashes. Recorded in the lineage so a resume with a DIFFERENT
        entities table is refused instead of silently joining new entities
        against stale on-disk mentions/components (the 'silent hybrid'
        hazard for callers that don't read entities back from the
        checkpointed table)."""
        row = entities.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(
                    F.pmod(
                        F.xxhash64("url", "label", "text"),
                        F.lit(1_000_000_007),
                    ).cast("decimal(38,0)")
                ),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return f"{row['n']}:{row['h']}"

    def run(
        self,
        entities: DataFrame,
        object_groups: DataFrame | None = None,
        fail_after_stages: int | None = None,
    ) -> dict:
        run_id = str(uuid.uuid4())
        prior = _read_checkpoint_rows(self.spark, self.base_path)
        done = {r["stage"] for r in prior}
        # entities feeds the fingerprint, the mentions stage and the triples
        # stage — persist so a lazy upstream (the NER tagger) runs once
        entities = entities.persist()
        # Resume safety: refuse to graft new-parameter stages onto outputs
        # computed under different parameters OR a different input dataset —
        # either would be a silent cross-run hybrid presented as a clean run.
        # Compare only keys present in BOTH (a lineage written before a new
        # key existed must stay resumable, not be unconditionally refused).
        params = self._lineage_params()
        params["input_fp"] = self._input_fingerprint(entities)
        for r in prior:
            recorded = json.loads(r["lineage"])
            shared = {k: recorded[k] for k in params if k in recorded}
            if shared and shared != {k: params[k] for k in shared}:
                raise ValueError(
                    f"checkpoint at {self.base_path} was written with "
                    f"{shared}, current run uses {params}; clear "
                    f"{self.base_path}/kg_checkpoints (and kg/) or match them"
                )
        lineage = json.dumps({"run_id": run_id, **params})
        ran: list[str] = []

        def maybe_fail() -> None:
            if fail_after_stages is not None and len(ran) >= fail_after_stages:
                raise RuntimeError(
                    f"injected failure after stages {ran} (run {run_id})"
                )

        if "mentions" not in done:
            t0 = time.time()
            self._commit("mentions", extract_mentions(entities), run_id, t0, lineage)
            ran.append("mentions")
            maybe_fail()

        if "edges" not in done:
            t0 = time.time()
            mentions = self._read("mentions")
            # the SAME edge construction build_triples runs — reimplementing
            # the sim-edge + alias-virtual-node union here let the two paths
            # drift (round-3 review finding)
            edges, _hits = mention_edges(
                mentions,
                self.alias_df,
                self.threshold,
                self.num_hashes,
                self.bands,
                self.max_bucket_size,
                # only the edges are committed here; the canonical stage
                # re-derives alias hits from the on-disk mentions table, so
                # eagerly materializing hits would be pure thrown-away work
                materialize_hits=False,
            )
            self._commit("edges", edges, run_id, t0, lineage)
            ran.append("edges")
            maybe_fail()

        if "components" not in done:
            t0 = time.time()
            comp = connected_components(self._read("edges"))
            self._commit("components", comp, run_id, t0, lineage)
            ran.append("components")
            maybe_fail()

        if "canonical" not in done:
            t0 = time.time()
            mentions = self._read("mentions")
            hits = (
                alias_candidates(mentions, self.alias_df)
                if self.alias_df is not None
                else None
            )
            canon = canonical_map(mentions, self._read("components"), hits)
            self._commit("canonical", canon, run_id, t0, lineage)
            ran.append("canonical")
            maybe_fail()

        if "triples" not in done:
            t0 = time.time()
            triples = triples_from_canonical(
                entities, self._read("canonical"), object_groups
            )
            self._commit("triples", triples, run_id, t0, lineage)
            ran.append("triples")

        entities.unpersist()
        return {"run_id": run_id, "stages_run": ran, "stages_skipped": sorted(done)}


def kg_stage_metrics(spark: SparkSession, base_path: str) -> dict:
    """Per-stage wall time + row counters from the stage-checkpoint table."""
    df = (
        spark.read.schema(KG_CHECKPOINT_SCHEMA)
        .parquet(f"{base_path}/kg_checkpoints")
        .filter(F.col("status") == STATUS_COMPLETED)
    )
    # deterministic latest-attempt-wins: pick the whole row with max end_ts
    # (F.last is partition-order-dependent; mixing min(start)/max(end)
    # across attempts would report the gap between two runs as a duration)
    latest = df.groupBy("stage").agg(
        F.max(F.struct("end_ts", "start_ts", "n_rows")).alias("w")
    )
    return {
        r["stage"]: {
            "seconds": round(r["w"]["end_ts"] - r["w"]["start_ts"], 3),
            "n_rows": r["w"]["n_rows"],
        }
        for r in latest.collect()
    }
