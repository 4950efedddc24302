"""Kill/resume semantics of the partition-grained checkpoint runner.

Reference behavior being reproduced: resume-from-checkpoint re-enqueues only
unfinished shards (cmd/local/main.go:75-106); counters stay exact because
aggregates are recomputed, not incremented (vs processor.go:264-266)."""

import pytest

from ner_backend_spark import fixtures
from ner_backend_spark.spark.checkpoint import (
    CheckpointedReportRunner,
    completed_partitions,
    read_checkpoints,
    throughput_metrics,
)
from ner_backend_spark.spark.pipeline import run_report
from ner_backend_spark.spark.tagger import ReportConfig

CONFIG = ReportConfig.make(
    model_type="regex",
    model_params={"patterns": {"phone": r"\d{3}-\d{3}-\d{4}", "email": r"\w+@\w+\.\w+"}},
    custom_tags={"special_token": r"(\w\d){3}"},
    groups={"has_phone": "COUNT(phone) > 0"},
)


@pytest.fixture()
def pages(spark):
    return fixtures.pages_df(spark, n=120).select("url", "text").cache()


def _expected(spark, pages):
    out = run_report(pages, CONFIG)
    ents = {tuple(r) for r in out.entities.collect()}
    groups = {tuple(r) for r in out.object_groups.collect()}
    return ents, groups


def test_kill_and_resume_no_reprocessing(spark, pages, tmp_path):
    base = str(tmp_path / "report")
    runner = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    )

    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(pages, fail_after_commits=2)

    done_after_crash = completed_partitions(spark, base)
    assert len(done_after_crash) == 4  # 2 commits x 2 buckets

    # resume: must process exactly the remaining buckets
    result = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    ).run(pages)
    assert result["processed_buckets"] == 4

    assert completed_partitions(spark, base) == set(range(8))

    # outputs equal a single-shot run (exactness across the crash)
    want_ents, want_groups = _expected(spark, pages)
    got_ents = {
        tuple(r)
        for r in spark.read.parquet(f"{base}/entities")
        .select("url", "label", "text", "start", "end", "l_context", "r_context")
        .collect()
    }
    # single-shot entities lack partition_id; compare the common projection
    want_proj = {e for e in want_ents}
    assert got_ents == want_proj

    got_groups = {
        tuple(r)
        for r in spark.read.parquet(f"{base}/object_groups")
        .select("url", "group_name")
        .collect()
    }
    assert got_groups == want_groups

    # counters exact (recomputed, not incremented)
    tags = {
        r["tag"]: r["count"]
        for r in spark.read.parquet(f"{base}/report_tags").collect()
    }
    from collections import Counter

    want_tags = Counter(
        e[1] for e in want_ents if e[1] not in {"special_token"}
    )
    assert tags == dict(want_tags)


def test_rerun_is_noop(spark, pages, tmp_path):
    base = str(tmp_path / "report")
    runner = CheckpointedReportRunner(spark, CONFIG, base, n_buckets=4)
    runner.run(pages)
    result = CheckpointedReportRunner(spark, CONFIG, base, n_buckets=4).run(pages)
    assert result["processed_buckets"] == 0


def test_checkpoint_lineage_and_metrics(spark, pages, tmp_path):
    base = str(tmp_path / "report")
    CheckpointedReportRunner(spark, CONFIG, base, n_buckets=4).run(pages)
    ckpts = read_checkpoints(spark, base)
    rows = ckpts.collect()
    assert {r["status"] for r in rows} == {"COMPLETED"}
    assert all(r["lineage"] for r in rows)
    assert sum(r["n_docs"] for r in rows) == 120

    m = throughput_metrics(spark, base)
    assert m["n_docs"] == 120
    assert m["docs_per_sec"] > 0
    assert m["n_entities"] >= 21


# ---------------------------------------------------------------------------
# stage-grained KG resume


def _kg_entities(spark):
    from pyspark.sql import functions as F

    from ner_backend_spark.spark.native import regex_entities

    pages = fixtures.pages_df(spark, n=120)
    pats = {"WORD": r"\b[a-z]{5,}\b", "EMAIL": r"\S+@\S+\.\S+"}
    return regex_entities(pages, "url", "text", pats).select(
        F.col("url").cast("string").alias("url"), "label", "text"
    )


def test_kg_kill_and_resume_skips_completed_stages(spark, tmp_path):
    import os

    from ner_backend_spark.spark.checkpoint_kg import (
        CheckpointedKgRunner,
        completed_stages,
        kg_stage_metrics,
    )

    base = str(tmp_path / "kgrun")
    ents = _kg_entities(spark).localCheckpoint()
    alias_df = spark.createDataFrame(
        [("about", "ENT_ABOUT")], "surface string, canonical_id string"
    )

    runner = CheckpointedKgRunner(spark, base, alias_df=alias_df)
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(ents, fail_after_stages=2)
    assert completed_stages(spark, base) == {"mentions", "edges"}
    mentions_mtime = os.path.getmtime(f"{base}/kg/mentions/_SUCCESS")

    # resume: completes the rest without rewriting finished stages
    res = CheckpointedKgRunner(spark, base, alias_df=alias_df).run(ents)
    assert res["stages_run"] == ["components", "canonical", "triples"]
    assert res["stages_skipped"] == ["edges", "mentions"]
    assert os.path.getmtime(f"{base}/kg/mentions/_SUCCESS") == mentions_mtime

    triples = spark.read.parquet(f"{base}/kg/triples")
    assert triples.count() > 0
    assert {r["pred"] for r in triples.select("pred").distinct().collect()} == {
        "HAS_WORD", "HAS_EMAIL"
    }
    metrics = kg_stage_metrics(spark, base)
    assert set(metrics) == {"mentions", "edges", "components", "canonical", "triples"}
    assert all(m["n_rows"] > 0 for m in metrics.values())


def test_kg_checkpointed_matches_direct_build(spark, tmp_path):
    from ner_backend_spark.spark.checkpoint_kg import CheckpointedKgRunner
    from ner_backend_spark.spark.kg import build_triples

    base = str(tmp_path / "kgsame")
    ents = _kg_entities(spark).localCheckpoint()
    alias_df = spark.createDataFrame(
        [("about", "ENT_ABOUT")], "surface string, canonical_id string"
    )
    CheckpointedKgRunner(spark, base, alias_df=alias_df).run(ents)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(f"{base}/kg/triples").collect()
    }
    want = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_triples(ents, None, alias_df).collect()
    }
    assert got == want


def test_kg_resume_rejects_parameter_mismatch(spark, tmp_path):
    from ner_backend_spark.spark.checkpoint_kg import CheckpointedKgRunner

    base = str(tmp_path / "kgparams")
    ents = _kg_entities(spark).localCheckpoint()
    runner = CheckpointedKgRunner(spark, base, threshold=0.5)
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(ents, fail_after_stages=1)
    # resuming with a different threshold must refuse, not silently hybridize
    with pytest.raises(ValueError, match="was written with"):
        CheckpointedKgRunner(spark, base, threshold=0.9).run(ents)
    # matching parameters resume fine
    res = CheckpointedKgRunner(spark, base, threshold=0.5).run(ents)
    assert res["stages_skipped"] == ["mentions"]


def test_throughput_metrics_latest_attempt_wins(spark, tmp_path):
    """Two COMPLETED attempts for one partition with different counters:
    every counter must come from the max-end_ts attempt, never a mix
    (F.last was partition-order-dependent; fixed with max_by)."""
    import time

    from ner_backend_spark.spark.checkpoint import CHECKPOINT_SCHEMA

    base = str(tmp_path / "report")
    now = time.time()
    rows = [
        # partition 0: attempt 1 then attempt 2 (later end_ts, new counters)
        (0, "COMPLETED", "run-a", now, now + 10.0, 100, 5, 1000, "l1"),
        (0, "COMPLETED", "run-b", now + 20.0, now + 30.0, 120, 7, 1200, "l2"),
        # partition 1: single attempt
        (1, "COMPLETED", "run-a", now, now + 5.0, 10, 1, 100, "l1"),
    ]
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).coalesce(1).write.parquet(
        f"{base}/checkpoints"
    )
    m = throughput_metrics(spark, base)
    assert m["n_docs"] == 120 + 10
    assert m["n_entities"] == 7 + 1
    assert m["n_tokens"] == 1200 + 100
    assert m["wall_seconds"] == pytest.approx(30.0)
    assert m["n_succeeded_buckets"] == 2


def test_resume_rejects_config_mismatch(spark, pages, tmp_path):
    """Round-3 review: resuming onto checkpoints written under a different
    config must refuse (the KG runner already did; the report runner
    silently grafted two configs' outputs into one table)."""
    base = str(tmp_path / "report")
    CheckpointedReportRunner(spark, CONFIG, base, n_buckets=4).run(pages)
    other = ReportConfig.make(
        model_type="regex", model_params={"patterns": {"x": r"zz"}}
    )
    with pytest.raises(ValueError, match="different report config"):
        CheckpointedReportRunner(spark, other, base, n_buckets=4).run(pages)
    with pytest.raises(ValueError, match="bucket count"):
        CheckpointedReportRunner(spark, CONFIG, base, n_buckets=8).run(pages)
    # same config + same buckets still resumes cleanly
    res = CheckpointedReportRunner(spark, CONFIG, base, n_buckets=4).run(pages)
    assert res["processed_buckets"] == 0
