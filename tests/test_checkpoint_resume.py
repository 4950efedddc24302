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
