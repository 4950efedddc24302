"""FAILED-status buckets, the Q4 stop flag, windowed streaming counts, and
the reliable-checkpoint gating of the KG layer.

Reference semantics reproduced:
* processor.go:140-153 + database/utils.go:28-52 — failed tasks get a FAILED
  status row and are retried on the next run; succeeded/failed counters.
* api.go:553-624 StopReport + processor.go:187-190 — a stop flag consulted
  between task commits aborts cleanly with committed state preserved.
* report_tags over event time with late-data handling (watermark).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ner_backend_spark import fixtures
from ner_backend_spark.spark.checkpoint import (
    STATUS_FAILED,
    CheckpointedReportRunner,
    clear_stop,
    completed_partitions,
    read_checkpoints,
    request_stop,
    throughput_metrics,
)
from ner_backend_spark.spark.pipeline import run_report
from ner_backend_spark.spark.tagger import ReportConfig

CONFIG = ReportConfig.make(
    model_type="regex",
    model_params={"patterns": {"phone": r"\d{3}-\d{3}-\d{4}"}},
)


@pytest.fixture()
def pages(spark):
    return fixtures.pages_df(spark, n=80).select("url", "text").cache()


def test_failed_buckets_recorded_and_retried(spark, pages, tmp_path):
    base = str(tmp_path / "report")
    poisoned = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2,
        fail_buckets={2},
    )
    res = poisoned.run(pages)
    # the group containing bucket 2 failed; the rest completed
    assert res["failed_buckets"] == [2, 3]
    assert res["processed_buckets"] == 6
    assert completed_partitions(spark, base) == {0, 1, 4, 5, 6, 7}

    failed_rows = (
        read_checkpoints(spark, base)
        .filter(F.col("status") == STATUS_FAILED)
        .collect()
    )
    assert {r["partition_id"] for r in failed_rows} == {2, 3}
    assert all("poisoned bucket" in r["lineage"] for r in failed_rows)

    m = throughput_metrics(spark, base)
    assert m["n_succeeded_buckets"] == 6
    assert m["n_failed_buckets"] == 2

    # resume without the poison: retries exactly the FAILED buckets
    res2 = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    ).run(pages)
    assert res2["processed_buckets"] == 2
    assert res2["failed_buckets"] == []
    assert completed_partitions(spark, base) == set(range(8))

    m = throughput_metrics(spark, base)
    assert m["n_succeeded_buckets"] == 8
    assert m["n_failed_buckets"] == 0

    # outputs equal a single-shot run despite the failure + retry
    want = {
        tuple(r)
        for r in run_report(pages, CONFIG).entities.collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{base}/entities")
        .select("url", "label", "text", "start", "end", "l_context", "r_context")
        .collect()
    }
    assert got == want


def test_task_rollup_dataframe(spark, pages, tmp_path):
    """task_rollup (the q_task_rollup gate query's engine): FAILED status
    with zero counters while a bucket has no completed attempt; after the
    resume, COMPLETED everywhere, counters from the completed attempt, and
    attempt counts reflecting the retry."""
    from ner_backend_spark.spark.checkpoint import task_rollup

    base = str(tmp_path / "report")
    CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2,
        fail_buckets={2},
    ).run(pages)

    mid = {r["partition_id"]: r for r in task_rollup(spark, base).collect()}
    assert mid[2]["status"] == STATUS_FAILED
    assert mid[3]["status"] == STATUS_FAILED
    assert (mid[2]["n_docs"], mid[2]["n_entities"], mid[2]["n_tokens"]) == (0, 0, 0)
    assert mid[0]["status"] == "COMPLETED"
    assert mid[0]["n_attempts"] == 1

    CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    ).run(pages)
    done = {r["partition_id"]: r for r in task_rollup(spark, base).collect()}
    assert set(done) == set(range(8))
    assert all(r["status"] == "COMPLETED" for r in done.values())
    assert {p: r["n_attempts"] for p, r in done.items()} == {
        p: (2 if p in (2, 3) else 1) for p in range(8)
    }
    # counters come from the COMPLETED attempt, not the FAILED zero rows
    n_docs_total = sum(r["n_docs"] for r in done.values())
    assert n_docs_total == pages.count()


def test_stop_flag_aborts_cleanly_and_resumes(spark, pages, tmp_path):
    base = str(tmp_path / "report")
    runner = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(pages, fail_after_commits=2)
    done_before = completed_partitions(spark, base)
    assert len(done_before) == 4

    request_stop(base)
    res = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    ).run(pages)
    assert res["stopped"] is True
    assert res["processed_buckets"] == 0
    # committed state untouched by the stop
    assert completed_partitions(spark, base) == done_before

    clear_stop(base)
    res = CheckpointedReportRunner(
        spark, CONFIG, base, n_buckets=8, buckets_per_commit=2
    ).run(pages)
    assert res["stopped"] is False
    assert res["processed_buckets"] == 4
    assert completed_partitions(spark, base) == set(range(8))


def test_kg_resume_rejects_different_input(spark, tmp_path):
    """ADVICE r1: the lineage check must also fingerprint the input dataset,
    not just tuning parameters."""
    from ner_backend_spark.spark.checkpoint_kg import CheckpointedKgRunner
    from ner_backend_spark.spark.native import regex_entities

    base = str(tmp_path / "kgfp")
    pages = fixtures.pages_df(spark, n=60)
    pats = {"WORD": r"\b[a-z]{5,}\b"}
    ents = regex_entities(pages, "url", "text", pats).select(
        F.col("url").cast("string").alias("url"), "label", "text"
    ).localCheckpoint()

    runner = CheckpointedKgRunner(spark, base)
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(ents, fail_after_stages=1)

    other = ents.filter(F.col("url") != ents.select("url").first()["url"])
    with pytest.raises(ValueError, match="was written with"):
        CheckpointedKgRunner(spark, base).run(other.localCheckpoint())

    # same input resumes fine
    res = CheckpointedKgRunner(spark, base).run(ents)
    assert res["stages_skipped"] == ["mentions"]


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=minute)


def test_stream_label_counts_windowed_with_late_data(spark, tmp_path):
    """Windowed watermark aggregate: on-time rows count toward their event
    window; rows older than the watermark when they arrive are dropped."""
    from ner_backend_spark.streaming.ingest import (
        read_pages_stream,
        stream_label_counts,
    )

    inp = str(tmp_path / "pages_in")
    ckpt = str(tmp_path / "ckpt")

    def page(url, minute, text):
        return (url, _ts(minute), text.encode(), text, "en")

    # file 1: two on-time rows in the 10:00 window + one far-future row that
    # advances the watermark (event time 11:30, watermark delay 10 min =>
    # watermark 11:20 after this batch, putting every window before 11:20
    # past the watermark)
    batch1 = [
        page("u1", 0, "call 111-222-3333 now"),
        page("u2", 5, "call 444-555-6666 now"),
        page("u9", 90, "call 777-888-9999 later"),
    ]
    # file 2: any row — its batch runs with watermark 11:20, finalizing and
    # EMITTING the 10:00 window (state eviction happens one batch after the
    # watermark advances)
    batch2 = [page("u8", 95, "call 000-111-2222 even later")]
    # file 3: a LATE row for the already-finalized 10:00 window -> dropped
    # (append mode cannot re-emit an evicted window)
    batch3 = [page("u3", 1, "call 123-456-7890 too late")]

    # FileStreamSource orders files by modification time: each file must be
    # strictly newer than the previous or the "late" row could be read
    # before the watermark has advanced
    import time

    for batch in (batch1, batch2, batch3):
        spark.createDataFrame(batch, fixtures.PAGES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(inp)
        time.sleep(1.1)

    config = ReportConfig.make(
        model_type="regex",
        model_params={"patterns": {"phone": r"\d{3}-\d{3}-\d{4}"}},
    )
    q = stream_label_counts(
        read_pages_stream(spark, inp, max_files_per_trigger=1),
        config,
        ckpt,
        window="10 minutes",
        watermark="10 minutes",
        queryName="t_label_counts",
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM t_label_counts").collect()
    emitted = [(r["win_start"], r["label"], r["n"]) for r in rows]
    # the 10:00-10:10 window emitted ONCE, with exactly the two ON-TIME
    # phones; the late u3 row was dropped by the watermark, not merged in
    # and not re-emitted
    assert emitted.count((_ts(0), "phone", 2)) == 1
    assert all(w != _ts(0) or n == 2 for w, _, n in emitted)
    # the future rows' windows never closed -> not emitted in append mode
    assert all(w == _ts(0) for w, _, _ in emitted)
