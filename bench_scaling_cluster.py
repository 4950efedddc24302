"""Multi-executor scaling benchmark on a LOCAL STANDALONE CLUSTER.

The north rule asks for throughput scaling efficiency >= 0.8 moving from N
to 4N EXECUTORS on a multi-executor cluster. `bench_scaling.py` evidences
this with local[4] vs local[16] — two core counts inside ONE shared JVM,
which under-measures the KG tail: 16 shuffle threads share one heap, one
GC, one block manager, a structural penalty a real 4N-executor cluster
(4N separate JVMs) does not pay. This harness removes that artifact by
actually running N vs 4N executors: a Spark standalone master on
127.0.0.1 plus N (=1) then 4N (=4) worker daemons, each worker one
executor JVM with EXECUTOR_CORES cores / EXECUTOR_MEM heap — per-executor
resources IDENTICAL at both levels, exactly how a real cluster scales out.

Jobs, input, and measurement protocol are identical to bench_scaling.py
(same generated pages parquet, presidio NER pipeline median-of-3 +
full-KG best-of-2, per-level best-of-REPS fresh driver JVMs); only the
resource topology differs. Writes SCALING_CLUSTER[_m10].json.

Usage:
  python bench_scaling_cluster.py                # both levels + JSON
  python bench_scaling_cluster.py --child N_WORKERS  # internal
Env: SPARK_SCALING_N_PAGES (default 480000), SPARK_SCALING_MENTION_SCALE
     (default 1), SPARK_SCALING_WORKERS (default 1,4),
     SPARK_SCALING_REPS (default 2), EXECUTOR_CORES (4), EXECUTOR_MEM (8g)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SPARK_SCALING_N_PAGES", "480000"))
MENTION_SCALE = int(os.environ.get("SPARK_SCALING_MENTION_SCALE", "1"))
WORKER_LEVELS = [
    int(x) for x in os.environ.get("SPARK_SCALING_WORKERS", "1,4").split(",")
]
EXECUTOR_CORES = int(os.environ.get("EXECUTOR_CORES", "4"))
EXECUTOR_MEM = os.environ.get("EXECUTOR_MEM", "8g")
GEN_PARTITIONS = 128
MODEL = os.environ.get("SPARK_SCALING_MODEL", "presidio")
DATA_DIR = os.environ.get(
    "SPARK_SCALING_DATA",
    f"/tmp/spark_graft_scaling/pages_{N_PAGES}_m{MENTION_SCALE}",
)
MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_UI = 8081
BASE = "/tmp/spark_standalone"


def _spark_class() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-class")


def _master_state() -> dict | None:
    try:
        with urllib.request.urlopen(
            f"http://{MASTER_HOST}:{MASTER_UI}/json/", timeout=2
        ) as r:
            return json.load(r)
    except Exception:
        return None


def _alive_workers() -> list[dict]:
    st = _master_state()
    if not st:
        return []
    return [w for w in st.get("workers", []) if w.get("state") == "ALIVE"]


def ensure_master() -> None:
    if _master_state() is not None:
        return
    os.makedirs(f"{BASE}/logs", exist_ok=True)
    subprocess.Popen(
        [
            _spark_class(),
            "org.apache.spark.deploy.master.Master",
            "--host", MASTER_HOST, "--port", str(MASTER_PORT),
            "--webui-port", str(MASTER_UI),
        ],
        stdout=open(f"{BASE}/logs/master.log", "w"),
        stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    for _ in range(60):
        if _master_state() is not None:
            return
        time.sleep(1)
    raise SystemExit("standalone master failed to start")


def start_workers(n: int) -> list[subprocess.Popen]:
    """Bring the ALIVE worker set to exactly ``n`` fresh daemons."""
    procs = []
    for i in range(n):
        env = dict(os.environ)
        env["SPARK_WORKER_DIR"] = f"{BASE}/work-{i}"
        procs.append(
            subprocess.Popen(
                [
                    _spark_class(),
                    "org.apache.spark.deploy.worker.Worker",
                    f"spark://{MASTER_HOST}:{MASTER_PORT}",
                    "--host", MASTER_HOST,
                    "--cores", str(EXECUTOR_CORES),
                    "--memory", EXECUTOR_MEM,
                    "--webui-port", str(8090 + i),
                ],
                stdout=open(f"{BASE}/logs/worker-{i}.log", "w"),
                stderr=subprocess.STDOUT,
                env=env,
                start_new_session=True,
            )
        )
    deadline = time.monotonic() + 90
    while time.monotonic() < deadline:
        if len(_alive_workers()) >= n:
            return procs
        time.sleep(1)
    raise SystemExit(f"only {len(_alive_workers())}/{n} workers registered")


def stop_workers(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()
    # wait until the master notices (DEAD workers don't take resources,
    # but a lingering ALIVE one would let the next level over-provision)
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and _alive_workers():
        time.sleep(1)


def _cluster_spark(n_workers: int):
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"scaling-cluster-{n_workers}w",
        shuffle_partitions=GEN_PARTITIONS,
        master_url=f"spark://{MASTER_HOST}:{MASTER_PORT}",
        extra_conf={
            "spark.executor.cores": str(EXECUTOR_CORES),
            # leave headroom below the worker's advertised memory so the
            # worker hosts exactly ONE executor
            "spark.executor.memory": "7g",
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            # identical plan knobs at both levels — only executor count
            # varies (cf. bench_scaling.py)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_level(n_workers: int) -> dict:
    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark.kg import build_triples
    from ner_backend_spark.spark.pipeline import run_report
    from ner_backend_spark.spark.tagger import ReportConfig

    spark = _cluster_spark(n_workers)
    # executors register asynchronously after the app starts — wait until
    # every worker's executor is up so the warmup pass sees full width
    want = n_workers * EXECUTOR_CORES
    deadline = time.monotonic() + 120
    got = spark.sparkContext.defaultParallelism
    while time.monotonic() < deadline:
        got = spark.sparkContext.defaultParallelism
        if got >= want:
            break
        time.sleep(1)
    if got != want:
        spark.stop()
        raise SystemExit(f"cluster has {got} cores, expected {want}")

    pages = spark.read.parquet(DATA_DIR).select("url", "text")
    if MODEL == "cnn_crf":
        from ner_backend_spark.flagship import crf_config

        config = crf_config()
    else:
        config = ReportConfig.make(
            model_type="presidio",
            custom_tags={"custom_token": r"a1b2c3"},
            groups={"has_email": "COUNT(EMAIL) > 0"},
            build_previews=False,
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup pass: python workers + page cache, both levels identically
    noop(run_report(pages, config).entities)

    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        noop(run_report(pages, config).entities)
        samples.append(time.monotonic() - t0)
    ner_secs = sorted(samples)[1]

    alias_df = spark.createDataFrame(
        [("user0@example.com", "ENT_USER0"), ("a1b2c3", "ENT_TOKEN")],
        "surface string, canonical_id string",
    )
    kg_samples = []
    for _ in range(2):
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

    spark.stop()
    return {
        "n_workers": n_workers,
        "cores": want,
        "seconds": round(ner_secs, 3),
        "ner_samples": [round(s, 3) for s in samples],
        "docs_per_sec": round(N_PAGES / ner_secs, 1),
        "kg_seconds": round(kg_secs, 3),
        "kg_docs_per_sec": round(N_PAGES / kg_secs, 1),
        "n_docs": N_PAGES,
    }


def generate() -> None:
    if os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        return
    from ner_backend_spark import fixtures
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark("scaling-gen", cores=16,
                      shuffle_partitions=GEN_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    fixtures.pages_df_distributed(
        spark, N_PAGES, partitions=GEN_PARTITIONS, surface_scale=MENTION_SCALE
    ).write.mode("overwrite").parquet(DATA_DIR)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        print("CHILD_RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    generate()
    ensure_master()
    n_reps = int(os.environ.get("SPARK_SCALING_REPS", "2"))
    results = []
    for n_workers in WORKER_LEVELS:
        procs = start_workers(n_workers)
        try:
            reps = []
            for _ in range(n_reps):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     str(n_workers)],
                    capture_output=True, text=True, cwd=REPO, timeout=3600,
                )
                line = [
                    ln for ln in proc.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT ")
                ]
                if not line:
                    sys.stderr.write(proc.stdout + "\n" + proc.stderr + "\n")
                    raise SystemExit(f"child {n_workers}w failed")
                reps.append(json.loads(line[-1][len("CHILD_RESULT "):]))
        finally:
            stop_workers(procs)
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
        "metric": "scaling_efficiency_NtoXN_executors",
        "value": round(efficiency, 3),
        "unit": "fraction",
        "kg_e2e_efficiency": round(kg_efficiency, 3),
        "levels": results,
        "core_ratio": ratio,
        "executor_cores": EXECUTOR_CORES,
        "executor_mem": EXECUTOR_MEM,
        "topology": "standalone master + N one-executor worker JVMs on one host",
        "n_pages": N_PAGES,
        "mention_scale": MENTION_SCALE,
        "model": MODEL,
        "job": f"{MODEL} NER pipeline (pages->entities), noop-forced;"
        " kg_* fields: full pages->entities->triples pipeline",
    }
    print(json.dumps(report))
    name = "SCALING_CLUSTER"
    if MENTION_SCALE != 1:
        name += f"_m{MENTION_SCALE}"
    if MODEL != "presidio":
        name += f"_{MODEL}"
    name += ".json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
