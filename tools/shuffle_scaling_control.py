"""NO-ENGINE shuffle scaling control (the JVM-shuffle analogue of
tools/kernel_scaling_control.py's raw-CPU control).

Measures how GENERIC Spark shuffle work — spark.range data, groupBy +
self-join + distinct, zero repo operators — scales from N to 4N cores on
this box, at a volume matched to the KG tail's round-1 star step (~17M
symmetrized edges). The KG fixpoint/edge stages cannot out-scale this
number no matter how their plans are shaped: it brackets what any
shuffle-bound operator can achieve here, isolating machine ceiling
(one shared local-mode JVM: memory bandwidth, GC, shuffle spill to one
/tmp) from plan quality. Run idle; walls are best-of-REPS warm reps.

Usage: python tools/shuffle_scaling_control.py [CORES ...]  (default 4 16)
Env: SHUFFLE_CONTROL_ROWS (default 17_000_000), REPS (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SHUFFLE_CONTROL_ROWS", str(17_000_000)))
REPS = int(os.environ.get("REPS", "3"))


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from ner_backend_spark.spark.session import get_spark

    # with SPARK_GRAFT_MASTER set (cluster-topology control), size each
    # executor exactly as bench_scaling_cluster.py does so the control
    # brackets that harness too; `cores` is then the EXPECTED total
    extra = {}
    if os.environ.get("SPARK_GRAFT_MASTER"):
        extra = {
            "spark.executor.cores": os.environ.get("EXECUTOR_CORES", "4"),
            "spark.executor.memory": "7g",
            "spark.executorEnv.PYTHONPATH": REPO,
        }
    spark = get_spark(
        f"shuffle-control-{cores}", cores=cores, shuffle_partitions=128,
        extra_conf=extra,
    )
    if extra:
        deadline = time.monotonic() + 120
        while (
            spark.sparkContext.defaultParallelism < cores
            and time.monotonic() < deadline
        ):
            time.sleep(1)
        if spark.sparkContext.defaultParallelism != cores:
            raise SystemExit("cluster control: executor count mismatch")
    spark.sparkContext.setLogLevel("ERROR")

    # the large_star shape on synthetic skew-free data: (src, dst) pairs,
    # symmetrize, per-src min, join back, filter, distinct
    edges = spark.range(0, ROWS, 1, 128).select(
        (F.col("id") % (ROWS // 10)).alias("src"),
        ((F.col("id") * 2654435761) % (ROWS // 10)).alias("dst"),
    )

    def job():
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(F.min("dst").alias("m"))
        out = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select("dst", "m")
            .distinct()
        )
        out.write.format("noop").mode("overwrite").save()

    job()  # warmup: JIT + page cache
    walls = []
    for _ in range(REPS):
        t0 = time.monotonic()
        job()
        walls.append(round(time.monotonic() - t0, 2))
    spark.stop()
    return {"cores": cores, "walls": walls, "min_wall": min(walls)}


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        print("CHILD_RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return
    levels = [int(c) for c in (sys.argv[1:] or ["4", "16"])]
    out = []
    for cores in levels:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        lines = [
            ln for ln in p.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")
        ]
        if not lines:
            sys.stderr.write(p.stdout + "\n" + p.stderr + "\n")
            raise SystemExit(f"child {cores} failed")
        out.append(json.loads(lines[-1][len("CHILD_RESULT "):]))
    rpt: dict = {"levels": out, "rows": ROWS}
    if len(out) == 2:
        ratio = out[1]["cores"] / out[0]["cores"]
        rpt["shuffle_scaling_eff"] = round(
            out[0]["min_wall"] / out[1]["min_wall"] / ratio, 3
        )
    print(json.dumps(rpt))


if __name__ == "__main__":
    main()
