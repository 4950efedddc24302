"""Repeated-measurement probe of the KG edge stage (mentions -> scored
sim edges, materialized) at one or two parallelism levels.

Round-6 investigation: single-run stage timings on this shared VM swing
2-3x run-to-run, so each level runs REPS warm repetitions in one JVM
(mentions stay localCheckpointed; each rep re-derives the edges plan from
scratch so nothing downstream is cached) and reports every wall + the min.

Usage: python tools/edges_probe.py CORES [CORES...]   # parent
       python tools/edges_probe.py --child CORES      # internal
Env: EDGES_PROBE_REPS (default 3)
Needs /tmp/spark_graft_scaling/entities_240000_m10 (kg_tail_probe prepare).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENT_DIR = "/tmp/spark_graft_scaling/entities_240000_m10"
REPS = int(os.environ.get("EDGES_PROBE_REPS", "3"))


def run_level(cores: int) -> dict:
    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"edges-probe-{cores}", cores=cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    alias_df = spark.createDataFrame(
        [("user0@example.com", "ENT_USER0"), ("a1b2c3", "ENT_TOKEN")],
        "surface string, canonical_id string",
    )
    entities = spark.read.parquet(ENT_DIR)
    spark.range(0, 256, 1, 64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    mentions = kg._materialize(kg.extract_mentions(entities), eager=True)
    walls, counts = [], []
    for _ in range(REPS):
        t0 = time.monotonic()
        edges, _hits = kg.mention_edges(
            mentions, alias_df, 0.5, 15, 5, KG_MAX_BUCKET,
            materialize_hits=False,
        )
        edges_m = kg._materialize(edges.select("src", "dst"), eager=True)
        walls.append(round(time.monotonic() - t0, 2))
        counts.append(edges_m.count())
        edges_m.unpersist() if hasattr(edges_m, "unpersist") else None
    spark.stop()
    return {
        "cores": cores,
        "walls": walls,
        "min_wall": min(walls),
        "n_edges": counts[-1],
    }


def main() -> None:
    if sys.argv[1] == "--child":
        print("CHILD_RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return
    out = []
    for cores in sys.argv[1:]:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", cores],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        lines = [
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")
        ]
        if not lines:
            sys.stderr.write(proc.stdout + "\n" + proc.stderr + "\n")
            raise SystemExit(f"child {cores} failed")
        out.append(json.loads(lines[-1][len("CHILD_RESULT "):]))
    if len(out) == 2:
        ratio = out[1]["cores"] / out[0]["cores"]
        eff = out[0]["min_wall"] / out[1]["min_wall"] / ratio
        print(json.dumps({"levels": out, "edges_scaling_eff": round(eff, 3)}))
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
