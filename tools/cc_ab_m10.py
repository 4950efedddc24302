"""A/B connected-components steps_per_round on the CACHED m10 entity set.

kg_tail_probe.py showed CC anti-scaling 4->16 cores at mention-scale 10
(t4 ~24 s, t16 ~38.6 s). This isolates CC on the exact same 8.65M-edge
graph (entities parquet cached by kg_tail_probe.prepare) and times
steps_per_round=1 vs 2 at one core count per process invocation.

Usage: python tools/cc_ab_m10.py <cores> [steps ...defaults 1 2 1 2]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SPARK_SCALING_N_PAGES", "240000"))
MENTION_SCALE = int(os.environ.get("SPARK_SCALING_MENTION_SCALE", "10"))
ENT_DIR = f"/tmp/spark_graft_scaling/entities_{N_PAGES}_m{MENTION_SCALE}"


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps_list = [int(x) for x in sys.argv[2:]] or [1, 2, 1, 2]

    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"cc-ab-m10-{cores}",
        cores=cores,
        shuffle_partitions=128,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    entities = spark.read.parquet(ENT_DIR)
    mentions = kg._materialize(kg.extract_mentions(entities), eager=True)
    edges, _ = kg.mention_edges(
        mentions, None, 0.5, 15, 5, KG_MAX_BUCKET, materialize_hits=False
    )
    t0 = time.monotonic()
    edges = kg._materialize(edges.select("src", "dst"), eager=True)
    n = edges.count()
    print(f"cores={cores} n_edges={n} edges_mat={time.monotonic()-t0:.1f}s",
          flush=True)

    if os.environ.get("CC_AQE") == "0":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        print("AQE disabled for CC runs", flush=True)

    for steps in steps_list:
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        comp = kg.connected_components(edges, steps_per_round=steps)
        rows = comp.count()
        sec = time.monotonic() - t0
        jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
        print(
            f"steps={steps}: {sec:.2f}s rounds={kg.LAST_CC_ROUNDS} "
            f"jobs={jobs} rows={rows}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
