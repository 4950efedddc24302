"""A/B alternating-star vs hash-to-min CC on the CACHED m10 entity set.

VERDICT r5 "Next round" #1 proposed replacing the large-star/small-star
fixpoint with hash-to-min (fewer, fatter rounds) to attack the KG tail's
fixed per-round latency (rounds 2-4 are ~1.1 s each at both core counts;
the graph collapses 8.65M -> 89k edges in round 1). This times both
variants on the exact same edge graph (entities parquet cached by
tools/kg_tail_probe.py prepare) at one core count per process invocation,
interleaved to expose warm-up drift.

Usage: python tools/cc_ab_hashmin.py <cores> [reps=2]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"cc-ab-hashmin-{cores}", cores=cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

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

    variants = [
        ("star", kg.connected_components),
        ("hashmin", kg.connected_components_hashmin),
    ]
    for rep in range(reps):
        for name, fn in variants:
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.monotonic()
            comp = fn(edges)
            rows = comp.count()
            sec = time.monotonic() - t0
            jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
            print(
                f"rep={rep} variant={name}: {sec:.2f}s "
                f"rounds={kg.LAST_CC_ROUNDS} jobs={jobs} rows={rows}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
