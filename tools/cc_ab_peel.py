"""A/B: degree-1 pre-peel CC vs the alternating-star baseline (VERDICT r6 #5).

Hypothesis: CC round 1 carries 8.65M -> 89k edges on the cached m10
mention graph, and most of those dropped edges touch a degree-1 node —
peeling leaves relationally BEFORE the fixpoint (then re-attaching +
member-min relabel) should shrink the expensive first star rounds.

Counter-hypothesis: the peel itself costs a degree groupBy over the full
edge set plus four semi/anti joins and a two-shuffle relabel — the same
order of work as the star round it replaces — so the win may be a wash.

Measures kg.connected_components vs kg.connected_components_peel1 on the
EXACT same eagerly-materialized edge set (interleaved A/B/A/B so drift
hits both arms), asserts identical assignment checksums, and writes
CC_PEEL_AB.json. Usage: python tools/cc_ab_peel.py [cores]
"""

from __future__ import annotations

import json
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

    from pyspark.sql import functions as F

    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"cc-ab-peel-{cores}", cores=cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")

    entities = spark.read.parquet(ENT_DIR)
    mentions = kg._materialize(kg.extract_mentions(entities), eager=True)
    edges, _ = kg.mention_edges(
        mentions, None, 0.5, 15, 5, KG_MAX_BUCKET, materialize_hits=False
    )
    edges = kg._materialize(edges.select("src", "dst"), eager=True)
    n_edges = edges.count()

    def checksum(assign):
        row = assign.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64("id", "component"), F.lit(1_000_000_007)
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    arms = {
        "baseline_star": kg.connected_components,
        "peel1": kg.connected_components_peel1,
    }
    walls: dict[str, list[float]] = {k: [] for k in arms}
    sums: dict[str, tuple] = {}
    for _rep in range(2):  # interleaved A/B, A/B
        for name, fn in arms.items():
            t0 = time.monotonic()
            s = checksum(fn(edges))
            walls[name].append(round(time.monotonic() - t0, 2))
            prev = sums.setdefault(name, s)
            assert prev == s, (name, prev, s)

    assert sums["baseline_star"] == sums["peel1"], sums
    best = {k: min(v) for k, v in walls.items()}
    result = {
        "experiment": "cc_degree1_peel_vs_star (VERDICT r6 #5)",
        "graph": f"m{MENTION_SCALE} mention graph, {n_edges} edges",
        "cores": cores,
        "walls_sec": walls,
        "best_sec": best,
        "speedup_peel_vs_star": round(
            best["baseline_star"] / best["peel1"], 3
        ),
        "assignments_identical": True,
        "verdict": (
            "ADOPT peel1" if best["peel1"] < 0.9 * best["baseline_star"]
            else "REFUTED — keep alternating-star default"
        ),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(REPO, "CC_PEEL_AB.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
