"""A/B the connected-components steps_per_round knob on the KG edge graph.

Times the CC fixpoint alone (same edges, localCheckpoint regime) at 1 vs 2
star alternations per driver checksum round-trip, at a given core count.
Evidence for the round-5 "fewer CC driver round-trips" change.

Usage: python tools/cc_ab_probe.py [sf_dir] [cores]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cores = sys.argv[2] if len(sys.argv) > 2 else "8"

    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg
    from ner_backend_spark.spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(f"cc-ab-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    ents = entry._doc_entities(spark, sf_dir)
    mentions = kg._materialize(kg.extract_mentions(ents), eager=True)
    edges, _ = kg.mention_edges(
        mentions, None, 0.5, 15, 5, KG_MAX_BUCKET, materialize_hits=False
    )
    edges = kg._materialize(edges.select("src", "dst"), eager=True)
    print("n_edges:", edges.count())

    def run(steps: int) -> tuple[float, int, int]:
        t0 = time.monotonic()
        comp = kg.connected_components(edges, steps_per_round=steps)
        n = comp.count()
        return time.monotonic() - t0, kg.LAST_CC_ROUNDS, n

    # warm both paths once, then time alternating samples
    run(1), run(2)
    for steps in (1, 2, 1, 2):
        sec, rounds, n = run(steps)
        print(
            f"steps_per_round={steps}: {sec:.2f}s, star_rounds={rounds},"
            f" components_rows={n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
