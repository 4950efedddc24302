"""Noop-sink isolation timer for individual queries (guide §1.4).

NOT part of the driver contract — bench.py is the frozen measurement
harness; this exists so a single query's wall can be measured warm,
repeatedly, without the suite around it:

    python bench_extra.py q_kg_triples,q_bloom_decontaminate [reps]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per query with every rep's wall and the min; the first
rep is the in-session cold run (codegen + python-worker spin-up beyond
the shared warmup), so read the min for plan-cost comparisons and the
first rep for cold-cost ones.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark("ner-backend-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def ident(batches):
        yield from batches

    force(spark.range(0, 256, 1, 64).mapInPandas(ident, "id long"))

    qs = entry.queries()
    if names is None:
        import bench

        names = bench.BENCH_QUERIES
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            force(qs[name](spark, SF_DIR))
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = {"walls": walls, "min": min(walls)}
        print(f"{name:30s} min={min(walls):7.3f}  walls={walls}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
