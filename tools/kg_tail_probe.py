"""Stage-level probe of the KG tail (mentions -> edges -> CC -> canonical
-> triples) at two parallelism levels.

The m10 e2e scaling number (SCALING_m10.json) bundles the NER stage with
the KG tail; this probe isolates the tail by materializing entities to
parquet once, then timing each tail stage separately per level — so the
next optimization targets the stage that actually fails to scale instead
of the whole pipeline (VERDICT r4 "Next round" #3).

Usage: python tools/kg_tail_probe.py            # parent: both levels
       python tools/kg_tail_probe.py --child N  # one level (internal)
Env: SPARK_SCALING_N_PAGES (default 240000), SPARK_SCALING_MENTION_SCALE
     (default 10), SPARK_SCALING_LEVELS (default 4,16)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SPARK_SCALING_N_PAGES", "240000"))
MENTION_SCALE = int(os.environ.get("SPARK_SCALING_MENTION_SCALE", "10"))
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_SCALING_LEVELS", "4,16").split(",")
]
GEN_PARTITIONS = 128
DATA_DIR = f"/tmp/spark_graft_scaling/pages_{N_PAGES}_m{MENTION_SCALE}"
ENT_DIR = f"/tmp/spark_graft_scaling/entities_{N_PAGES}_m{MENTION_SCALE}"


def _spark(cores: int):
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark(
        f"kg-probe-{cores}",
        cores=cores,
        shuffle_partitions=GEN_PARTITIONS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def prepare() -> None:
    """Generate pages + entities parquet once (any core count)."""
    from ner_backend_spark import fixtures
    from ner_backend_spark.spark.pipeline import run_report
    from ner_backend_spark.spark.tagger import ReportConfig

    spark = _spark(16)
    if not os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        fixtures.pages_df_distributed(
            spark, N_PAGES, partitions=GEN_PARTITIONS,
            surface_scale=MENTION_SCALE,
        ).write.mode("overwrite").parquet(DATA_DIR)
    if not os.path.exists(os.path.join(ENT_DIR, "_SUCCESS")):
        pages = spark.read.parquet(DATA_DIR).select("url", "text")
        config = ReportConfig.make(
            model_type="presidio",
            custom_tags={"custom_token": r"a1b2c3"},
            groups={"has_email": "COUNT(EMAIL) > 0"},
            build_previews=False,
        )
        run_report(pages, config).entities.write.mode("overwrite").parquet(
            ENT_DIR
        )
    spark.stop()


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from ner_backend_spark.flagship import KG_MAX_BUCKET
    from ner_backend_spark.spark import kg

    spark = _spark(cores)
    sc = spark.sparkContext
    alias_df = spark.createDataFrame(
        [("user0@example.com", "ENT_USER0"), ("a1b2c3", "ENT_TOKEN")],
        "surface string, canonical_id string",
    )

    stages: dict[str, float] = {}
    jobs: dict[str, int] = {}
    tracker = sc.statusTracker()

    def timed(name, fn):
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        out = fn()
        stages[name] = round(time.monotonic() - t0, 3)
        jobs[name] = len(tracker.getJobIdsForGroup(None) or []) - j0
        return out

    entities = spark.read.parquet(ENT_DIR)
    # warmup: spin up python workers + page cache
    _noop(spark.range(0, 256, 1, 64).mapInPandas(
        lambda it: it, "id long"))
    _noop(entities)

    t_all = time.monotonic()
    mentions = timed(
        "mentions",
        lambda: kg._materialize(kg.extract_mentions(entities), eager=True),
    )
    edges, hits = timed(
        "edges_plan+hits",
        lambda: kg.mention_edges(
            mentions, alias_df, 0.5, 15, 5, KG_MAX_BUCKET
        ),
    )
    edges_m = timed(
        "edges_materialize",
        lambda: kg._materialize(edges.select("src", "dst"), eager=True),
    )
    n_edges = timed("edges_count", lambda: edges_m.count())
    comp = timed(
        "connected_components",
        lambda: kg._materialize(
            kg.connected_components(edges_m), eager=True
        ),
    )
    canon = timed(
        "canonical_map",
        lambda: kg._materialize(
            kg.canonical_map(mentions, comp, hits), eager=True
        ),
    )
    timed(
        "triples",
        lambda: _noop(kg.triples_from_canonical(entities, canon)),
    )
    total = round(time.monotonic() - t_all, 3)
    spark.stop()
    return {
        "cores": cores,
        "total_tail_sec": total,
        "stages": stages,
        "jobs": jobs,
        "n_edges": n_edges,
        "cc_rounds": getattr(kg, "LAST_CC_ROUNDS", None),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print(json.dumps(run_level(int(sys.argv[2]))), flush=True)
        return
    prepare()
    out = []
    for cores in LEVELS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(cores)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        out.append(json.loads(line))
    lo, hi = out[0], out[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (lo["total_tail_sec"] / hi["total_tail_sec"]) / ratio
    print(json.dumps({
        "levels": out,
        "tail_efficiency": round(eff, 3),
        "per_stage_speedup": {
            k: round(lo["stages"][k] / max(hi["stages"][k], 1e-9), 2)
            for k in lo["stages"]
        },
    }, indent=1))


if __name__ == "__main__":
    main()
