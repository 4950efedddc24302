"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect bottleneck). Extras include docs/sec for the flagship NER
pipeline, which is the throughput figure BASELINE.md tracks.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: scan/agg, joins, window, native NER scan, DSL groups, full
# reference-semantics NER pipeline, minhash near-dup, LSH ANN (the scale
# path — brute-force knn is demoted to oracle duty), text stats.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_revenue",
    "q_window_top_events",
    "q_hourly_events",
    "q_ner_regex_entities",
    "q_group_membership",
    "q_token_stats",
    "q_dedup_exact",
    "q_lsh_ann",
    "q_ner_pipeline",
    "q_minhash_neardups",
    "q_simhash_neardups",
    "q_kg_triples",
    "q_crf_pipeline",
    "q_winnow_fingerprints",
    "q_bpe_tokens",
    "q_bpe_encode",
    "q_presidio_pages",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warm_python_workers(spark) -> None:
    """Spin up one Python UDF worker per core before timing, so the first
    pandas-UDF query isn't charged the whole fleet's startup cost."""

    def ident(batches):
        yield from batches

    force(spark.range(0, 256, 1, 64).mapInPandas(ident, "id long"))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from ner_backend_spark.spark.session import get_spark

    spark = get_spark("ner-backend-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    warm_python_workers(spark)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # clock starts BEFORE construction: operators that materialize
        # intermediates eagerly (localCheckpoint inside the KG pipeline)
        # would otherwise run most of their work outside the timer
        t0 = time.monotonic()
        force(qs[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    ner_secs = timings.get("q_ner_pipeline", float("nan"))
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(CPUS) if str(CPUS).isdigit() else CPUS,
        "n_docs": n_docs,
        "ner_docs_per_sec": round(n_docs / ner_secs, 1) if ner_secs else None,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
