"""spark-submit entry point for the full pipeline (north_rule deployment).

Packages travel via --py-files (the script has NO sys.path setup — the
package must come from the submitted zip), e.g.:

    cd /root/repo && zip -qr /tmp/ner_backend_spark.zip ner_backend_spark
    /opt/spark/bin/spark-submit --master 'local[8]' \
        --py-files /tmp/ner_backend_spark.zip \
        tools/submit_pipeline.py \
        --pages /tmp/spark_graft_scaling/pages_20000 \
        --out /tmp/pipeline_out --triples

On a real cluster the same command targets yarn/k8s masters; only --master
changes. Writes entities/object_groups/report_tags (+ triples) under --out
and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir of pages(url, text, ...)")
    ap.add_argument("--out", required=True, help="output base path")
    ap.add_argument("--triples", action="store_true", help="also build the KG triples table")
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    # Import AFTER spark-submit ships --py-files; proves the deploy path.
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ner_backend_spark.spark.kg import build_triples, write_triples
    from ner_backend_spark.spark.pipeline import run_report, write_outputs
    from ner_backend_spark.spark.tagger import ReportConfig

    spark = SparkSession.builder.appName("ner-backend-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    pages = spark.read.parquet(args.pages).select("url", "text")
    config = ReportConfig.make(
        model_type="presidio",
        custom_tags={"custom_token": r"a1b2c3"},
        groups={"has_email": "COUNT(EMAIL) > 0"},
    )
    out = run_report(pages, config)
    write_outputs(out, args.out, n_buckets=args.n_buckets)

    summary = {
        "pages": spark.read.parquet(args.pages).count(),
        "entities": spark.read.parquet(f"{args.out}/entities").count(),
        "groups": spark.read.parquet(f"{args.out}/object_groups").count(),
    }
    if args.triples:
        entities = spark.read.parquet(f"{args.out}/entities").select(
            "url", "label", "text"
        )
        groups = spark.read.parquet(f"{args.out}/object_groups").select(
            "url", "group_name"
        )
        triples = build_triples(entities, groups)
        write_triples(triples, f"{args.out}/triples", n_buckets=args.n_buckets)
        summary["triples"] = spark.read.parquet(f"{args.out}/triples").count()
        summary["preds"] = (
            spark.read.parquet(f"{args.out}/triples")
            .select("pred")
            .distinct()
            .count()
        )
    summary["seconds"] = round(time.monotonic() - t0, 1)
    print("PIPELINE_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
