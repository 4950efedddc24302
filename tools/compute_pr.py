"""Compute the BASELINE.json headline metric: entity-extraction P/R of the
distributed pipeline vs the pure-Python oracle implementing the reference's
exact deterministic semantics (presidio recognizers + custom tags +
FilterEntities + coalesce + group queries; SURVEY §7.0).

Compared on the full (url, label, text, start, end, l_context, r_context)
span projection — the reference's object_entities ground truth
(internal/database/schema.go:135-144) — and on group membership. Writes
PR.json and prints one JSON line.

Usage: python tools/compute_pr.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from ner_backend_spark import fixtures
    from ner_backend_spark.core.inference import (
        compile_custom_tags,
        run_inference_on_object,
    )
    from ner_backend_spark.core.models import load_model
    from ner_backend_spark.core.query import parse_query
    from ner_backend_spark.spark.pipeline import run_report
    from ner_backend_spark.spark.session import get_spark
    from ner_backend_spark.spark.tagger import ReportConfig

    custom_tags = {"custom_token": r"a1b2c3"}
    groups = {"has_email": "COUNT(EMAIL) > 0", "phone_heavy": "COUNT(PHONENUMBER) > 1"}

    spark = get_spark("compute-pr")
    spark.sparkContext.setLogLevel("ERROR")

    rows = fixtures.generate_rows(n)
    pages = spark.createDataFrame(rows, fixtures.PAGES_SCHEMA)

    config = ReportConfig.make(
        model_type="presidio", custom_tags=custom_tags, groups=groups
    )
    out = run_report(pages.select("url", "text"), config)
    spark_spans = {tuple(r) for r in out.entities.collect()}
    spark_groups = {tuple(r) for r in out.object_groups.collect()}

    # pure-Python oracle, driver-side, same reference semantics
    model = load_model("presidio", {})
    tags = set(model.get_tags())
    custom = compile_custom_tags(custom_tags)
    gfilters = {name: parse_query(q) for name, q in groups.items()}
    oracle_spans, oracle_groups = set(), set()
    for url, _ts, _html, text, _lang in rows:
        res = run_inference_on_object(
            text, model, tags, custom, gfilters, build_previews=False
        )
        for e in res.entities:
            oracle_spans.add((url, *e))
        for g in res.groups:
            oracle_groups.add((url, g))

    def pr(got: set, want: set) -> dict:
        tp = len(got & want)
        return {
            "precision": round(tp / max(len(got), 1), 6),
            "recall": round(tp / max(len(want), 1), 6),
            "n_spark": len(got),
            "n_oracle": len(want),
        }

    ent_pr = pr(spark_spans, oracle_spans)
    grp_pr = pr(spark_groups, oracle_groups)
    report = {
        "metric": "entity_extraction_PR_vs_reference_semantics",
        "entities": ent_pr,
        "groups": grp_pr,
        "n_pages": n,
        "target": 0.95,
        "pass": all(
            m[k] >= 0.95
            for m in (ent_pr, grp_pr)
            for k in ("precision", "recall")
        ),
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "PR.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
