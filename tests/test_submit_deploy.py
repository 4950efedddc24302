"""spark-submit --py-files deployment-path test (north-rule deploy form).

Proves the package deploys with NO repo checkout on the driver/executor
path: the pipeline entry (tools/submit_pipeline.py) is shipped alone,
`ner_backend_spark` travels only inside the --py-files zip, and the
driver cwd is a scratch dir. A broken import, a module that reads repo-
relative files at import time, or an entry-point sys.path hack would all
fail this test.
"""

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> None:
    root = os.path.join(REPO, "ner_backend_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_pyfiles_deploy(spark, tmp_path):
    pages = [
        (f"https://ex{i % 7}.com/p{i}",
         f"Contact alice{i}@example.com or call 555-010{i % 10} today")
        for i in range(200)
    ]
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(pages, "url string, text string").repartition(
        4
    ).write.parquet(pages_dir)

    zip_path = str(tmp_path / "pkg.zip")
    _zip_package(zip_path)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak the repo onto the path
    proc = subprocess.run(
        [
            os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                         "bin", "spark-submit"),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            "--pages", pages_dir,
            "--out", out_dir,
            "--triples",
            "--n-buckets", "4",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    lines = [
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("PIPELINE_SUMMARY ")
    ]
    assert lines, proc.stdout[-3000:]
    summary = json.loads(lines[-1][len("PIPELINE_SUMMARY "):])
    assert summary["pages"] == 200
    assert summary["entities"] > 0
    assert summary["triples"] > 0
    assert summary["report_metrics"]["n_failed_buckets"] == 0
    # the written tables are real parquet
    ents = spark.read.parquet(os.path.join(out_dir, "entities"))
    assert ents.count() == summary["entities"]
