"""Reliable-checkpoint gating of the KG layer's lineage cuts.

With SPARK_CHECKPOINT_DIR set, kg._materialize must use fault-tolerant
``.checkpoint()`` (files under the checkpoint dir) instead of
``localCheckpoint`` (executor-storage only, VERDICT r1 "What's wrong" #4),
and results must be identical. Runs in a subprocess because a SparkContext's
checkpoint dir cannot be unset once configured on the shared test session.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    from ner_backend_spark.spark.session import get_spark
    from ner_backend_spark.spark.kg import connected_components

    spark = get_spark("reliable-ckpt-test", cores=2, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    ckpt_dir = os.environ["SPARK_CHECKPOINT_DIR"]
    assert spark.sparkContext.getCheckpointDir() is not None

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    comp = {{r["id"]: r["component"] for r in connected_components(edges).collect()}}
    assert comp == {{1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}}, comp

    # reliable checkpoint files actually landed under the configured dir
    found = []
    for root, _dirs, files in os.walk(ckpt_dir):
        found.extend(files)
    assert found, f"no checkpoint files under {{ckpt_dir}}"
    print("RELIABLE_OK", len(found))
    spark.stop()
    """
)


def test_checkpoint_dir_switches_to_reliable(tmp_path):
    env = dict(os.environ)
    env["SPARK_CHECKPOINT_DIR"] = str(tmp_path / "ckpt")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "RELIABLE_OK" in out.stdout
