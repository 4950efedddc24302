"""Extension-routed object parsing (storage parser semantics, SURVEY S6)."""

import pytest
from pyspark.sql import functions as F

from ner_backend_spark.spark import sources


@pytest.fixture(scope="module")
def objects(spark):
    rows = [
        ("a.txt", b"hello world"),
        ("b.html", b"<p>page</p>"),
        ("c.json", b'{"k": 1}'),
        ("nested/path/d.xml", b"<x/>"),
        ("noext", b"zzz"),
        ("e.docx", b"\x50\x4b"),  # unsupported (parser.go routes only 5+pdf)
        ("f.pdf", b"%PDF-1.4 fake"),
        ("g.TXT", b"upper ext"),  # filepath.Ext is case-preserving; we lower
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_routing_and_identity_decode(spark, objects):
    out = {r["url"]: r for r in sources.parse_objects(objects).collect()}
    assert out["a.txt"]["text"] == "hello world"
    assert out["a.txt"]["error"] is None
    assert out["a.txt"]["raw_size"] == 11
    assert out["b.html"]["text"] == "<p>page</p>"
    assert out["nested/path/d.xml"]["text"] == "<x/>"
    assert out["g.TXT"]["text"] == "upper ext"
    # unsupported types become error rows (reference logs-and-skips)
    assert out["noext"]["error"] == sources.ERR_UNSUPPORTED
    assert out["e.docx"]["error"] == sources.ERR_UNSUPPORTED
    assert out["noext"]["text"] is None
    # pdf: real extraction if pymupdf exists, error row otherwise — never
    # a crash either way (Chunk{Error} semantics)
    assert (out["f.pdf"]["error"] is not None) or (
        out["f.pdf"]["text"] is not None
    )


def test_plaintext_chunking_offsets(spark):
    data = bytes(range(97, 97 + 26))  # 'abc...z', 26 bytes
    df = spark.createDataFrame([("t.txt", data)], "url string, html binary")
    rows = sorted(
        sources.parse_objects(df, max_chunk_size=10).collect(),
        key=lambda r: r["chunk_offset"],
    )
    assert [r["chunk_offset"] for r in rows] == [0, 10, 20]
    assert [r["raw_size"] for r in rows] == [10, 10, 6]
    assert "".join(r["text"] for r in rows) == data.decode()


def test_supported_chunks_filter(spark, objects):
    parsed = sources.parse_objects(objects)
    good = sources.supported_chunks(parsed)
    assert good.filter(F.col("url") == "noext").count() == 0
    assert good.filter(F.col("url") == "a.txt").count() == 1


def test_plaintext_path_stays_jvm_side(spark, objects):
    """Only pdf rows may enter the Python kernel: the plaintext branch must
    compile to scan+project (no mapInPandas / ArrowEvalPython)."""
    plain_only = objects.filter(~F.col("url").endswith(".pdf"))
    plan = (
        sources.parse_objects(plain_only)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the union still contains the (empty) pdf leg's kernel node; check the
    # plaintext leg itself has none before the union
    first_leg = plan.split("Union")[1] if "Union" in plan else plan
    assert "hello" not in first_leg  # sanity: plan text, not data
    import re

    plaintext_ops = plan.split("MapInPandas")[0]
    assert "Filter" in plaintext_ops and "Generate" in plaintext_ops
