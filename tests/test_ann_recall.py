"""Recall gates for the ANN scale paths vs the exact brute-force oracle.

Clustered embeddings (the regime ANN indexes exist for: true neighbors at
cosine >= ~0.8) must reach high recall with sublinear candidate generation.
The near-uniform regime (testdata embeddings, neighbor cosine ~0.3) is the
information-theoretically hard case — documented in similarity.py, measured
here only as a floor so parameter regressions are caught.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_backend_spark.spark.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    lsh_topk,
)

DIM = 64


@pytest.fixture(scope="module")
def clustered(spark):
    """400 vectors in 20 tight clusters: neighbors at cosine ~0.9."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(20, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 20]
        # per-dim noise 0.05 -> noise norm ~0.4 in 64 dims -> within-cluster
        # cosine ~0.85-0.9 (a realistic "true neighbor" regime)
        v = c + 0.05 * rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_multiprobe_recall_on_clustered(clustered):
    q = clustered.filter(F.col("vec_id") < 40)
    exact = _pairs(brute_force_topk(clustered, q, k=5))
    lsh = _pairs(
        lsh_topk(clustered, q, dim=DIM, k=5, tables=4, n_planes=8, probe_hamming=1)
    )
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.85, recall


def test_ivf_kmeans_recall_on_clustered(clustered):
    q = clustered.filter(F.col("vec_id") < 40)
    exact = _pairs(brute_force_topk(clustered, q, k=5))
    ivf = _pairs(
        ivf_topk(
            clustered, q, dim=DIM, k=5, n_centroids=16, nprobe=4, kmeans_iters=5
        )
    )
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.85, recall
    # trained centroids must not be WORSE than the raw random ones
    raw = _pairs(
        ivf_topk(clustered, q, dim=DIM, k=5, n_centroids=16, nprobe=4)
    )
    assert recall >= len(raw & exact) / len(exact) - 0.05


def test_neardup_lsh_recall_on_clustered(clustered):
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            clustered, threshold=0.8, method="exact"
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            clustered, threshold=0.8, method="lsh", dim=DIM, n_planes=6, tables=8
        ).collect()
    }
    assert len(exact) > 100
    # every LSH pair is exact-verified (precision 1.0 by construction)
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, recall


def test_multiprobe_floor_on_uniform(spark):
    """Near-uniform testdata: multiprobe must still beat single-bucket
    probing by a wide margin (regression floor, not a quality target)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    exact = _pairs(brute_force_topk(emb, q, k=5))
    h0 = _pairs(
        lsh_topk(emb, q, dim=DIM, k=5, tables=4, n_planes=8, probe_hamming=0)
    )
    h1 = _pairs(
        lsh_topk(emb, q, dim=DIM, k=5, tables=4, n_planes=8, probe_hamming=1)
    )
    r0 = len(h0 & exact) / len(exact)
    r1 = len(h1 & exact) / len(exact)
    assert r1 >= max(2 * r0, 0.25), (r0, r1)


def test_pq_adc_recall_on_clustered(clustered):
    from ner_backend_spark.spark.similarity import pq_codebooks, pq_topk

    exact = _pairs(
        brute_force_topk(clustered, clustered.filter(F.col("vec_id") < 10), k=5)
    )
    books = pq_codebooks(clustered, dim=DIM, n_blocks=4, n_codes=16)
    pq = _pairs(pq_topk(clustered, books, k=5, n_queries=10))
    # PQ's contract on tight clusters is CLUSTER retrieval, not exact-rank
    # recall: 4x16 codes collapse same-cluster members onto near-identical
    # codewords, so which of 20 interchangeable siblings ranks 1st vs 6th
    # is quantization noise (measured exact-rank recall ~0.36 here, and
    # that is correct PQ behavior per Jégou et al. — ADC ranks cells, the
    # exact within-cell order needs a re-rank pass). Assert what the code
    # must get right: every retrieved neighbor comes from the query's own
    # cluster (cluster of vec i is i % 20), and a non-trivial floor of the
    # exact set still surfaces.
    same_cluster = sum(1 for q, n in pq if q % 20 == n % 20) / len(pq)
    assert same_cluster >= 0.95, same_cluster
    recall = len(pq & exact) / len(exact)
    assert recall >= 0.2, recall


def test_pq_encode_matches_numpy_mirror(clustered):
    from ner_backend_spark.spark.similarity import (
        _pq_encode_np,
        _pq_train,
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks(clustered, dim=DIM, n_blocks=4, n_codes=16)
    got = {
        r["id"]: list(r["codes"])
        for r in pq_encode(clustered, books).collect()
    }
    rows = clustered.orderBy("vec_id").collect()
    # codebooks themselves must be reproducible from the same sample rows
    X = np.array(
        [r["embedding"] for r in rows[:4096]], dtype=np.float64
    )
    books2 = _pq_train(X, 4, 16, 5)
    assert np.array_equal(books, books2)
    biases = 0.5 * (books**2).sum(axis=2)
    for r in rows:
        want = _pq_encode_np(
            np.asarray(r["embedding"], dtype=np.float64), books, biases
        )
        assert got[r["vec_id"]] == list(want), r["vec_id"]
    # every code in range
    assert all(0 <= c < 16 for cs in got.values() for c in cs)


def test_rrf_fuse_hand_values(spark):
    from ner_backend_spark.spark.similarity import rrf_fuse

    # system A ranks docs 1,2,3; system B ranks 2,3,4 — doc 2 must win
    # (1/61 + 1/62 beats every single-system score), doc 1 (rank-1 in A
    # only) ties doc 4's profile shape but not value; ties impossible
    # here, so check exact arithmetic and ordering
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)],
        "query_id long, neighbor_id long, rnk long",
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2), (0, 4, 3)],
        "query_id long, neighbor_id long, rnk long",
    )
    rows = rrf_fuse([a, b], k=60, topk=10).collect()
    got = {r["neighbor_id"]: (r["rrf"], r["fused_rnk"]) for r in rows}
    assert got[2] == (round(1 / 62 + 1 / 61, 6), 1), got
    assert got[3] == (round(1 / 63 + 1 / 62, 6), 2), got
    # singles: doc 1 (1/61) > doc 4 (1/63)
    assert got[1] == (round(1 / 61, 6), 3)
    assert got[4] == (round(1 / 63, 6), 4)


def test_rrf_fuse_topk_and_tiebreak(spark):
    from ner_backend_spark.spark.similarity import rrf_fuse

    # two docs with IDENTICAL profiles (rank 1 in exactly one system):
    # tie breaks on neighbor_id; topk truncates per query
    a = spark.createDataFrame(
        [(0, 9, 1)], "query_id long, neighbor_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(0, 4, 1)], "query_id long, neighbor_id long, rnk long"
    )
    rows = rrf_fuse([a, b], k=60, topk=1).collect()
    assert len(rows) == 1 and rows[0]["neighbor_id"] == 4, rows
