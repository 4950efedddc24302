"""Scale-safety contracts of the near-dup production entry points.

VERDICT r2 "Next round" #1-2: both minhash and simhash entry points must
bound candidate fan-out under degenerate content (one boilerplate bucket
must never serialize the job), and the simhash blocking must keep
exhaustive recall at the configured radius with realistic (wide-key)
bucket occupancy — Manku-style permuted-block tables, not 7-bit chunks.
"""

import numpy as np
import pytest

from ner_backend_spark.flagship import MINHASH, SIMHASH
from ner_backend_spark.spark import dedup

# ---------------------------------------------------------------------------
# blocking-table properties (pure python, no Spark)


@pytest.mark.parametrize("radius", [1, 2, 3, 5, 8])
def test_simhash_blocking_pigeonhole_exhaustive(radius):
    """Any pair within the radius shares >= 1 full table key."""
    rng = np.random.RandomState(42)
    tables = dedup.simhash_blocking(radius)
    for _ in range(200):
        a = int(rng.randint(0, 1 << 62))
        flip = rng.choice(64, size=rng.randint(0, radius + 1), replace=False)
        b = a
        for bit in flip:
            b ^= 1 << int(bit)
        shared = any(
            all((a >> off) & ((1 << w) - 1) == (b >> off) & ((1 << w) - 1)
                for off, w in blocks)
            for blocks in tables
        )
        assert shared, f"pair at hamming {len(flip)} missed by blocking"


def test_simhash_blocking_key_width_at_flagship_radius():
    """At the flagship radius the table keys must be wide enough to block a
    web-scale corpus: >= 24 bits (chunked r+1 banding gives 64/(r+1))."""
    tables = dedup.simhash_blocking(SIMHASH["max_hamming"])
    assert len(tables) <= 32
    for blocks in tables:
        assert sum(w for _, w in blocks) >= 24


def test_simhash_blocking_rejects_infeasible():
    with pytest.raises(ValueError):
        dedup.simhash_blocking(8, n_blocks=8)  # n_blocks <= radius
    with pytest.raises(ValueError):
        dedup.simhash_blocking(8, n_blocks=24)  # combinatorial explosion


# ---------------------------------------------------------------------------
# exhaustive recall vs brute force over signatures (Spark)


def _perturbed_docs(n_base=12, n_var=4):
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(400)]
    rows, doc_id = [], 0
    for b in range(n_base):
        base = list(rng.choice(words, size=60))
        for v in range(n_var):
            doc = list(base)
            # v=0,1: exact copies (hamming 0 — guaranteed in-radius pairs);
            # v>=2: v-1 word swaps -> small-but-nonzero simhash distance
            for _ in range(max(0, v - 1)):
                doc[rng.randint(len(doc))] = str(rng.choice(words))
            rows.append((doc_id, " ".join(doc)))
            doc_id += 1
    return rows


def test_simhash_recall_matches_brute_force(spark):
    """Blocked pairs == brute-force pairs at the flagship radius, and bucket
    occupancy is realistic (no bucket holds a constant fraction of docs)."""
    rows = _perturbed_docs()
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    radius = SIMHASH["max_hamming"]

    sigs = {
        r["id"]: r["simhash"]
        for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()
    }
    brute = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if ham <= radius:
                brute.add((a, b))

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_duplicates(
            docs, "doc_id", "text", max_hamming=radius
        ).collect()
    }
    assert got == brute
    assert brute  # fixture must actually contain close pairs

    # realistic occupancy: with ~25-bit keys, non-identical fingerprints
    # should essentially never share a bucket by accident
    tables = dedup.simhash_blocking(radius)
    from collections import Counter

    occupancy = Counter()
    for sim in sigs.values():
        u = sim & ((1 << 64) - 1)
        for t_idx, blocks in enumerate(tables):
            key = 0
            for off, w in blocks:
                key = (key << w) | ((u >> off) & ((1 << w) - 1))
            occupancy[(t_idx, key)] += 1
    distinct_sigs = len(set(sigs.values()))
    assert max(occupancy.values()) <= max(3, len(sigs) - distinct_sigs + 2)


# ---------------------------------------------------------------------------
# degenerate-content cap: bounded fan-out on boilerplate corpora


@pytest.fixture(scope="module")
def boilerplate(spark):
    # 120 identical boilerplate docs + a small legitimate dup pair + noise
    rows = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(120)]
    rows += [
        (200, "alpha beta gamma delta epsilon zeta eta theta"),
        (201, "alpha beta gamma delta epsilon zeta eta theta"),
        (202, "completely different words here entirely unrelated"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_minhash_cap_bounds_degenerate_buckets(boilerplate):
    capped = dedup.near_duplicates_minhash(
        boilerplate, "doc_id", "text", threshold=0.5, max_bucket_size=50
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    # the 120-doc boilerplate bucket (> cap) contributes zero pairs ...
    assert not any(a < 200 and b < 200 for a, b in pairs)
    # ... while normal-sized buckets still yield their near-dups
    assert (200, 201) in pairs

    uncapped = dedup.near_duplicates_minhash(
        boilerplate, "doc_id", "text", threshold=0.5
    ).count()
    assert uncapped >= 120 * 119 // 2  # what the cap is protecting against


def test_simhash_cap_bounds_degenerate_buckets(boilerplate):
    capped = dedup.simhash_near_duplicates(
        boilerplate, "doc_id", "text", max_hamming=3, max_bucket_size=50
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert not any(a < 200 and b < 200 for a, b in pairs)
    assert (200, 201) in pairs


def test_flagship_configs_carry_caps():
    """The bench/driver entry points must run with the cap engaged."""
    assert MINHASH["max_bucket_size"] is not None
    assert SIMHASH["max_bucket_size"] is not None
    assert SIMHASH["max_hamming"] <= 3


def test_heavy_hitters_skewed_stream_exact_and_bounded(spark):
    """Heavy hitters on a 5M-token Zipf-ish stream (5 hot values at ~250k
    occurrences each over a ~100k-term tail): the output must EQUAL the
    straight groupBy/HAVING answer (sketch false positives die in the
    verify pass — exactness is the contract, the sketch only prunes),
    at a CI-tolerable wall. A regression that shuffles the full vocab
    (or worse, the token stream) shows up as wall, not wrongness."""
    import time

    from pyspark.sql import functions as F

    from ner_backend_spark.spark.sketches import heavy_hitters

    toks = spark.range(5_000_000).select(
        F.when(
            F.col("id") % 20 < 5,
            F.concat(F.lit("hot"), (F.col("id") % 20).cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("t"),
                F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("string"),
            )
        )
        .alias("v")
    )
    t0 = time.monotonic()
    got = {
        r["value"]: r["n"]
        for r in heavy_hitters(
            toks, "v", theta_num=1, theta_den=1000, width=16384
        ).collect()
    }
    wall = time.monotonic() - t0
    want = {
        r["v"]: r["n"]
        for r in toks.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 1000 >= 5_000_000)
        .collect()
    }
    assert set(want) == {f"hot{i}" for i in range(5)}  # fixture sanity
    assert got == want, (len(got), len(want))
    assert wall < 120, wall
