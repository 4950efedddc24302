"""KG layer tests: blocking, link scoring, connected components,
canonicalization, triple materialization."""

import pytest
from pyspark.sql import functions as F

from ner_backend_spark.spark import kg

ENTITIES = [
    # (url, label, text) — NAME mentions with surface variants
    ("u1", "NAME", "Bruce Lee"),
    ("u2", "NAME", "bruce  lee"),
    ("u3", "NAME", "李小龍 (Bruce Lee)"),
    ("u4", "NAME", "Amelia O'Connell"),
    ("u5", "NAME", "Amelia OConnell"),
    ("u6", "NAME", "Jürgen Müller"),
    ("u1", "EMAIL", "brucelee@kungfu.cn"),
    ("u7", "LOCATION", "Boston"),
    ("u8", "LOCATION", "Bostn"),
]

ALIASES = [
    ("Bruce Lee", "Q16397"),
    ("李小龍 (Bruce Lee)", "Q16397"),
    ("Jürgen Müller", "Q999"),
]


@pytest.fixture(scope="module")
def entities(spark):
    return spark.createDataFrame(ENTITIES, ["url", "label", "text"]).cache()


@pytest.fixture(scope="module")
def aliases(spark):
    return spark.createDataFrame(ALIASES, ["surface", "canonical_id"])


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    comp = {r["id"]: r["component"] for r in kg.connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == 20


def test_connected_components_chain_and_star(spark):
    # long chain exercises multi-round convergence
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    comp = {r["id"]: r["component"] for r in kg.connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 31


def test_connected_components_hashmin_equivalence(spark):
    # hash-to-min must assign the identical (id -> min-node) labeling as
    # the alternating-star default on chains, stars, random graphs, and
    # isolated self-loops (the A/B candidate of tools/cc_ab_hashmin.py)
    import random

    rng = random.Random(7)
    cases = [
        [(i, i + 1) for i in range(30)],                     # chain
        [(0, i) for i in range(1, 12)] + [(50, 50)],          # star + loner
        [(rng.randrange(60), rng.randrange(60)) for _ in range(90)],
        [(rng.randrange(200), rng.randrange(200)) for _ in range(120)],
    ]
    for raw in cases:
        edges = spark.createDataFrame(raw, ["src", "dst"])
        star = {
            r["id"]: r["component"]
            for r in kg.connected_components(edges).collect()
        }
        hm = {
            r["id"]: r["component"]
            for r in kg.connected_components_hashmin(edges).collect()
        }
        assert hm == star


def test_connected_components_peel1_equivalence(spark):
    # the degree-1 pre-peel variant (VERDICT r6 #5 A/B candidate) must
    # assign the identical (id -> min-member) labeling on the peel's
    # adversarial shapes: pendant chains (peel removes the true-min
    # leaf), stars (anchor loses every edge), leaf-leaf pairs, isolated
    # self-loops, and random graphs
    import random

    rng = random.Random(13)
    cases = [
        [(i, i + 1) for i in range(30)],                      # chain
        [(5, i) for i in range(6, 18)] + [(50, 50)],          # star + loner
        [(1, 2)],                                             # single pair
        [(9, 3), (3, 4), (4, 5), (5, 3), (7, 8)],             # cycle + tails
        [(rng.randrange(60), rng.randrange(60)) for _ in range(90)],
        [(rng.randrange(300), rng.randrange(300)) for _ in range(150)],
    ]
    for raw in cases:
        edges = spark.createDataFrame(raw, ["src", "dst"])
        star = {
            r["id"]: r["component"]
            for r in kg.connected_components(edges).collect()
        }
        peeled = {
            r["id"]: r["component"]
            for r in kg.connected_components_peel1(edges).collect()
        }
        assert peeled == star, raw


def test_lsh_blocking_proposes_similar_pairs(spark, entities):
    mentions = kg.extract_mentions(entities)
    pairs = kg.lsh_candidate_pairs(mentions, num_hashes=12, bands=6)
    scored = kg.score_links(pairs, mentions, threshold=0.35)
    # map ids back to surfaces
    m = {r["mention_id"]: r["text"] for r in mentions.collect()}
    found = {
        frozenset((m[r["id_a"]], m[r["id_b"]])) for r in scored.collect()
    }
    assert frozenset(("Bruce Lee", "bruce  lee")) in found
    assert frozenset(("Amelia O'Connell", "Amelia OConnell")) in found
    assert frozenset(("Boston", "Bostn")) in found
    # dissimilar mentions must not be linked
    for pair in found:
        assert pair != frozenset(("Bruce Lee", "Jürgen Müller"))


def test_canonicalize_with_alias_dictionary(spark, entities, aliases):
    canon = kg.canonicalize(entities, aliases, threshold=0.35)
    by_text = {r["text"]: r["canonical"] for r in canon.collect()}
    # alias dictionary wins: all Bruce Lee variants -> Q16397
    assert by_text["Bruce Lee"] == "Q16397"
    assert by_text["bruce  lee"] == "Q16397"
    assert by_text["李小龍 (Bruce Lee)"] == "Q16397"
    assert by_text["Jürgen Müller"] == "Q999"
    # non-dictionary cluster canonicalizes to smallest member surface
    assert by_text["Amelia O'Connell"] == by_text["Amelia OConnell"]
    # singleton keeps itself
    assert by_text["brucelee@kungfu.cn"] == "brucelee@kungfu.cn"


def test_build_triples(spark, entities, aliases):
    groups = spark.createDataFrame(
        [("u1", "vip"), ("u7", "places")], ["url", "group_name"]
    )
    triples = kg.build_triples(entities, groups, aliases, threshold=0.35)
    rows = {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}
    assert ("u1", "HAS_NAME", "Q16397") in rows
    assert ("u2", "HAS_NAME", "Q16397") in rows
    assert ("u3", "HAS_NAME", "Q16397") in rows
    assert ("u1", "HAS_EMAIL", "brucelee@kungfu.cn") in rows
    assert ("u1", "IN_GROUP", "vip") in rows
    # canonicalization is exact-dedup aware: u1/u2/u3 all map to ONE object
    names = {(s, o) for s, p, o in rows if p == "HAS_NAME"}
    assert len({o for _, o in names if o == "Q16397"}) == 1


def test_write_triples_partitioned(spark, entities, tmp_path):
    triples = kg.build_triples(entities, None, None, threshold=0.35)
    path = str(tmp_path / "triples")
    kg.write_triples(triples, path, n_buckets=4)
    back = spark.read.parquet(path)
    assert back.count() == triples.count()
    # partition pruning on pred: reading one predicate touches one dir
    preds = {r["pred"] for r in back.select("pred").distinct().collect()}
    assert "HAS_NAME" in preds


def test_lsh_bucket_cap_counts_per_label(spark):
    """Mixed-label buckets must not be dropped when the join is label-scoped:
    occupancy is counted per (band, band_hash, label)."""
    from ner_backend_spark.spark import kg

    # identical NORMS under two labels -> identical trigram signatures, so
    # every band bucket holds n_A + n_B mentions but each label's join group
    # is only n_A (or n_B)
    rows = [("A", f"w{i}", "widget") for i in range(6)] + [
        ("B", f"w{i}", "widget") for i in range(6)
    ]
    mentions = spark.createDataFrame(
        rows, ["label", "text", "norm"]
    ).withColumn("mention_id", F.xxhash64("label", "text"))

    uncapped = kg.lsh_candidate_pairs(mentions).count()
    # cap=8: per-label occupancy is 6 <= 8, so nothing may be dropped even
    # though the mixed-label bucket holds 12
    capped = kg.lsh_candidate_pairs(mentions, max_bucket_size=8).count()
    assert capped == uncapped
    # cap=3 drops the oversized per-label groups entirely
    assert kg.lsh_candidate_pairs(mentions, max_bucket_size=3).count() == 0


def test_chunked_pair_generation_equals_plain(spark):
    """Hot-bucket chunked self-join proposes EXACTLY the plain join's pairs."""
    rows = (
        # template surfaces -> one giant trigram-similar bucket
        [(f"u{i}", "EMAIL", f"user{i}@example.com") for i in range(300)]
        # plus small organic clusters
        + [("a", "ORG", "acme corp"), ("b", "ORG", "acme corp."),
           ("c", "ORG", "initech")]
    )
    ents = spark.createDataFrame(rows, "url string, label string, text string")
    mentions = kg.extract_mentions(ents)

    def pairset(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in kg.lsh_candidate_pairs(mentions, **kw).collect()
        }

    plain = pairset(chunk_threshold=10**9)
    chunked = pairset(chunk_threshold=16, chunk_groups=4)
    assert chunked == plain
    assert len(plain) > 1000  # the template bucket really is quadratic
