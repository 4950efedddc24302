"""Knowledge-graph construction over the entities output.

Pipeline (new per north_star; the reference stops at entities/groups —
schema.go:129-144 — this layer canonicalizes and materializes triples):

  entities (url, label, text)
    -> mentions            distinct (label, normalized surface), stable ids
    -> alias candidates    broadcast alias-dictionary join (exact on the
                           normalized surface) — map-side, no shuffle
    -> LSH blocking        char-trigram MinHash signatures computed entirely
                           JVM-side; band-bucket self-join proposes pairs
                           (never all-pairs)
    -> link scoring        exact trigram Jaccard on proposed pairs
    -> connected components alternating large-star / small-star (aggregate
                           form: groupBy-min + join, no collect_list, so no
                           high-degree-node blowup; O(log n) rounds)
    -> canonicalization    per component: alias canonical id if any member
                           hit the dictionary, else the lexicographically
                           smallest surface
    -> triples             (subj=url, pred=HAS_<LABEL>, obj=canonical) +
                           (subj=url, pred=IN_GROUP, obj=group_name)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# diagnostic: star rounds executed by the last connected_components call
# (read by tools/kg_tail_probe.py; never consulted by the operators)
LAST_CC_ROUNDS: int | None = None


def _materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a shared subplan in a deployment-appropriate way.

    ``eager=True`` (the CC fixpoint rounds, where LINEAGE CUTS are the
    point — unbounded iteration lineage otherwise): with a reliable
    checkpoint dir configured (sc.setCheckpointDir — see session.get_spark's
    SPARK_CHECKPOINT_DIR), use ``.checkpoint()`` so an executor loss mid-CC
    recomputes from fault-tolerant storage (VERDICT r1 "What's wrong" #4);
    persist-then-unpersist around it avoids the documented
    recompute-to-write caveat. Without one (local[*] benches), fall back to
    ``localCheckpoint``.

    ``eager=False`` (reuse-only sites: the banded self-join input, the
    entities frame consumed twice): ``localCheckpoint`` — NOT ``persist``,
    whose entry in the SQL CacheManager is held strongly and is never
    reclaimed by the ContextCleaner (verified: the entry survives del +
    gc), leaking one cache per KG query in long-lived sessions AND
    silently substituting itself into later identical plans (it turned a
    benchmark's second cold pass into a warm one). localCheckpoint is
    RDD-level: no CacheManager entry, no plan substitution, blocks
    reclaimed when the RDD reference drops. The trade: lineage truncation,
    so an executor loss during the single consuming query fails that query
    (re-run; the checkpoint/resume layer makes re-runs cheap) — the CC
    fixpoint, where lineage cuts must survive executor loss, stays on the
    reliable eager path below.
    """
    sc = df.sparkSession.sparkContext
    if not eager:
        return df.localCheckpoint(eager=False)
    if sc.getCheckpointDir() is not None:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        out = df.checkpoint(eager=True)
        df.unpersist()
        return out
    return df.localCheckpoint(eager=True)


def normalize_surface(col):
    """Deterministic surface normalization for matching/blocking."""
    return F.regexp_replace(F.lower(F.trim(col)), r"[ \t\n\f\r]+", " ")


def extract_mentions(entities: DataFrame) -> DataFrame:
    """(mention_id, label, text, norm): distinct surfaces per label."""
    m = (
        entities.select("label", "text")
        .distinct()
        .withColumn("norm", normalize_surface(F.col("text")))
    )
    # id over the raw surface: distinct spellings stay distinct nodes; equal
    # norms produce identical trigram signatures, so LSH proposes them and
    # Jaccard scores them 1.0 — they merge through the graph, not the id.
    return m.withColumn("mention_id", F.xxhash64("label", "text"))


def _trigrams(col_name: str):
    """Distinct character 3-grams of '^'+col+'$' (pads short strings)."""
    padded = f"concat('^', {col_name}, '$')"
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({padded}) - 2, 1)),"
            f" i -> substring({padded}, i, 3))"
        )
    )


def with_trigrams(mentions: DataFrame) -> DataFrame:
    return mentions.withColumn("trigrams", _trigrams("norm"))


def alias_candidates(mentions: DataFrame, alias_df: DataFrame) -> DataFrame:
    """(mention_id, canonical_id) via broadcast alias dictionary.

    alias_df: (surface, canonical_id) — the small curated dictionary; its
    normalized surface joins map-side against mention norms (J-new in SURVEY
    §2.7: broadcast map-side join for candidate generation).
    """
    alias_norm = alias_df.select(
        normalize_surface(F.col("surface")).alias("norm"),
        F.col("canonical_id"),
    )
    return mentions.join(F.broadcast(alias_norm), "norm").select(
        "mention_id", "canonical_id"
    )


def band_signatures(
    mentions: DataFrame,
    num_hashes: int = 15,
    bands: int = 5,
    carry_trigrams: bool = False,
) -> DataFrame:
    """(mention_id, label, band, band_hash): the LSH banding of each mention.

    sig[i] = array_min(transform(trigrams, t -> hash(t, i))); band_hash =
    hash(slice(sig, ...)). Pure column expressions — a mention's banding
    depends only on its own surface, which is what makes the banding table
    APPEND-ONLY under incremental construction (streaming/kg_update.py):
    new mentions' bands join against stored bands without recomputing them.

    ``carry_trigrams=True`` keeps the trigram array on each banded row so
    the bucket self-join can score pairs INLINE (fused path, see
    :func:`lsh_candidate_pairs` ``score_threshold``) — heavier banding
    shuffle rows in exchange for never shuffling the candidate-pair set
    through id-joins.
    """
    rows_per_band = num_hashes // bands
    extra = ["trigrams"] if carry_trigrams else []
    sig = with_trigrams(mentions).select(
        "mention_id",
        "label",
        *extra,
        F.array(
            *[
                F.array_min(
                    F.expr(
                        f"transform(trigrams, t -> hash(t, {i}))"
                    )
                )
                for i in range(num_hashes)
            ]
        ).alias("signature"),
    )
    return sig.select(
        "mention_id",
        "label",
        *extra,
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.slice("signature", b * rows_per_band + 1, rows_per_band)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def lsh_candidate_pairs(
    mentions: DataFrame,
    num_hashes: int = 15,
    bands: int = 5,
    same_label_only: bool = True,
    max_bucket_size: int | None = None,
    chunk_threshold: int = 256,
    chunk_groups: int = 32,
    score_threshold: float | None = None,
) -> DataFrame:
    """(id_a, id_b) mention pairs sharing >=1 MinHash band bucket.

    Signatures are built with built-in functions only:
    sig[i] = array_min(transform(trigrams, t -> hash(t, i))). Band hash =
    hash(slice(sig, ...)). Shuffle key is (band, band_hash[, label]).

    Default banding 5 bands x 3 rows: collision probability ≈ 97% at
    Jaccard 0.8 (the linking regime), ≈ 13% at 0.3 — selective enough that
    dissimilar-surface pairs don't flood the downstream exact-Jaccard
    verification (2 rows/band collides 43% of the time at J=0.3).

    Skew: a bucket of size m emits O(m^2) pairs, and a plain self-join
    generates ALL of them inside one task (join keys can't split below key
    granularity) — template surfaces (shared email domains, URL prefixes)
    produce m in the thousands, serializing the stage (measured: one
    7,044-member bucket = 24.8M pairs in one task, KG 4→16-core efficiency
    0.44). Buckets larger than ``chunk_threshold`` therefore go through a
    CHUNKED self-join: members hash into ``chunk_groups`` chunks; the left
    side replicates each row to every chunk >= its own, so join group
    (bucket, g) holds the m/G right rows of chunk g against the left rows
    of chunks <= g — the m^2 work spreads over G groups (max m^2/G per
    task) at a shuffle-replication cost of G/2 per hot row only. Exact same
    candidate set as the plain join; small buckets keep the cheap path.

    ``max_bucket_size`` remains the optional SEMANTIC guard: buckets above
    it are dropped entirely — at web scale million-member buckets are
    template strings, not linkable entities, and even chunked enumeration
    of 10^12 pairs is work that should not happen.

    ``score_threshold`` (the FUSED path, default off): carry each banded
    row's trigram array through the banding shuffle and score the exact
    trigram Jaccard INLINE in the bucket self-join, returning only pairs
    with score >= threshold. Same final pair set as
    ``score_links(lsh_candidate_pairs(...), mentions, t)`` — Jaccard is a
    pure function of the pair, so scoring per bucket collision before the
    distinct() equals scoring once after it — and the plan drops the
    candidate-pair distinct's full width plus the two id-joins that fetch
    trigram arrays. MEASURED VERDICT (round-6 A/B, m10 8.65M-edge graph,
    3 warm reps per level): the fusion LOSES — 42.3 s @4 cores / 62.0 s
    @16 fused vs 42.4 s / 21.0 s unfused. Jaccard runs per bucket
    collision (~30M) instead of per distinct pair (~8.65M), the banding
    shuffle carries trigram-widened rows, and the wide-row SMJ anti-
    scales under a shared fixed-size heap. Kept as an option because the
    trade flips when bands*|trigrams| is small relative to the collision
    multiplicity (near-unique buckets), but :func:`mention_edges` does
    NOT use it.
    """
    # the banding map (trigrams + num_hashes hash passes per mention) is the
    # CPU-heaviest narrow stage of the KG tail; the mentions frame arrives
    # AQE-coalesced to a handful of partitions (it's small in BYTES), which
    # caps this stage's parallelism — round-6 edges_probe measured the map
    # running as 12 tasks on 16 cores (aggregate task time ~5x the stage
    # wall available to it). Fan it out first; on a 100 TB input the scan
    # provides the width and this is a no-op.
    from .session import ensure_parallelism

    banded = band_signatures(
        ensure_parallelism(mentions), num_hashes, bands,
        carry_trigrams=score_threshold is not None,
    )
    # bucket granularity must match the join key: with same_label_only the
    # self-join groups on (band, band_hash, label), so occupancy is counted
    # per label too — otherwise a mixed-label bucket could be dropped even
    # though each actual join group is small
    bucket_cols = (
        ["band", "band_hash", "label"]
        if same_label_only
        else ["band", "band_hash"]
    )
    # bucket occupancy as a WINDOW count, not groupBy-count + join back:
    # the join form evaluates the banding projection (trigrams + the
    # num_hashes hash passes — the CPU-heaviest narrow stage of the KG
    # tail) TWICE, once under the aggregate and once as the probe side,
    # and pays two exchanges; the window computes the identical
    # _bucket_size with ONE exchange over a single banding pass
    # (round-8 A/B: identical pair sets, 0.47 s -> 0.35 s warm at sf0.1;
    # at 100 TB it halves the banding map work outright)
    wb = Window.partitionBy(*bucket_cols)
    banded = banded.withColumn("_bucket_size", F.count(F.lit(1)).over(wb))
    if max_bucket_size is not None:
        banded = banded.filter(F.col("_bucket_size") <= max_bucket_size)
    # consumed by BOTH the small and the chunked branch below: materialize
    # so signatures/bucket sizes compute once (shared-subplan re-execution)
    banded = _materialize(banded, eager=False)

    eq = [
        (F.col("l.band") == F.col("r.band")),
        (F.col("l.band_hash") == F.col("r.band_hash")),
    ]

    def _jaccard_ok(left_tri, right_tri):
        # exact trigram Jaccard, the identical expression score_links uses
        return (
            F.size(F.array_intersect(left_tri, right_tri))
            / F.size(F.array_union(left_tri, right_tri))
        ) >= F.lit(float(score_threshold))

    # cheap path: whole bucket in one join group
    small = banded.filter(F.col("_bucket_size") <= chunk_threshold)
    l, r = small.alias("l"), small.alias("r")
    cond = eq[0] & eq[1] & (F.col("l.mention_id") < F.col("r.mention_id"))
    if same_label_only:
        cond = cond & (F.col("l.label") == F.col("r.label"))
    if score_threshold is not None:
        cond = cond & _jaccard_ok(F.col("l.trigrams"), F.col("r.trigrams"))
    pairs_small = l.join(r, cond).select(
        F.col("l.mention_id").alias("id_a"),
        F.col("r.mention_id").alias("id_b"),
    )

    # chunked path: join key gains a chunk id, splitting the hot bucket
    big = banded.filter(F.col("_bucket_size") > chunk_threshold)
    g = F.pmod(F.xxhash64("mention_id"), F.lit(chunk_groups))
    bl = (
        big.withColumn("_lg", g)
        .withColumn(
            "_rg",
            F.explode(F.sequence(F.col("_lg"), F.lit(chunk_groups - 1))),
        )
        .alias("l")
    )
    br = big.withColumn("_g", g).alias("r")
    bcond = (
        eq[0]
        & eq[1]
        & (F.col("l._rg") == F.col("r._g"))
        & (
            (F.col("l._lg") < F.col("r._g"))
            | (F.col("l.mention_id") < F.col("r.mention_id"))
        )
    )
    if same_label_only:
        bcond = bcond & (F.col("l.label") == F.col("r.label"))
    if score_threshold is not None:
        bcond = bcond & _jaccard_ok(F.col("l.trigrams"), F.col("r.trigrams"))
    pairs_big = bl.join(br, bcond).select(
        F.least("l.mention_id", "r.mention_id").alias("id_a"),
        F.greatest("l.mention_id", "r.mention_id").alias("id_b"),
    )

    return pairs_small.unionByName(pairs_big).distinct()


def score_links(
    pairs: DataFrame, mentions: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """(id_a, id_b, score): exact trigram Jaccard on candidate pairs only."""
    tri = with_trigrams(mentions).select("mention_id", "trigrams")
    a = tri.select(
        F.col("mention_id").alias("id_a"), F.col("trigrams").alias("tri_a")
    )
    b = tri.select(
        F.col("mention_id").alias("id_b"), F.col("trigrams").alias("tri_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("tri_a", "tri_b"))
                / F.size(F.array_union("tri_a", "tri_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# Connected components: alternating large-star / small-star
# (aggregate formulation of Kiveris et al., "Connected Components in
# MapReduce and Beyond" — groupBy-min + join per round, O(log n) rounds,
# no per-node adjacency lists materialized)


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    # per-src min neighbor as a WINDOW aggregate, not groupBy-min + join:
    # the join form partitions sym TWICE (once under the aggregate, once
    # as the probe side) and re-executes the symmetrize map under each,
    # while the window computes the same m = least(min nbr, src) with ONE
    # exchange + sort (round-8 A/B: identical assignments, CC wall 1.4 s
    # -> 0.85 s warm at sf0.1; at scale it strictly halves the shuffled
    # bytes of the round). Skew is unchanged: a hot src concentrated its
    # rows on one reducer under the join's hash partitioning too.
    sym = _symmetrize(edges)
    w = Window.partitionBy("src")
    m = F.least(F.min("dst").over(w), F.col("src"))
    # no trailing distinct: _small_star's leading distinct() dedups the
    # oriented edges anyway — one shuffle per CC round saved (in the
    # alternating large->small composition used by connected_components)
    return (
        sym.withColumn("m", m)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient child -> parent (src > dst)
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    # same window-over-join trade as _large_star; the moved edges and the
    # per-src self edge emit in ONE pass (explode of two structs — the
    # duplicate (src, m) rows per src collapse in the trailing distinct,
    # which the original union form needed anyway)
    w = Window.partitionBy("src")
    withm = oriented.withColumn("m", F.min("dst").over(w))
    both = withm.select(
        F.explode(
            F.array(
                F.struct(F.col("dst").alias("src"), F.col("m").alias("dst")),
                F.struct(F.col("src").alias("src"), F.col("m").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return both.filter(F.col("src") != F.col("dst")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007)).cast(
                    "decimal(38,0)"
                )
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame, max_iter: int = 25, steps_per_round: int = 1
) -> DataFrame:
    """(id, component): component = min node id in the component.

    Input edges: (src, dst). Isolated nodes don't appear; callers union
    them back with component = own id.
    """
    # Materialize the input once: the edge lineage is typically expensive
    # (an LSH self-join), and it is consumed by the iteration seed AND the
    # node-set below — without this it would be recomputed per consumer.
    base = _materialize(edges.select("src", "dst"))
    cur = base.filter(F.col("src") != F.col("dst")).distinct()
    # Per-round job count is the KG tail's latency budget (VERDICT r3 "Next
    # round" #7: ~40 short stages of fixed latency dominate the m10 e2e
    # efficiency). With a reliable checkpoint dir (real deployments) each
    # round stays 2 jobs: an eager fault-tolerant checkpoint, then the
    # convergence checksum — an executor loss mid-fixpoint recomputes from
    # storage. Without one (local benches), the round is ONE job: a lazy
    # localCheckpoint whose materializing action IS the checksum aggregate,
    # halving per-round job latency with identical results.
    reliable = (
        edges.sparkSession.sparkContext.getCheckpointDir() is not None
    )
    # steps_per_round: star alternations per materialize+checksum. The
    # round-4 hypothesis was that 2 steps/round would halve the driver-
    # blocking fixed cost per round; the round-5 A/B on the m10 8.65M-edge
    # graph (tools/cc_ab_m10.py, warm runs) REFUTED it: steps=1 beats
    # steps=2 at both 4 cores (18.5 s vs 22.4 s) and 16 cores (14.5 s vs
    # 16.2 s) — the checksum job is cheap next to the extra scheduling of
    # the longer fused plan, and convergence at rounds=4 means steps=2
    # wastes half an alternation's shuffles in the final confirm round
    # (6 rounds executed vs 4). Default is therefore 1; the alternating
    # algorithm is idempotent at the fixpoint, so any steps_per_round
    # still detects convergence exactly.
    global LAST_CC_ROUNDS
    prev_sum = None
    rounds = 0
    for _ in range((max_iter + steps_per_round - 1) // steps_per_round):
        nxt = cur
        for _s in range(steps_per_round):
            nxt = _small_star(_large_star(nxt))
            # leaf-ify BETWEEN the chained alternations (lazy — no job of
            # its own; the round's checksum job computes and caches it).
            # Without this cut the second alternation's plan embeds the
            # first's subplan at every self-reference (_small_star reads
            # its input 3x, _large_star 2x) and the round re-executes
            # those shuffles instead of reusing them — measured 2.4x KG
            # wall blowup at m10 (282 s vs 116 s @4 cores) when the
            # double-step first shipped without the cut. In reliable-
            # checkpoint deployments the cut narrows fault tolerance for
            # the intra-round window only: an executor loss mid-round
            # fails that job and the stage-checkpoint layer re-runs from
            # the last durable round — the round boundary itself stays on
            # the reliable eager path below.
            if _s < steps_per_round - 1:
                nxt = nxt.localCheckpoint(eager=False)
        rounds += steps_per_round
        if reliable:
            cur = _materialize(nxt)
        else:
            cur = nxt.localCheckpoint(eager=False)
        checksum = _edge_checksum(cur)
        if checksum == prev_sum:
            break
        prev_sum = checksum
    LAST_CC_ROUNDS = rounds

    # final edges are (node -> root) stars; roots map to themselves; nodes
    # come from the unfiltered base so self-loop-only nodes keep their id
    nodes = base.select(F.col("src").alias("id")).union(
        base.select(F.col("dst").alias("id"))
    ).distinct()
    parent = cur.groupBy("src").agg(F.min("dst").alias("component"))
    return nodes.join(
        parent, nodes.id == parent.src, "left"
    ).select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def connected_components_hashmin(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(id, component) via hash-to-min — the VERDICT-r5 A/B candidate.

    Hash-to-min (Rastogi et al. 2013, "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds"): every node keeps a known-cluster
    set C(v) (seeded with N(v) ∪ {v}); per round each v sends
    min C(v) to every member of C(v) and sends C(v) to min C(v). The
    fixpoint is C(min)=component, C(v)={min} elsewhere; it arrives in
    O(log d) rounds — typically FEWER, FATTER rounds than the alternating
    large-star/small-star in :func:`connected_components`.

    Relational form (same discipline as the star variant — groupBy-min +
    join, no collect_list): the state is an edge set (src, dst) meaning
    "dst ∈ C(src)", each round is one groupBy + one join + one distinct,
    and the per-round lineage cut / convergence checksum protocol is
    identical to connected_components (lazy localCheckpoint whose
    materializing action is the checksum aggregate on local runs, eager
    reliable checkpoint when a checkpoint dir is configured).

    SCALE HAZARD (why this is NOT the default): at the fixpoint the min
    node of each component holds the ENTIRE component in its cluster set,
    so the send-C(v)-to-min step hashes O(|component|) rows to ONE key —
    a structural hot key for giant components, exactly the blowup the
    alternating-star form avoids (its per-node state never exceeds the
    node's degree). Use only where the component-size distribution is
    known-bounded; the A/B harness is tools/cc_ab_hashmin.py.
    """
    base = _materialize(edges.select("src", "dst"))
    sym = _symmetrize(base.filter(F.col("src") != F.col("dst"))).distinct()
    nodes = base.select(F.col("src").alias("id")).union(
        base.select(F.col("dst").alias("id"))
    ).distinct()
    # seed: C(v) = N(v) ∪ {v}
    cur = sym.union(
        nodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    )
    reliable = (
        edges.sparkSession.sparkContext.getCheckpointDir() is not None
    )
    global LAST_CC_ROUNDS
    prev_sum = None
    rounds = 0
    for _ in range(max_iter):
        mins = cur.groupBy("src").agg(F.min("dst").alias("m"))
        joined = cur.join(mins, "src")
        # min C(v) -> every u ∈ C(v);  C(v) -> min C(v)
        nxt = (
            joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(
                joined.select(F.col("m").alias("src"), F.col("dst").alias("dst"))
            )
            .distinct()
        )
        rounds += 1
        if reliable:
            cur = _materialize(nxt)
        else:
            cur = nxt.localCheckpoint(eager=False)
        checksum = _edge_checksum(cur)
        if checksum == prev_sum:
            break
        prev_sum = checksum
    LAST_CC_ROUNDS = rounds

    parent = cur.groupBy("src").agg(F.min("dst").alias("component"))
    return nodes.join(
        parent, nodes.id == parent.src, "left"
    ).select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def connected_components_peel1(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(id, component) with a one-round degree-1 pre-peel — the
    VERDICT-r6 #5 A/B candidate.

    Rationale: on mention graphs most nodes are leaves (the round-6
    stage audit: CC round 1 carries 8.65M → 89k edges at m10), and a
    degree-1 node can never change any other node's component label —
    so peel them relationally BEFORE the star fixpoint, run the
    standard alternating CC on the (much smaller) 2-core-ish remainder,
    then re-attach:

    - pendant edge (leaf—anchor): leaf inherits the anchor's label
      (anchor's own id when the anchor lost all its core edges — a star
      hub);
    - leaf—leaf edge: an isolated 2-node component, label min(a, b);
    - a final member-min relabel restores the exact "component = min
      node id" contract (the peel may remove the true min — e.g. a
      leaf with the smallest id in its component), two node-sized
      shuffles.

    Every step is a semi/anti join or groupBy on node keys — no
    adjacency collection. The A/B harness is tools/cc_ab_peel.py; like
    connected_components_hashmin this stays in-tree either way so the
    measurement is reproducible.

    A/B RESULT (round 7, CC_PEEL_AB.json): REFUTED on the m10 8.65M-edge
    mention graph at 16 cores — peel1 31.98 s vs baseline 18.36 s
    (0.57x), assignments identical. The peel's own cost (degree groupBy
    over the full edge set + four semi/anti joins + the member-min
    relabel's two shuffles) exceeds the star round it displaces: the
    alternating-star first round already collapses 8.65M → 89k edges in
    ONE groupBy+join pass, so there is no fat to cut. The default stays
    connected_components.
    """
    base = _materialize(edges.select("src", "dst"))
    und = _materialize(
        base.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("node")).union(
        und.select(F.col("b").alias("node"))
    )
    leaves = _materialize(
        sym.groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") == 1)
        .select("node"),
        eager=False,
    )
    la = leaves.withColumnRenamed("node", "a")
    lb = leaves.withColumnRenamed("node", "b")
    core = und.join(la, "a", "left_anti").join(lb, "b", "left_anti")
    pend_a = (
        und.join(la, "a", "left_semi")
        .join(lb, "b", "left_anti")
        .select(F.col("a").alias("leaf"), F.col("b").alias("anchor"))
    )
    pend_b = (
        und.join(la, "a", "left_anti")
        .join(lb, "b", "left_semi")
        .select(F.col("b").alias("leaf"), F.col("a").alias("anchor"))
    )
    pairs = und.join(la, "a", "left_semi").join(lb, "b", "left_semi")

    comp_core = _materialize(
        connected_components(
            core.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            max_iter=max_iter,
        ),
        eager=False,
    )
    pend = pend_a.union(pend_b)
    pend_lab = pend.join(
        comp_core, pend.anchor == comp_core.id, "left"
    ).select(
        F.col("leaf").alias("id"),
        F.coalesce("component", F.col("anchor")).alias("component"),
    )
    pair_lab = pairs.select(
        F.col("a").alias("id"), F.col("a").alias("component")
    ).union(
        pairs.select(F.col("b").alias("id"), F.col("a").alias("component"))
    )
    # anchors that lost ALL their edges to the peel (star hubs) are in
    # no core component — they must still appear as members of their own
    # label or the member-min relabel below would relabel their leaves
    # without them
    iso_anchors = (
        pend.select(F.col("anchor").alias("id"))
        .distinct()
        .join(comp_core, "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    assigned = comp_core.union(pend_lab).union(pair_lab).union(iso_anchors)
    # member-min relabel: the peel may have removed the component's true
    # min node, and the contract (and every downstream canonicalizer)
    # needs component = min member id exactly
    roots = assigned.groupBy("component").agg(F.min("id").alias("root"))
    relabeled = assigned.join(roots, "component").select(
        "id", F.col("root").alias("component")
    )
    nodes = base.select(F.col("src").alias("id")).union(
        base.select(F.col("dst").alias("id"))
    ).distinct()
    return nodes.join(relabeled, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def incremental_components(
    assign: DataFrame, new_edges: DataFrame
) -> DataFrame:
    """Merge new edges into an existing (id, component) assignment.

    An assignment is a star forest (every node points at its component's
    min id), so connectivity of (old graph ∪ new edges) equals connectivity
    of (star edges ∪ new edges) — the CC fixpoint re-runs over O(nodes)
    star edges plus the delta, NOT the full historical edge set. Component
    ids stay stable unless new edges merge clusters (the surviving id is
    the smaller min, exactly as a full recompute would give), so downstream
    canonicalization is identical to batch. This is what makes continuous
    KG construction (streaming/kg_update.py) equivalent to rebuilding from
    scratch every batch — proven in tests/test_kg_incremental.py.
    """
    star = assign.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("src"), F.col("component").alias("dst")
    )
    comp = connected_components(star.unionByName(new_edges))
    # nodes absent from every edge (stable singletons) keep their id
    ids = (
        assign.select("id")
        .union(new_edges.select(F.col("src").alias("id")))
        .union(new_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    c = comp.withColumnRenamed("id", "cid")
    return ids.join(c, ids.id == c.cid, "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


# ---------------------------------------------------------------------------
# Canonicalization + triples


def canonicalize(
    entities: DataFrame,
    alias_df: DataFrame | None = None,
    threshold: float = 0.5,
    num_hashes: int = 15,
    bands: int = 5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(label, text, canonical): canonical surface/id per mention cluster.

    Clusters = connected components over (similarity edges) ∪ (alias edges:
    mentions matching the same dictionary entry are connected through it).
    Canonical = the dictionary canonical_id if the cluster touched the
    dictionary, else the lexicographically smallest member surface.
    """
    # Lazy localCheckpoint, not persist/unpersist: the old unpersist() ran
    # at plan-BUILD time, so by execution nothing was cached and the
    # mentions subplan (a distinct shuffle over entities) recomputed once
    # per consumer (banding, both score_links sides, alias hits, labeled).
    # The first consuming job materializes the checkpoint; the rest reuse
    # its blocks, and the blocks are reclaimed when the RDD reference drops
    # (no CacheManager entry — see _materialize's docstring).
    mentions = _materialize(extract_mentions(entities), eager=False)
    edges, hits = mention_edges(
        mentions, alias_df, threshold, num_hashes, bands, max_bucket_size
    )
    comp = connected_components(edges)
    return canonical_map(mentions, comp, hits)


def mention_edges(
    mentions: DataFrame,
    alias_df: DataFrame | None = None,
    threshold: float = 0.5,
    num_hashes: int = 15,
    bands: int = 5,
    max_bucket_size: int | None = None,
    materialize_hits: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """(edges, alias_hits): the similarity graph clusters are computed over.

    edges = (LSH-blocked pairs passing exact-Jaccard ``threshold``) ∪
    (mention -> virtual per-dictionary-entry node, for alias hits) — the
    virtual node connects every mention matching the same dictionary entry
    without materializing the within-entry clique.

    ``materialize_hits=False`` skips the eager hits materialization for
    callers that only consume the edges (the stage-checkpointed runner
    re-derives alias hits at its canonical stage from on-disk mentions).
    """
    # candidates-then-score, NOT the fused score_threshold path: the
    # round-6 A/B on the m10 8.65M-edge graph (3 warm reps/level,
    # /tmp entities_240000_m10) REFUTED the fusion — fused 42.3 s @4
    # cores / 62.0 s @16 vs unfused 42.4 s / 21.0 s. Scoring once per
    # DISTINCT pair (~8.65M Jaccard evaluations on dictionary-encoded
    # joined arrays) beats scoring every bucket collision (~30M
    # evaluations inside the SMJ probe on trigram-widened rows, which
    # also quadruples the banding shuffle bytes and anti-scales under
    # the shared fixed-size heap). The id-joins the fusion was meant to
    # remove turn out to be the cheap part.
    pairs = lsh_candidate_pairs(
        mentions, num_hashes, bands, max_bucket_size=max_bucket_size
    )
    sim_edges = score_links(pairs, mentions, threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    if alias_df is None:
        return sim_edges, None
    # materialized: hits is consumed by the alias edges AND (lazily, in the
    # returned plan) by canonical_map's comp_alias branch, which would
    # otherwise re-derive mentions after the caller unpersists them
    hits = alias_candidates(mentions, alias_df)
    if materialize_hits:
        # LAZY localCheckpoint (round-8): the eager form ran a dedicated
        # job whose only purpose was to pre-compute the broadcast alias
        # join — one full pass over the mentions upstream before the CC
        # base materialization repeated most of it. Lazily cut, the hits
        # blocks materialize inside the first consuming job (the CC base
        # eager checkpoint, which computes the mentions blocks anyway)
        # and canonical_map's comp_alias branch still reuses them.
        # A/B on q_kg_triples: identical triples, first-run wall
        # 12.2 s -> 3.1 s (the duplicated upstream pass), warm ~0.3 s
        # saved (one job boundary).
        hits = _materialize(hits, eager=False)
    alias_edges = hits.select(
        F.col("mention_id").alias("src"),
        F.xxhash64(F.concat(F.lit("alias:"), "canonical_id")).alias("dst"),
    )
    return sim_edges.union(alias_edges), hits


def mention_components(
    mentions: DataFrame,
    alias_df: DataFrame | None = None,
    threshold: float = 0.5,
    num_hashes: int = 15,
    bands: int = 5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id, component) for every mention (component = min node id in its
    cluster; isolated mentions map to themselves). The directly-queryable
    form of the clustering that canonicalize consumes."""
    edges, _ = mention_edges(
        mentions, alias_df, threshold, num_hashes, bands, max_bucket_size
    )
    comp = connected_components(edges)
    return (
        mentions.join(comp, mentions.mention_id == comp.id, "left")
        .select(
            F.col("mention_id").alias("id"),
            F.coalesce("component", F.col("mention_id")).alias("component"),
        )
    )


def canonical_map(
    mentions: DataFrame, comp: DataFrame, hits: DataFrame | None = None
) -> DataFrame:
    """(label, text, canonical) from materialized mentions + components.

    Factored out of :func:`canonicalize` so the stage-checkpointed runner
    (checkpoint_kg.py) can resume from on-disk mentions/components tables.
    """
    # `labeled` feeds three consumers (rep, comp_alias, the final join);
    # materialize so the mention⋈component join runs once, not per
    # consumer. LAZY localCheckpoint (round-8): the eager form spent a
    # dedicated job boundary on it; lazily cut, the first consuming job
    # computes and caches the blocks and the other consumers reuse them —
    # A/B on q_kg_triples: identical triples, ~0.2 s warm / several
    # seconds first-run saved.
    labeled = (
        mentions.join(comp, mentions.mention_id == comp.id, "left")
        .select(
            "mention_id",
            "label",
            "text",
            "norm",
            F.coalesce("component", F.col("mention_id")).alias("component"),
        )
    )
    labeled = _materialize(labeled, eager=False)

    # ONE aggregation pass picks both the representative surface (smallest
    # (norm, text) in the component) and the dictionary canonical id:
    # min(canonical_id) skips nulls, so left-joining hits before the groupBy
    # gives exactly the old separate comp_alias aggregate — fused to save a
    # shuffle and a join per query (VERDICT r3 "Next round" #7).
    src = labeled
    aggs = [F.min(F.struct("norm", "text")).alias("rep")]
    if hits is not None:
        src = labeled.join(hits, "mention_id", "left")
        aggs.append(F.min("canonical_id").alias("alias_canonical"))
    agg = src.groupBy("component").agg(*aggs)
    if hits is not None:
        rep = agg.select(
            "component",
            F.coalesce("alias_canonical", F.col("rep.text")).alias("canonical"),
        )
    else:
        rep = agg.select("component", F.col("rep.text").alias("canonical"))

    return labeled.join(rep, "component").select("label", "text", "canonical")


def build_triples(
    entities: DataFrame,
    object_groups: DataFrame | None = None,
    alias_df: DataFrame | None = None,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(subj, pred, obj) triples, canonicalized.

    (url, HAS_<LABEL>, canonical_entity) from entities;
    (url, IN_GROUP, group_name) from object_groups (FIXTURES.md §2).
    """
    # entities is consumed twice (mention extraction + the final HAS join);
    # materialize so an expensive upstream (the NER tagger) runs once — the
    # same reason the reference persists object_entities before reading it
    # back (internal/core/processor.go:349-358).
    entities = _materialize(entities, eager=False)
    canon = canonicalize(
        entities, alias_df, threshold, max_bucket_size=max_bucket_size
    )
    return triples_from_canonical(entities, canon, object_groups)


def triples_from_canonical(
    entities: DataFrame,
    canon: DataFrame,
    object_groups: DataFrame | None = None,
) -> DataFrame:
    """The triple projection given an already-computed canonical map —
    shared by :func:`build_triples` and the stage-checkpointed runner
    (checkpoint_kg.py resumes from an on-disk ``canonical`` table), so the
    two paths cannot drift (round-3 review finding)."""
    has = (
        entities.join(canon, ["label", "text"])
        .select(
            F.col("url").alias("subj"),
            F.concat(F.lit("HAS_"), F.col("label")).alias("pred"),
            F.col("canonical").alias("obj"),
        )
        .distinct()
    )
    if object_groups is None:
        return has
    groups = object_groups.select(
        F.col("url").alias("subj"),
        F.lit("IN_GROUP").alias("pred"),
        F.col("group_name").alias("obj"),
    ).distinct()
    return has.unionByName(groups)


def write_triples(
    triples: DataFrame,
    path: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
    sink=None,
) -> None:
    """Partitioned materialization: pred is the natural partition column
    (low cardinality, prunes HAS_<LABEL> queries); subj-hash distribution
    within partitions co-locates a url's triples. ``path`` doubles as the
    table name under a custom sink (Iceberg: pass sinks.IcebergSink and a
    plain table name)."""
    from . import sinks

    if sink is None:
        base, _, table = path.rpartition("/")
        sink = sinks.ParquetSink(base or ".")
    else:
        table = path
    sink.write(
        triples,
        table,
        spec=(sinks.identity("pred"),),
        mode=mode,
        distribute=(n_buckets, ["subj"]),
        sort_within=["subj", "pred"],
    )
