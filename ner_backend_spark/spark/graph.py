"""Graph analytics over the materialized knowledge graph.

New per north_star (kg_construct tier): once (subj, pred, obj) triples
exist, the standard consumption workloads are entity-importance
(PageRank), degree profiles, and entity co-occurrence mining. The
reference backend stops at entity storage + count queries
(internal/core/processor.go:339-420 persists entities; api.go exposes
count/pagination), so these are beyond-reference operators in the
SURVEY §2.12 family. Their oracles are *compositional*: DuckDB SQL over
the SAME pure-Python triples table the q_kg_triples gate row compares
against, so the graph math is verified independently of the Spark KG
pipeline that feeds it.

Scale notes (100 TB / 10^12-document corpus -> ~10^10-node graph):

- ``degrees``: one map-side-combined groupBy on (pred, obj). countDistinct
  lowers to a two-phase partial aggregate; no driver-side state.
- ``pagerank``: per iteration exactly ONE shuffle — the contribution
  groupBy(dst). The edge table is hash-partitioned ONCE on src and
  materialized; the per-iteration rank join hits that same partitioning
  (rank is produced keyed the same way), so AQE schedules no extra
  exchange for the edge side. Ranks are node-sized, never edge-sized.
- ``cooccurring_pairs``: the per-subj cap (deterministic smallest-K
  objects) bounds the self-join blowup at K(K-1)/2 pairs per page —
  the same structural bound the KG blocking stage uses (KG_MAX_BUCKET):
  hub pages contribute a fixed number of pairs, not a quadratic one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kg import _materialize


def degrees(triples: DataFrame) -> DataFrame:
    """(pred, obj, n_subj): per-entity in-degree split by predicate.

    The "how many pages reference this canonical entity" profile —
    the first query any KG consumer runs, and the skew census that
    decides which entities need the hot-key treatment downstream.
    """
    return triples.groupBy("pred", "obj").agg(
        F.countDistinct("subj").alias("n_subj")
    )


def symmetric_edges(triples: DataFrame) -> DataFrame:
    """Undirected (src, dst) edge set of the subj—obj graph.

    union + distinct = one shuffle; the UNION branch order is irrelevant
    after distinct, matching SQL ``UNION`` semantics exactly.
    """
    e = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """(node, rank) after ``iters`` fixed power iterations.

    Input must be a *symmetrized* distinct edge set (symmetric_edges):
    every node then has out-degree >= 1, so there is no dangling-mass
    term and the update is exactly

        rank'(v) = (1-d)/N + d * sum_{u->v} rank(u) / outdeg(u)

    Fixed iteration count (not convergence detection) keeps the result a
    pure function of the input — the property the DuckDB oracle needs —
    and avoids the driver-blocking convergence checksums that cap the CC
    fixpoint's scaling (kg.connected_components discussion).

    Plan shape per iteration: one co-partitioned join (edge⋈rank, both
    hash-partitioned on src) + one groupBy(dst) shuffle. Lineage is cut
    each iteration with a lazy localCheckpoint so the plan stays O(1)
    deep instead of O(iters).
    """
    e = _materialize(
        edges.select("src", "dst").repartition("src"), eager=False
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg): built once, reused every iteration
    ed = _materialize(e.join(deg, "src"), eager=False)
    nodes = _materialize(
        e.select(F.col("src").alias("id")).distinct(), eager=False
    )
    n = nodes.count()
    if n == 0:
        # empty (or fully filtered) edge set: no nodes, no 1/n — return
        # the empty frame with the output schema instead of raising
        return nodes.select(
            F.col("id").alias("node"), F.lit(0.0).alias("rank")
        )
    rank = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            ed.join(rank, ed.src == rank.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("id")
            .agg(F.sum("w").alias("c"))
        )
        rank = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
        rank = _materialize(rank, eager=False)
    return rank.select(F.col("id").alias("node"), "rank")


def cooccurring_pairs(
    triples: DataFrame, max_per_subj: int = 20
) -> DataFrame:
    """(obj_a, obj_b, n_subj): entity pairs appearing on a common page.

    The relation-discovery primitive (distant supervision / co-mention
    graphs). The cap keeps a hub page from emitting a quadratic pair
    set: only the ``max_per_subj`` lexicographically-smallest objects
    per page pair up — deterministic (objects are distinct per subj, so
    the ordering is total), and the self-join runs co-partitioned on
    subj with at most K(K-1)/2 output pairs per page.
    """
    objs = triples.select("subj", "obj").distinct()
    w = Window.partitionBy("subj").orderBy("obj")
    capped = (
        objs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_subj)
        .select("subj", "obj")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.subj") == F.col("b.subj"),
                F.col("a.obj") < F.col("b.obj"),
            ],
        )
        .select(
            F.col("a.obj").alias("obj_a"), F.col("b.obj").alias("obj_b")
        )
        .groupBy("obj_a", "obj_b")
        .agg(F.count(F.lit(1)).alias("n_subj"))
    )


def _oriented_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Degree-oriented form of an undirected edge set: (deg, oriented).

    ``deg`` = (node, deg) over the deduplicated undirected edges;
    ``oriented`` = (lo, hi) with every edge pointing from its
    lower-(degree, id) endpoint, bounding every node's oriented
    out-degree by O(sqrt(m)).

    ``und`` is MATERIALIZED EAGERLY (the kcore pattern, kg._materialize):
    one job computes the upstream edge plan — the full
    mentions→LSH→CC→triples KG pipeline in q_kg_clustering — exactly
    once, and every downstream reference (degree count, orientation
    join, both wedge sides, the closing-edge join) reads the cut RDD.
    Without the cut Spark re-executed that upstream once per reference
    (VERDICT r6 "What's wrong" #1: 62 s vs 5.6 s for the sibling kcore).
    ``deg``/``oriented`` are deliberately NOT RDD-materialized: they are
    cheap plans over the cut ``und`` whose repeated subtrees Spark
    deduplicates via exchange reuse, and keeping them as logical plans
    preserves the size statistics AQE needs to broadcast the small sides
    (an RDD cut here degraded the downstream joins to sort-merge —
    measured 20.6 s vs 6.4 s warm on the sf0.01 co-occurrence graph).
    """
    und = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("a").alias("node"), "deg"
    )
    # Orientation via TWO WINDOW counts over the symmetrized edges, not
    # degree-groupBy + two edge⋈degree joins (round 8): every edge
    # appears in sym in both directions, so count-over-partitionBy(a)
    # is deg(first endpoint) and count-over-partitionBy(b) is
    # deg(second endpoint); exactly one direction of each edge passes
    # the lower-(deg, id) filter. Same oriented set, but the edge table
    # crosses two exchanges instead of three (and no node-sized join
    # sides to broadcast or sort) — the hot-node skew profile is
    # unchanged: a hub's rows landed on one reducer under the join's
    # hash partitioning too.
    d = sym.withColumn(
        "deg_a", F.count(F.lit(1)).over(Window.partitionBy("a"))
    ).withColumn("deg_b", F.count(F.lit(1)).over(Window.partitionBy("b")))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = d.filter(lower_first).select(
        F.col("a").alias("lo"), F.col("b").alias("hi")
    )
    return deg, oriented


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row (n_triangles,): triangle count of an undirected graph
    given as a symmetric (src, dst) edge set.

    Degree-oriented wedge counting (the MapReduce-classic Cohen/Suri-
    Vassilvitskii shape): orient every edge from its lower-(degree, id)
    endpoint to the higher one, build wedges by self-joining the
    oriented list on the source, and close each wedge with a semi-join
    back against the oriented edges. Orientation bounds every node's
    out-degree by O(sqrt(m)), so the wedge join emits O(m^1.5) rows
    worst-case INDEPENDENT of hub degree — a straight id-orientation
    would emit deg(hub)^2 wedges for a celebrity entity, the classic
    skew blowup. Each triangle is counted exactly once (its unique
    degree-orientation has one source of out-degree 2).

    Every step is a join/groupBy on node keys — no adjacency lists are
    collected anywhere. The shared und/deg/oriented frames are
    materialized in :func:`_oriented_edges` so the upstream edge plan
    executes exactly once.
    """
    _, oriented = _oriented_edges(edges)
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(
        y,
        on=[F.col("x.lo") == F.col("y.lo"), F.col("x.hi") < F.col("y.hi")],
    ).select(F.col("x.hi").alias("u"), F.col("y.hi").alias("v"))
    # close the wedge: (u, v) present as an oriented edge in EITHER
    # orientation (the closing edge's own degree orientation is
    # independent of the wedge's)
    closing = oriented.select(
        F.least("lo", "hi").alias("u"), F.greatest("lo", "hi").alias("v")
    ).distinct()
    tri = wedges.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).join(closing, ["u", "v"], "left_semi")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(
    edges: DataFrame, round_digits: int = 6
) -> DataFrame:
    """(node, deg, n_tri, lcc): local clustering coefficient per node of
    an undirected (src, dst) edge set — the per-entity cohesion profile
    that completes the degrees/PageRank/triangles consumption family
    (lcc = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2).

    Same degree-oriented wedge machinery as :func:`triangle_count` —
    every node's oriented out-degree is O(sqrt(m)), so the wedge join
    is O(m^1.5) independent of hub degree — but the wedge keeps its
    center vertex so each closed triangle can be credited to all three
    corners: one extra 3-row explode per triangle plus one groupBy,
    both triangle-sized, not edge-sized. The shared und/deg/oriented
    frames are materialized in :func:`_oriented_edges` so the upstream
    edge plan executes exactly once.
    """
    deg, oriented = _oriented_edges(edges)
    x = oriented.alias("x")
    y = oriented.alias("y")
    # wedge = (center, u, v) with u < v by id; the center is the unique
    # triangle corner with oriented out-degree 2 into the other two, so
    # each triangle closes exactly once
    wedges = x.join(
        y,
        on=[F.col("x.lo") == F.col("y.lo"), F.col("x.hi") < F.col("y.hi")],
    ).select(
        F.col("x.lo").alias("center"),
        F.col("x.hi").alias("u"),
        F.col("y.hi").alias("v"),
    )
    closing = oriented.select(
        F.least("lo", "hi").alias("u"), F.greatest("lo", "hi").alias("v")
    ).distinct()
    tri = wedges.join(closing, ["u", "v"], "inner")
    # one pass over the triangle set: explode the three corners instead
    # of a 3-branch union, which would re-execute the wedge join per
    # branch (the residual multiplicity after the _oriented_edges cut)
    corners = tri.select(
        F.explode(F.array("center", "u", "v")).alias("node")
    )
    ntri = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    out = deg.join(ntri, "node", "left")
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0)).cast("long")
    lcc = F.when(
        F.col("deg") >= 2,
        F.lit(2.0)
        * n_tri
        / (F.col("deg").cast("double") * (F.col("deg") - 1)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "node",
        "deg",
        n_tri.alias("n_tri"),
        F.round(lcc, round_digits).alias("lcc"),
    )


def pmi_pairs(
    triples: DataFrame, max_per_subj: int = 20, round_digits: int = 6
) -> DataFrame:
    """(obj_a, obj_b, n_ab, pmi, npmi): pointwise mutual information of
    co-occurring entity pairs — the scoring layer over
    :func:`cooccurring_pairs` that turns raw co-mention counts into the
    standard distant-supervision association signal:

      pmi  = ln( (n_ab · N) / (n_a · n_b) )
      npmi = pmi / (−ln(n_ab / N)),  1.0 when the pair is on every page

    where N is the number of pages and n_a/n_b the per-entity page
    counts, all computed over the SAME per-page capped object set as the
    pair counts (marginals consistent with the joint by construction —
    mixing capped pairs with uncapped marginals would push pmi out of
    [−∞, −ln(p(a,b))] and break npmi's [−1, 1] bound).

    Scale shape: the capped self-join is the only pair-sized operation
    (inherited bound: K(K−1)/2 per page); marginals are a map-side-
    combined groupBy on obj; N is a one-row broadcast. The float math is
    a fixed-order closed-form expression mirrored 1:1 in the DuckDB
    oracle, rounded to ``round_digits``.
    """
    objs = triples.select("subj", "obj").distinct()
    w = Window.partitionBy("subj").orderBy("obj")
    capped = _materialize(
        objs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_subj)
        .select("subj", "obj"),
        eager=False,
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.subj") == F.col("b.subj"),
                F.col("a.obj") < F.col("b.obj"),
            ],
        )
        .select(F.col("a.obj").alias("obj_a"), F.col("b.obj").alias("obj_b"))
        .groupBy("obj_a", "obj_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    marg = capped.groupBy("obj").agg(F.count(F.lit(1)).alias("n"))
    npages = capped.agg(
        F.countDistinct("subj").cast("double").alias("np")
    )
    j = (
        pairs.join(
            marg.select(F.col("obj").alias("obj_a"), F.col("n").alias("n_a")),
            "obj_a",
        )
        .join(
            marg.select(F.col("obj").alias("obj_b"), F.col("n").alias("n_b")),
            "obj_b",
        )
        .crossJoin(F.broadcast(npages))
    )
    nab = F.col("n_ab").cast("double")
    ratio = (nab * F.col("np")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    pmi = F.log(ratio)
    npmi = F.when(nab == F.col("np"), F.lit(1.0)).otherwise(
        pmi / (-F.log(nab / F.col("np")))
    )
    return j.select(
        "obj_a",
        "obj_b",
        F.col("n_ab"),
        F.round(pmi, round_digits).alias("pmi"),
        F.round(npmi, round_digits).alias("npmi"),
    )


def neighbor_jaccard(
    edges: DataFrame,
    max_per_node: int = 20,
    min_common: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """(node_a, node_b, n_common, jaccard): structural similarity of
    entity pairs by shared graph context — the entity-resolution scoring
    primitive over an undirected (src, dst) edge set (two canonical
    entities whose neighborhoods overlap heavily are merge candidates
    the surface-form LSH blocking cannot see).

    Semantics (deterministic, oracle-mirrored): each node's neighbor
    list is capped at its ``max_per_node`` id-smallest neighbors; a
    node's PROFILE is the set of centers that list it, n_common(u, v) is
    the number of centers listing both, and

        jaccard = n_common / (|profile(u)| + |profile(v)| − n_common).

    Scale shape: the only pair-producing operation is the capped
    self-join on the center key — at most K(K−1)/2 pairs per center
    regardless of hub degree (the cooccurring_pairs bound); profiles
    are counted with one map-side-combined groupBy and joined back onto
    the pair table by plain node keys. A celebrity entity can be LISTED
    by many centers (a large profile — just a count), but never explodes
    a join. No adjacency list is ever collected.
    """
    und = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).union(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    w = Window.partitionBy("node").orderBy("nbr")
    capped = _materialize(
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_node)
        .select("node", "nbr"),
        eager=False,
    )
    x = capped.alias("x")
    y = capped.alias("y")
    pairs = (
        x.join(
            y,
            on=[
                F.col("x.node") == F.col("y.node"),
                F.col("x.nbr") < F.col("y.nbr"),
            ],
        )
        .select(F.col("x.nbr").alias("u"), F.col("y.nbr").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    rdeg = capped.groupBy("nbr").agg(F.count(F.lit(1)).alias("rd"))
    ra = rdeg.select(F.col("nbr").alias("u"), F.col("rd").alias("rd_a"))
    rb = rdeg.select(F.col("nbr").alias("v"), F.col("rd").alias("rd_b"))
    j = F.col("n_common").cast("double") / (
        F.col("rd_a") + F.col("rd_b") - F.col("n_common")
    ).cast("double")
    return (
        pairs.join(ra, "u")
        .join(rb, "v")
        .select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            "n_common",
            F.round(j, round_digits).alias("jaccard"),
        )
    )


def kcore(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """(node, deg): the k-core of an undirected (src, dst) edge set —
    the maximal subgraph where every node keeps degree >= k — with each
    surviving node's in-core degree. The standard distributed peel:
    drop all nodes under degree k, re-count, repeat to fixpoint.

    Each round is ONE degree groupBy + two semi-joins on node keys (no
    adjacency collection anywhere); the per-round lineage cut /
    convergence checksum follows the connected_components protocol.
    Round count is bounded by the peel depth: dozens on real web/KG
    graphs (degeneracy ordering collapses fast), but THETA(n/2) on the
    adversarial path graph at k=2 — the max_iter guard raises rather
    than silently returning a non-core, since a partial peel OVERSTATES
    the core.
    """
    und = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    cur = und
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # two-window peel round (round 8): symmetrize, attach each
        # endpoint's degree via a window count (every edge appears in
        # both directions, so partitionBy(a) counts deg(a) and
        # partitionBy(b) counts deg(b)), keep the a<b direction of the
        # edges whose BOTH endpoints survive — identical to the old
        # degree-groupBy + two semi-joins, minus one exchange and the
        # node-sized join sides.
        sym = cur.union(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        d = sym.withColumn(
            "deg_a", F.count(F.lit(1)).over(Window.partitionBy("a"))
        ).withColumn("deg_b", F.count(F.lit(1)).over(Window.partitionBy("b")))
        # the round state CARRIES the endpoint degrees: at the fixpoint
        # (no edge dropped) they are by definition the degrees of the
        # final core, so the old post-loop re-count (symmetrize +
        # groupBy over the converged edges) is redundant — the answer
        # reads straight off the last checkpointed round (round 8)
        nxt = d.filter(
            (F.col("deg_a") >= k)
            & (F.col("deg_b") >= k)
            & (F.col("a") < F.col("b"))
        ).select("a", "b", "deg_a", "deg_b")
        nxt = nxt.localCheckpoint(eager=False)
        checksum = _edge_checksum_ab(nxt)
        if checksum == prev_sum:
            converged = True
            cur = nxt
            break
        prev_sum = checksum
        cur = nxt.select("a", "b")
    if not converged:
        raise ValueError(
            f"k-core peel did not converge in {max_iter} rounds"
        )
    return (
        cur.select(F.col("a").alias("node"), F.col("deg_a").alias("deg"))
        .union(
            cur.select(F.col("b").alias("node"), F.col("deg_b").alias("deg"))
        )
        .distinct()
    )


def _edge_support(cur: DataFrame) -> DataFrame:
    """(ea, eb, support): per-edge triangle count over an undirected,
    deduplicated (a, b) a<b edge set — the k-truss round primitive.

    Degree-oriented wedge enumeration (the triangle_count machinery,
    recomputed per peel round because orientation degrees change as
    edges drop): every node's oriented out-degree is O(sqrt(m)), so the
    wedge join emits O(m^1.5) rows independent of hub degree. Each
    triangle found exactly once, then credited to ALL THREE of its edges
    via one explode (never a 3-branch re-join); support is one
    map-side-combined groupBy on edge keys. Only edges in >= 1 triangle
    appear — callers coalesce the rest to 0.
    """
    # two-window orientation — same rewrite as _oriented_edges (round
    # 8): each edge of sym carries deg(first endpoint) from a window
    # over a and deg(second endpoint) from a window over b; one
    # direction survives the lower-(deg, id) filter. Two exchanges per
    # round instead of the degree groupBy + two edge⋈degree joins.
    sym = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
    d = sym.withColumn(
        "deg_a", F.count(F.lit(1)).over(Window.partitionBy("a"))
    ).withColumn("deg_b", F.count(F.lit(1)).over(Window.partitionBy("b")))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = d.filter(lower_first).select(
        F.col("a").alias("lo"), F.col("b").alias("hi")
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(
        y,
        on=[F.col("x.lo") == F.col("y.lo"), F.col("x.hi") < F.col("y.hi")],
    ).select(
        F.col("x.lo").alias("lo"),
        F.col("x.hi").alias("u"),
        F.col("y.hi").alias("v"),
    )
    tris = wedges.join(
        cur.select(F.col("a").alias("u"), F.col("b").alias("v")), ["u", "v"]
    )
    edges3 = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("lo", "u").alias("ea"),
                    F.greatest("lo", "u").alias("eb"),
                ),
                F.struct(
                    F.least("lo", "v").alias("ea"),
                    F.greatest("lo", "v").alias("eb"),
                ),
                F.struct(F.col("u").alias("ea"), F.col("v").alias("eb")),
            )
        ).alias("e")
    ).select("e.ea", "e.eb")
    return edges3.groupBy("ea", "eb").agg(F.count(F.lit(1)).alias("support"))


def truss(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """(node_a, node_b, support): the k-truss of an undirected (src, dst)
    edge set — the maximal subgraph in which every EDGE closes at least
    k−2 triangles — with each surviving edge's in-truss support.

    The edge-cohesion complement of :func:`kcore` (node degree can be
    inflated by a star; triangle support cannot — a k-truss is always
    inside the (k−1)-core but prunes much harder), the standard
    community-core primitive over co-occurrence graphs (Cohen 2008,
    "Trusses: cohesive subgraphs for social network analysis").

    The distributed peel: per round, count each edge's triangle support
    with the degree-oriented wedge machinery (:func:`_edge_support` —
    O(m^1.5) wedge rows regardless of hubs, one explode credits each
    triangle to its three edges), drop edges under k−2, repeat to
    fixpoint. Per-round lineage cut + convergence checksum follow the
    connected_components protocol; like the kcore guard, ``max_iter``
    exhaustion raises rather than overstating the truss (a partial peel
    keeps edges whose support has not yet drained). Support state is
    edge-sized; no adjacency list is ever collected.
    """
    und = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    cur = und
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        sup = _edge_support(cur.select("a", "b"))
        # the round state CARRIES each surviving edge's support: at the
        # fixpoint (no edge dropped) the support computed this round IS
        # the support in the final truss, so the old post-loop
        # _edge_support(cur) — a full extra wedge-enumeration pass over
        # the converged graph — is redundant (round 8)
        nxt = (
            cur.select("a", "b")
            .join(
                sup,
                on=[F.col("a") == F.col("ea"), F.col("b") == F.col("eb")],
                how="left",
            )
            .select(
                "a",
                "b",
                F.coalesce(F.col("support"), F.lit(0)).alias("support"),
            )
            .filter(F.col("support") >= k - 2)
        )
        nxt = nxt.localCheckpoint(eager=False)
        checksum = _edge_checksum_ab(nxt)
        if checksum == prev_sum:
            converged = True
            cur = nxt
            break
        prev_sum = checksum
        cur = nxt
    if not converged:
        raise ValueError(f"k-truss peel did not converge in {max_iter} rounds")
    return cur.select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        "support",
    )


def personalized_pagerank(
    edges: DataFrame,
    n_seeds: int = 2,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank): personalized PageRank — teleportation mass restricted
    to a seed set — after ``iters`` fixed power iterations:

        rank'(v) = (1−d)·tele(v) + d · Σ_{u→v} rank(u) / outdeg(u),
        tele(v) = 1/|S| for v ∈ S else 0.

    The entity-centric relevance score over the KG (random-walk-with-
    restart locality around the seeds) vs global pagerank importance.
    Seeds are the ``n_seeds`` smallest node ids — a deterministic,
    SQL-expressible choice (the q_lsh_ann lowest-ids convention); the
    seed collect is bookkeeping-sized (n_seeds rows). Same plan shape as
    :func:`pagerank`: edges hash-partitioned once and reused, one
    co-partitioned join + one groupBy(dst) shuffle per iteration, rank
    state node-sized, per-iteration lineage cuts. Fixed iteration count
    keeps the result a pure function of the input (the oracle property).
    """
    e = _materialize(
        edges.select("src", "dst").repartition("src"), eager=False
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = _materialize(e.join(deg, "src"), eager=False)
    nodes = _materialize(
        e.select(F.col("src").alias("id")).distinct(), eager=False
    )
    seed_rows = nodes.orderBy("id").limit(n_seeds).collect()
    if not seed_rows:
        return nodes.select(
            F.col("id").alias("node"), F.lit(0.0).alias("rank")
        )
    seeds = [r["id"] for r in seed_rows]
    tele = F.when(F.col("id").isin(seeds), F.lit(1.0 / len(seeds))).otherwise(
        F.lit(0.0)
    )
    rank = nodes.select("id", tele.alias("rank"))
    for _ in range(iters):
        contrib = (
            ed.join(rank, ed.src == rank.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("id")
            .agg(F.sum("w").alias("c"))
        )
        rank = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(1.0 - damping) * tele
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
        rank = _materialize(rank, eager=False)
    return rank.select(F.col("id").alias("node"), "rank")


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, label): synchronous label propagation communities over an
    undirected (src, dst) edge set — the lightweight community detector
    for entity-cluster exploration (coarser than connected components,
    cheaper than modularity methods; Raghavan et al. 2007).

    Deterministic variant (the property the DuckDB oracle needs): labels
    seed as the node id; each of the FIXED ``iters`` synchronous rounds
    re-labels every node with the MODE of its neighbors' labels, ties
    broken by the smallest label. Fixed iteration count — not
    convergence detection — keeps the result a pure function of the
    input (the pagerank discipline; sync LPA can 2-cycle on bipartite
    structures, so a convergence loop would not terminate there anyway).

    Plan shape per round: one co-partitioned edge⋈label join, one
    (node, label) count aggregate, one window top-1 per node — all keyed
    on node ids; label state is node-sized, never edge-sized. Lineage is
    cut per round (lazy localCheckpoint) so the plan stays O(1) deep.
    The edge table is hash-partitioned once and reused every round.
    """
    sym = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct(),
        eager=False,
    )
    adj = _materialize(
        sym.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(sym.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .repartition("nbr"),
        eager=False,
    )
    labels = adj.select(F.col("node").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(iters):
        neigh = adj.join(labels, adj.nbr == labels.id).select(
            "node", "label"
        )
        counts = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("node").alias("id"), "label")
        )
        labels = _materialize(labels, eager=False)
    return labels.select(F.col("id").alias("node"), "label")


def _edge_checksum_ab(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.pmod(F.xxhash64("a", "b"), F.lit(1_000_000_007)).cast(
                    "decimal(38,0)"
                )
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def graph_summary(edges: DataFrame, round_digits: int = 6) -> DataFrame:
    """One row (n_nodes, n_edges, max_deg, avg_deg, density): the graph
    census a KG build emits as run telemetry (the number a curator reads
    before deciding whether the blocking thresholds produced a
    plausible graph — a density jump is the canonical symptom of an
    over-permissive alias threshold).

    Input is any (src, dst) edge set; self-loops and duplicate/reversed
    edges are collapsed first (the und convention shared by every graph
    operator here). Plan: the dedup shuffle + one degree groupBy + one
    global aggregate — node-sized state, single-row output. avg_deg =
    2m/n and density = 2m/(n*(n-1)) are emitted rounded; fixed operand
    order mirrors the DuckDB oracle.
    """
    und = _materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct(),
        eager=False,
    )
    sym = und.select(F.col("a").alias("node")).union(
        und.select(F.col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.max("deg"), F.lit(0)).alias("max_deg"),
        F.coalesce(F.sum("deg"), F.lit(0)).alias("_degsum"),
    )
    n = F.col("n_nodes").cast("double")
    m = (F.col("_degsum") / 2).cast("long")
    # empty-graph guard (round-7 advice): n = 0 (and the impossible-but-
    # cheap n = 1 for density) would divide by zero and emit NaN/NULL,
    # diverging across engines — emit 0.0 instead
    avg_deg = F.when(
        F.col("n_nodes") > 0, F.col("_degsum").cast("double") / n
    ).otherwise(F.lit(0.0))
    density = F.when(
        F.col("n_nodes") > 1,
        F.col("_degsum").cast("double") / (n * (n - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return stats.select(
        "n_nodes",
        m.alias("n_edges"),
        "max_deg",
        F.round(avg_deg, round_digits).alias("avg_deg"),
        F.round(density, round_digits).alias("density"),
    )
