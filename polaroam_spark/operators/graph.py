"""Distributed connected components: alternating large-star /
small-star (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014).

This is the shared graph primitive behind
:func:`polaroam_spark.operators.dedup.duplicate_components`
(transitive closure of near-duplicate pairs) and
:func:`polaroam_spark.operators.clustering.cluster_stops_dbscan_distributed`
(components of the ε-neighbor graph — reference DBSCAN semantics at
``min_samples=2``, reference utils.py:221-258 clusters stops with
sklearn DBSCAN per user; this path is the cluster-scale equivalent).

Why star-contraction instead of min-label propagation: propagation
moves the minimum label ONE hop per round, so a duplicate chain of
length d (common in boilerplate-heavy web corpora: doc A ~ B ~ C ...)
needs d rounds — at 100 TB a >50-hop chain is a real input, and a
fixed iteration cap either silently splits a component or hard-fails.
Large-star/small-star contracts whole star neighborhoods per round and
converges in O(log^2 n) rounds worst-case (O(log n) observed), with
the same shuffle primitives (groupBy-min + equi-join) per round.

Round shape (each round = 2 shuffles on the node id + a scalar
fixed-point check):

- ``large_star``:  for every node u, m = min(Γ(u) ∪ {u}); re-link each
  strictly LARGER neighbor v > u to m.  Keeps (v, m) edges only.
- ``small_star``:  orient edges to (u, v) with u > v; m = min(Γ(u) ∪
  {u}); link u and each of its (smaller) neighbors to m.

The fixed point is a star forest: every edge is (node, component-min).
Convergence is detected with an order-independent edge-set digest
(count + sum of per-edge xxhash64), one tiny scalar aggregate per
round — no driver-side edge materialization at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from polaroam_spark.session import materialize, release

__all__ = [
    "connected_components",
    "pagerank",
    "triangle_count",
    "clustering_coefficient",
    "k_core",
]


def _symmetrize(edges: DataFrame, keys: list[str]) -> DataFrame:
    fwd = edges.select(*keys, "u", "v")
    rev = edges.select(*keys, F.col("v").alias("u"), F.col("u").alias("v"))
    return fwd.unionByName(rev)


def _large_star(edges: DataFrame, keys: list[str]) -> DataFrame:
    """(u,v) undirected -> for each u: m = min(N(u) ∪ {u}); emit (v, m)
    for v > u.  One shuffle (groupBy u) + one equi-join on u."""
    nbrs = _symmetrize(edges, keys)
    m = (
        nbrs.groupBy(*keys, "u")
        .agg(F.min("v").alias("_min_nbr"))
        .withColumn("_m", F.least(F.col("u"), F.col("_min_nbr")))
        .select(*keys, "u", "_m")
    )
    return (
        nbrs.join(m, on=[*keys, "u"])
        .filter(F.col("v") > F.col("u"))
        .select(*keys, F.col("v").alias("u"), F.col("_m").alias("v"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame, keys: list[str]) -> DataFrame:
    """Orient (u,v) with u > v; m = min(N(u) ∪ {u}) = min smaller
    neighbor; emit (x, m) for x ∈ N(u) ∪ {u}, x != m."""
    oriented = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            *keys,
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
    )
    m = (
        oriented.groupBy(*keys, "u")
        .agg(F.min("v").alias("_m"))
        .select(*keys, "u", "_m")
    )
    relink = (
        oriented.join(m, on=[*keys, "u"])
        .filter(F.col("v") != F.col("_m"))
        .select(*keys, F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    self_link = m.select(*keys, "u", F.col("_m").alias("v"))
    return relink.unionByName(self_link).dropDuplicates()


def _digest(edges: DataFrame, keys: list[str]) -> tuple:
    """Order-independent digest of the edge set: (count, sum of
    per-edge hashes).  One scalar aggregate — safe at any scale.

    Collision assumption: two DIFFERENT same-size edge sets colliding
    on the hash sum would end the loop early and emit wrong components
    silently. The probability is ~2^-64 per round (a sum of xxhash64
    values over sets that differ in ≥1 edge), i.e. negligible against
    hardware-error rates; accepted in exchange for keeping the
    fixed-point check a single tiny scalar aggregate. Note the loop
    only compares CONSECUTIVE rounds, so a collision must happen on
    one specific pair, not birthday-style across all rounds."""
    cols = [F.col(c).cast("string") for c in (*keys, "u", "v")]
    # decimal sum: immune to ANSI long-overflow on summed 64-bit hashes
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    key_cols: list[str] | None = None,
    max_rounds: int = 30,
    _rounds_out: list | None = None,
) -> DataFrame:
    """Connected components of the undirected graph given as a pair
    table.  Returns ``[*key_cols,] node, component`` where component is
    the MINIMUM node id in each component; every node appearing in
    ``pairs`` gets a row (isolated nodes never enter a pair table — the
    caller left-joins and coalesces to self for those). Rows with a
    null node id or null key value are ignored (equi-join semantics:
    null is not a node).

    ``key_cols`` partitions the graph into independent sub-graphs (the
    per-``uid`` ε-graphs of distributed DBSCAN); components never span
    key values.  Node ids must be orderable (long / string).

    ``max_rounds`` bounds large+small star rounds; each round at least
    halves the height of any component tree, so 30 rounds covers
    components of ~2^30 nodes — hitting the bound indicates a logic
    error, not a long chain, hence the hard raise.

    Storage lifetime: each round checkpoints the contracted edge set
    (session.materialize — localCheckpoint, or a reliable checkpoint
    when a checkpoint dir is configured). A round's storage is freed
    explicitly via ``session.release`` as soon as the next round
    lands: localCheckpoint blocks are unpersisted eagerly, and
    reliable checkpoint FILES are deleted (Spark itself never deletes
    them unless ``spark.cleaner.referenceTracking.cleanCheckpoints``
    is set, which defaults to false — without the explicit release a
    22-round run would leave 22 edge-set snapshots in object storage).
    Only the final star forest and the base pair table stay live,
    referenced by the returned (lazy) label frame.
    """
    keys = list(key_cols or [])
    # Checkpoint the deduped pair table ONCE, then derive both the
    # edge set and the node set from it — deriving either from the
    # lazy input would re-run the caller's entire pair-generation
    # pipeline (e.g. the full inverted-index join + Jaccard verify of
    # ngram_jaccard_pairs) once per consumer. Self-loop-only nodes
    # keep an output row (component = self).
    #
    # Null node ids / null key values are DROPPED up front with
    # standard equi-join semantics (null is not a node). Without the
    # filter they would silently corrupt the result instead: groupBy
    # keeps a null group but the per-round equi-joins drop it, so a
    # null-keyed sub-graph's edges vanish after round 1 and its nodes
    # come back as fake singletons.
    not_null = F.col("u").isNotNull() & F.col("v").isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    base = materialize(
        pairs.select(
            *keys, F.col(src).alias("u"), F.col(dst).alias("v")
        )
        .filter(not_null)
        .dropDuplicates()
    )
    edges = base.filter(F.col("u") != F.col("v"))
    nodes = (
        _symmetrize(base, keys)
        .select(*keys, F.col("u").alias("node"))
        .dropDuplicates()
    )
    prev = _digest(edges, keys)
    rounds = 0
    converged = prev[0] == 0
    superseded = None  # round N's checkpoint, freed once N+1 lands
    while not converged and rounds < max_rounds:
        edges = materialize(_small_star(_large_star(edges, keys), keys))
        if superseded is not None:
            release(superseded)
        superseded = edges
        rounds += 1
        cur = _digest(edges, keys)
        if cur == prev:
            converged = True
        prev = cur
    if _rounds_out is not None:
        _rounds_out.append(rounds)
    if not converged:
        raise RuntimeError(
            f"large-star/small-star did not reach a fixed point in "
            f"{max_rounds} rounds — components of up to 2^{max_rounds} "
            "nodes converge well inside that; this indicates a bug, "
            "not a long chain"
        )

    # Fixed point is a star forest: every edge is (member, root).
    labels = edges.select(
        *keys, F.col("u").alias("node"), F.col("v").alias("component")
    )
    out = (
        nodes.join(labels, on=[*keys, "node"], how="left")
        .select(
            *keys,
            "node",
            F.coalesce("component", "node").alias("component"),
        )
    )
    return out


def pagerank(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping: float = 0.85,
    num_iters: int = 15,
    checkpoint_every: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank by power iteration over a directed pair table —
    ``[node, rank]`` with ranks summing to 1. The authority measure a
    corpus pipeline uses to weight link-graph quality (a la
    Common-Crawl host ranking) and the second iterative-graph
    primitive beside :func:`connected_components`.

    Semantics (standard): uniform init 1/n; per step
    ``rank'(v) = (1-d)/n + d * (Σ_{u→v} rank(u)/outdeg(u) + m/n)``
    where ``m`` is the mass on dangling nodes (no out-edges),
    redistributed uniformly. Duplicate and self-loop edges are kept
    as-is after dropDuplicates (a self-loop is a legitimate out-link
    to self); null endpoints are dropped (equi-join semantics, as in
    connected_components). With ``weight_col``, a source's mass
    splits proportionally to edge weight (duplicate (u,v) edges sum
    their weights; non-positive or NULL weights are dropped — a
    zero-weight out-edge is no out-edge, and negative mass has no
    PageRank semantics).

    Shape per iteration: one equi-join of ranks to edges on ``src``
    (shuffle keyed by node), one groupBy ``dst`` sum (second
    shuffle), and a broadcast 1-row crossJoin carrying the dangling
    mass — NO driver-side collect anywhere in the loop; the only
    driver scalar is the one-time node count. Fixed ``num_iters``
    (not a convergence test): float fixed points are never exact and
    a deterministic iteration count is what the certification gate
    and cross-run reproducibility need. Lineage is truncated every
    ``checkpoint_every`` iterations via session.materialize, with the
    superseded checkpoint released eagerly (same storage-lifetime
    contract as connected_components — no snapshot accumulation).

    100 TB posture: cost is num_iters × (2 shuffles over the edge
    list). Hot destination nodes (everyone links to the hub) are
    handled by the map-side-combined sum — contributions partial-
    aggregate before the shuffle, so a 100M-in-degree node receives
    one partial per task, not 100M rows.
    """
    not_null = F.col("u").isNotNull() & F.col("v").isNotNull()
    if weight_col is None:
        edges0 = (
            pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .filter(not_null)
            .dropDuplicates()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        edges0 = (
            pairs.select(
                F.col(src).alias("u"),
                F.col(dst).alias("v"),
                F.col(weight_col).cast("double").alias("_w"),
            )
            # ~isnan too: Spark orders NaN ABOVE every number, so a
            # bare `> 0` admits NaN weights, which would turn every
            # rank NaN after one iteration
            .filter(
                not_null & (F.col("_w") > 0) & ~F.isnan(F.col("_w"))
            )
            .groupBy("u", "v")
            .agg(F.sum("_w").alias("_w"))
        )
    base = materialize(edges0)
    nodes = (
        base.select(F.col("u").alias("node"))
        .unionByName(base.select(F.col("v").alias("node")))
        .dropDuplicates()
    )
    n = nodes.count()
    if n == 0:
        # free the (empty) edge checkpoint on this path too — the
        # normal-path release(base) below is never reached
        empty = nodes.withColumn("rank", F.lit(0.0))
        release(base)
        return empty
    out_deg = base.groupBy(F.col("u").alias("node")).agg(
        F.sum("_w").alias("_deg")
    )
    # degree joined once: dangling nodes carry _deg NULL
    ranked = nodes.join(out_deg, on="node", how="left").withColumn(
        "rank", F.lit(1.0 / n)
    )
    ranked = materialize(ranked)
    teleport = (1.0 - damping) / n
    superseded = ranked
    for it in range(num_iters):
        contrib = (
            base.join(
                ranked.filter(F.col("_deg").isNotNull()).select(
                    F.col("node").alias("u"),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                on="u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("_share") * F.col("_w")).alias("_in"))
        )
        dangling = ranked.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_m")
        )
        ranked = (
            ranked.select("node", "_deg")
            .join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_m") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == num_iters - 1:
            ranked = materialize(ranked)
            release(superseded)
            superseded = ranked
    # the final rank frame is checkpointed, so the edge table is no
    # longer referenced — free it rather than waiting for GC
    release(base)
    return ranked.select("node", "rank")


def triangle_count(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    with_degree: bool = False,
) -> DataFrame:
    """Exact per-node triangle counts over an undirected graph given
    as a pair table — ``[node, n_triangles]``, one row per node of
    the canonical edge set (isolated-by-dedup nodes included with
    0). The clustering-coefficient numerator, and the third batch
    graph primitive beside :func:`connected_components` and
    :func:`pagerank` (spam-farm and community-density signals in a
    link-quality pipeline).

    Edge canonicalization: self-loops dropped, direction erased via
    ``least/greatest``, duplicates removed — triangles are counted
    on the simple undirected graph.

    Algorithm: degree-ordered orientation (Cohen's MapReduce
    triangle counting / the "compact-forward" order). Every edge is
    oriented from its lower-(degree, node) endpoint to the higher
    one; wedges are generated by self-joining oriented edges on the
    shared LOW endpoint, and a wedge (a→b, a→c) with rank(b) <
    rank(c) closes iff oriented edge b→c exists (one equi-join
    probe). Each triangle is produced exactly once, at its
    lowest-rank vertex.

    Why this survives 100 TB: naive wedge generation explodes at hub
    nodes (a degree-d node makes d²/2 wedges). Ordering by degree
    caps every node's OUT-degree at O(sqrt(m)), so total wedges are
    O(m^1.5) — the provably optimal join-based bound — regardless of
    skew; a 10^7-degree hub contributes wedges only through its (few)
    higher-degree neighbors. All steps are shuffle equi-joins and
    hash aggregates on node keys; no driver-side state, no iteration.
    """
    e = pairs.filter(
        F.col(src).isNotNull()
        & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    ).select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    und = e.select(
        F.least("_a", "_b").alias("_u"),
        F.greatest("_a", "_b").alias("_v"),
    ).distinct()
    deg = (
        und.select(F.explode(F.array("_u", "_v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # total order that breaks degree ties by node id — struct
    # comparison gives lexicographic (degree, node)
    du = deg.select(
        F.col("node").alias("_u"),
        F.struct(F.col("_deg"), F.col("node")).alias("_ru"),
    )
    dv = deg.select(
        F.col("node").alias("_v"),
        F.struct(F.col("_deg"), F.col("node")).alias("_rv"),
    )
    ranked = und.join(du, "_u").join(dv, "_v")
    lo_first = F.col("_ru") < F.col("_rv")
    oriented = ranked.select(
        F.when(lo_first, F.col("_u")).otherwise(F.col("_v")).alias("_lo"),
        F.when(lo_first, F.col("_v")).otherwise(F.col("_u")).alias("_hi"),
        F.when(lo_first, F.col("_rv")).otherwise(F.col("_ru")).alias("_rhi"),
    )
    wedges = (
        oriented.alias("x")
        .join(oriented.alias("y"), F.col("x._lo") == F.col("y._lo"))
        .filter(F.col("x._rhi") < F.col("y._rhi"))
        .select(
            F.col("x._lo").alias("_t1"),
            F.col("x._hi").alias("_t2"),
            F.col("y._hi").alias("_t3"),
        )
    )
    closing = oriented.select(
        F.col("_lo").alias("_t2"), F.col("_hi").alias("_t3")
    )
    tris = wedges.join(closing, ["_t2", "_t3"], "left_semi")
    per_node = (
        tris.select(
            F.explode(F.array("_t1", "_t2", "_t3")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    extra = [F.col("_deg").cast("bigint").alias("degree")] if with_degree else []
    return deg.join(per_node, "node", "left").select(
        "node",
        *extra,
        F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")).alias(
            "n_triangles"
        ),
    )


def clustering_coefficient(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Local clustering coefficient per node —
    ``[node, degree, n_triangles, lcc]`` where
    ``lcc = 2·T / (d·(d−1))`` on the simple undirected graph (0.0
    for degree-<2 nodes, whose neighborhood has no possible edge).
    The density signal on top of :func:`triangle_count`: link farms
    score near 1 (everyone links everyone), broadcast hubs near 0 —
    a spam/community feature in link-graph curation.

    Same plan as :func:`triangle_count` (the degree table it already
    builds rides along); the ratio is a row-local expression of two
    exact integers, so any engine reproduces the double bit-for-bit.
    """
    t = triangle_count(pairs, src, dst, with_degree=True)
    return t.select(
        "node",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            (F.lit(2) * F.col("n_triangles"))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def k_core(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    k: int = 2,
    max_rounds: int = 60,
    chain_collapse_after: int = 4,
) -> DataFrame:
    """The ``k``-core of an undirected graph — ``[node,
    core_degree]`` for every node of the maximal subgraph in which
    every node has degree ≥ k (Seidman 1983; standard peeling). The
    cohesion filter of link-graph curation: spam rings and genuine
    communities live in deep cores, drive-by link noise peels away.

    Peeling is inherently iterative (each removal can drop a
    neighbor below k), and plain round-per-cascade-hop peeling is
    O(n) rounds on adversarial chains: a path at k=2 loses only its
    two endpoints per round. After ``chain_collapse_after`` plain
    rounds the loop therefore switches on a **fragile-chain
    collapse**: cascades propagate exclusively through nodes whose
    CURRENT degree is exactly ``k`` (losing one neighbor drops them
    below ``k``), and if any node of a connected set of such
    "fragile" nodes peels, the whole set provably peels — each
    removal pushes its fragile neighbors below ``k``, and adjacency
    between fragile nodes is exactly what the induced components
    capture. So a collapse round removes, besides every node below
    ``k``, every connected component of the fragile-induced subgraph
    (components via :func:`connected_components`, O(log n) star
    rounds) that touches a removed node. Since the k-core is unique
    and peel-order-independent, this removes exactly what sequential
    peeling would; a 100k-node path converges in two outer rounds
    instead of 50k. Cascades through nodes of degree > k still cost
    one round per hop, so ``max_rounds`` stays as a loud guard —
    it fails HARD rather than silently returning a not-yet-core
    subgraph. Degenerate inputs (everything peels) return an empty
    frame.

    100 TB posture: state is the shrinking adjacency list, partitioned
    by node; no driver-side materialization — the per-round scalar is
    the below-``k`` count. A plain round costs one degree aggregate +
    two anti-joins on the REMAINING edges (a shrinking set); collapse
    rounds add a components run over the fragile-induced subgraph
    only, and fire only once plain peeling has had
    ``chain_collapse_after`` rounds to finish the typical case.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = pairs.filter(
        F.col(src).isNotNull()
        & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    ).select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    und = e.select(
        F.least("_a", "_b").alias("u"), F.greatest("_a", "_b").alias("v")
    ).distinct()
    # symmetric adjacency (each undirected edge stored both ways) so
    # degree is a single groupBy on one column
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = materialize(adj)
    superseded = adj
    for rnd in range(int(max_rounds)):
        deg = adj.groupBy("u").agg(F.count("*").alias("_d"))
        if rnd >= int(chain_collapse_after):
            deg = materialize(deg)  # reused 3x below in collapse mode
        below = deg.filter(F.col("_d") < int(k)).select("u")
        if below.limit(1).count() == 0:
            # materialize the result BEFORE releasing what it is
            # built from, then free the final adjacency snapshot and
            # (in collapse rounds) the reused degree frame — without
            # this every converged call leaked both for the session
            out = materialize(
                deg.select(
                    F.col("u").alias("node"),
                    F.col("_d").cast("bigint").alias("core_degree"),
                )
            )
            if rnd >= int(chain_collapse_after):
                release(deg)
            release(superseded)
            return out
        remove = below
        if rnd >= int(chain_collapse_after):
            # Fragile-chain collapse. frag = nodes at exactly k;
            # components of the frag-induced subgraph; a component
            # adjacent to any removed node peels entirely.
            frag = deg.filter(F.col("_d") == int(k)).select("u")
            fe = (
                adj.join(frag, "u", "left_semi")
                .join(frag.select(F.col("u").alias("v")), "v", "left_semi")
                .select("u", "v")
            )
            comps = connected_components(fe, "u", "v")
            labels = frag.join(
                comps.select(F.col("node").alias("u"), "component"),
                "u",
                "left",
            ).select("u", F.coalesce("component", "u").alias("component"))
            trig = (
                adj.join(below.select(F.col("u").alias("v")), "v", "left_semi")
                .select("u")
                .join(frag, "u", "left_semi")
            )
            doomed_c = (
                labels.join(trig, "u", "left_semi")
                .select("component")
                .distinct()
            )
            doomed = labels.join(doomed_c, "component", "left_semi").select(
                "u"
            )
            remove = below.unionByName(doomed).distinct()
        nxt = adj.join(remove, on="u", how="left_anti").join(
            remove.select(F.col("u").alias("v")), on="v", how="left_anti"
        )
        nxt = materialize(nxt.select("u", "v"))
        release(superseded)
        if rnd >= int(chain_collapse_after):
            release(deg)
        adj, superseded = nxt, nxt
    raise RuntimeError(
        f"k_core did not converge within max_rounds={max_rounds}; "
        "a cascade is still travelling through nodes of degree > k "
        "one hop per round — raise max_rounds"
    )
