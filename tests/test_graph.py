"""Tests for the shared large-star/small-star connected-components
primitive (operators/graph.py) — the transitive-closure engine behind
duplicate_components and distributed DBSCAN."""

import pytest

from pyspark.sql import functions as F

from polaroam_spark.operators.graph import connected_components


def test_path_graph_converges_logarithmically(spark):
    # A 200-node path is the adversarial case for min-label
    # propagation (needs ~199 hops); star contraction must close it
    # in O(log n) rounds.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "u long, v long"
    )
    rounds = []
    labels = connected_components(pairs, _rounds_out=rounds)
    rows = {r.node: r.component for r in labels.collect()}
    assert rows == {i: 0 for i in range(200)}
    # ~log2(200) ≈ 8 productive rounds + 1 round that confirms the
    # fixed point (digest unchanged). Min-label propagation needs 199.
    assert rounds[0] <= 9, f"took {rounds[0]} rounds on a 200-node path"


def test_multiple_components_and_id_gaps(spark):
    pairs = spark.createDataFrame(
        [(10, 2), (2, 30), (5, 7), (100, 100)], "u long, v long"
    )
    labels = connected_components(pairs)
    rows = {r.node: r.component for r in labels.collect()}
    # a self-loop-only node is its own singleton component
    assert rows == {2: 2, 10: 2, 30: 2, 5: 5, 7: 5, 100: 100}


def test_keyed_components_never_span_keys(spark):
    # same node ids in two uid groups: components must stay per-key
    pairs = spark.createDataFrame(
        [("a", 1, 2), ("a", 2, 3), ("b", 2, 9)],
        "uid string, u long, v long",
    )
    labels = connected_components(pairs, key_cols=["uid"])
    rows = {(r.uid, r.node): r.component for r in labels.collect()}
    assert rows == {
        ("a", 1): 1, ("a", 2): 1, ("a", 3): 1,
        ("b", 2): 2, ("b", 9): 2,
    }


def test_string_node_ids(spark):
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC")], "u string, v string"
    )
    labels = connected_components(pairs)
    rows = {r.node: r.component for r in labels.collect()}
    assert rows == {"docA": "docA", "docB": "docA", "docC": "docA"}


def test_empty_edge_set(spark):
    pairs = spark.createDataFrame([], "u long, v long")
    assert connected_components(pairs).count() == 0


@pytest.mark.slow
def test_random_graph_matches_bruteforce(spark):
    import random

    rng = random.Random(42)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    # union-find oracle
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    touched = {x for e in edges for x in e}
    for x in touched:
        r = find(x)
        # canonical min id per component
        expected.setdefault(r, set()).add(x)
    want = {}
    for members in expected.values():
        m = min(members)
        for x in members:
            want[x] = m

    pairs = spark.createDataFrame(edges, "u long, v long")
    rows = {r.node: r.component for r in connected_components(pairs).collect()}
    assert rows == want


@pytest.mark.slow
def test_reliable_checkpoint_rounds_are_deleted(spark, tmp_path):
    """With a checkpoint dir configured, superseded round snapshots
    must be DELETED (Spark never cleans reliable checkpoint files by
    default); only the base pair table and the final star forest —
    both referenced by the returned lazy frame — may remain."""
    import os

    sc = spark.sparkContext
    ckdir = str(tmp_path / "cc_ck")
    sc.setCheckpointDir(ckdir)
    try:
        # path graph of 40 nodes -> several contraction rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(39)], "u long, v long"
        )
        rounds = []
        labels = connected_components(pairs, _rounds_out=rounds)
        rows = {r.node: r.component for r in labels.collect()}
        assert rows == {i: 0 for i in range(40)}
        assert rounds[0] >= 2  # multiple rounds => something to free
        rdd_dirs = [
            d
            for root, dirs, _ in os.walk(ckdir)
            for d in dirs
            if d.startswith("rdd-")
        ]
        # base + final round only; every superseded round freed
        assert len(rdd_dirs) == 2, rdd_dirs
        # the returned frame must still be collectable after cleanup
        assert len(labels.collect()) == 40
    finally:
        sc.setCheckpointDir(None)


def test_connected_components_null_keys_and_ids_ignored(spark):
    from polaroam_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [
            (None, 1, 2),   # null key: dropped (null is not a key)
            ("k", 1, 2),
            ("k", None, 3),  # null node id: dropped
            ("k", 2, 4),
        ],
        "uid string, u long, v long",
    )
    out = connected_components(pairs, key_cols=["uid"]).collect()
    # only the two valid k-edges survive: {1,2,4} one component;
    # no phantom singletons from the null-key edge
    assert all(r.uid == "k" for r in out)
    comp = {r.node: r.component for r in out}
    assert comp == {1: 1, 2: 1, 4: 1}


def _np_pagerank(edges, n, d=0.85, iters=15):
    import numpy as np

    deg = np.zeros(n)
    for u, v in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        m = r[deg == 0].sum()
        nxt += d * m / n
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    return r


@pytest.mark.slow
def test_pagerank_matches_numpy_power_iteration(spark):
    from polaroam_spark.operators.graph import pagerank

    edges = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4),  # cycle + tail
        (5, 0), (5, 2),                          # feeder
        # 4 and 6: dangling (6 only appears as dst)
        (1, 6),
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r["rank"] for r in pagerank(df, num_iters=15).collect()}
    want = _np_pagerank(edges, 7)
    assert set(got) == set(range(7))
    for i in range(7):
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.slow
def test_pagerank_star_graph_hub_dominates(spark):
    from polaroam_spark.operators.graph import pagerank

    # 20 leaves all pointing at the hub; hub dangling
    edges = [(i, 100) for i in range(20)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r["rank"] for r in pagerank(df, num_iters=20).collect()}
    hub = got[100]
    leaf = got[0]
    assert hub > 10 * leaf
    # leaves are symmetric: identical ranks
    assert all(abs(got[i] - leaf) < 1e-12 for i in range(20))
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_null_edges_and_duplicates(spark):
    from polaroam_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0), (None, 3), (3, None)],
        "u long, v long",
    )
    got = {r.node: r["rank"] for r in pagerank(df, num_iters=10).collect()}
    # null endpoints dropped entirely: only 0 and 1 are nodes
    assert set(got) == {0, 1}
    assert abs(got[0] - 0.5) < 1e-9 and abs(got[1] - 0.5) < 1e-9


def test_pagerank_weighted_matches_numpy(spark):
    import numpy as np

    from polaroam_spark.operators.graph import pagerank

    # weighted edges incl. a duplicate (0,1) that must sum, a
    # zero-weight edge that must drop, and dangling node 3
    edges = [
        (0, 1, 2.0), (0, 1, 1.0), (0, 2, 1.0),
        (1, 2, 5.0), (2, 0, 1.0), (2, 3, 1.0),
        (1, 3, 0.0),  # dropped
    ]
    df = spark.createDataFrame(edges, "u long, v long, w double")
    got = {
        r.node: r["rank"]
        for r in pagerank(df, num_iters=12, weight_col="w").collect()
    }

    d, n = 0.85, 4
    W = np.zeros((n, n))
    W[0, 1] = 3.0
    W[0, 2] = 1.0
    W[1, 2] = 5.0
    W[2, 0] = 1.0
    W[2, 3] = 1.0
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        nxt = np.full(n, (1 - d) / n) + d * r[out == 0].sum() / n
        for u in range(n):
            if out[u] > 0:
                for v in range(n):
                    if W[u, v] > 0:
                        nxt[v] += d * r[u] * W[u, v] / out[u]
        r = nxt
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # node 1 gets 3/4 of node 0's mass, node 2 only 1/4 of it
    assert got[1] > got[0]


def test_pagerank_nan_weight_dropped(spark):
    from polaroam_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (0, 1, float("nan"))],
        "u long, v long, w double",
    )
    got = {
        r.node: r["rank"]
        for r in pagerank(df, num_iters=5, weight_col="w").collect()
    }
    # NaN edge dropped: symmetric 2-cycle -> equal finite ranks
    assert abs(got[0] - 0.5) < 1e-9 and abs(got[1] - 0.5) < 1e-9


# --------------------------------------------------------- triangle_count
def test_triangle_count_known_graph(spark):
    from polaroam_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    # node 5 attached to 1 (in no triangle)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((1, 5))
    df = spark.createDataFrame(edges, "u int, v int")
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_canonicalization(spark):
    from polaroam_spark.operators.graph import triangle_count

    # duplicates, reversed direction, self-loops must not change the
    # simple-graph triangle count
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1), (2, 2), (1, 2)],
        "u int, v int",
    )
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_count_matches_numpy_on_random_graph(spark):
    import numpy as np

    from polaroam_spark.operators.graph import triangle_count

    rng = np.random.default_rng(7)
    n = 40
    adj = np.triu((rng.random((n, n)) < 0.25).astype(np.int64), 1)
    adj = adj + adj.T
    expected = np.diag(np.linalg.matrix_power(adj, 3)) // 2
    ui, vi = np.nonzero(np.triu(adj, 1))
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(ui, vi)], "u int, v int"
    )
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    for node in range(n):
        if adj[node].sum() == 0:
            assert node not in out  # isolated: not in the edge set
        else:
            assert out[node] == int(expected[node]), node


def test_triangle_count_string_nodes_and_nulls(spark):
    from polaroam_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x"), (None, "x"), ("y", None)],
        "u string, v string",
    )
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {"x": 1, "y": 1, "z": 1}


def test_clustering_coefficient_known_values(spark):
    from polaroam_spark.operators.graph import clustering_coefficient

    # K4 plus a pendant: K4 members have lcc 1.0 except node 1, whose
    # 4th neighbor (the pendant 5) connects to nobody else:
    # d=4, T=3 -> 2*3/(4*3) = 0.5; pendant d=1 -> 0.0
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((1, 5))
    df = spark.createDataFrame(edges, "u int, v int")
    out = {r.node: r for r in clustering_coefficient(df).collect()}
    assert out[1].degree == 4 and abs(out[1].lcc - 0.5) < 1e-15
    for n in (2, 3, 4):
        assert out[n].degree == 3 and abs(out[n].lcc - 1.0) < 1e-15
    assert out[5].degree == 1 and out[5].lcc == 0.0


# ----------------------------------------------------------------- k_core
def _py_k_core(edges, k):
    """Reference peeling in plain Python."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_k_core_peels_pendant_tree(spark):
    from polaroam_spark.operators.graph import k_core

    # triangle {1,2,3} with a pendant chain 3-4-5: k=2 keeps only the
    # triangle (4 then 5 peel in successive rounds)
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "u int, v int"
    )
    out = {r.node: r.core_degree for r in k_core(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_differential_random(spark):
    import numpy as np

    from polaroam_spark.operators.graph import k_core

    rng = np.random.default_rng(11)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2)) if a < b}
    df = spark.createDataFrame(sorted(edges), "u int, v int")
    for k in (2, 3, 5):
        expected = _py_k_core(edges, k)
        got = {r.node: r.core_degree for r in k_core(df, k=k).collect()}
        assert got == expected, k


def test_k_core_empty_and_bounds(spark):
    import pytest

    from polaroam_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2), (2, 3)], "u int, v int")
    assert k_core(df, k=2).count() == 0  # a path has no 2-core
    with pytest.raises(ValueError):
        k_core(df, k=0)
    # a long path at k=2 peels two endpoints per round: max_rounds=1
    # cannot converge -> hard error, never a silent partial core
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "u int, v int"
    )
    with pytest.raises(RuntimeError):
        k_core(chain, k=2, max_rounds=1)


@pytest.mark.slow
def test_k_core_chain_collapse_differential(spark):
    """The fragile-chain collapse path (chain_collapse_after=0 forces
    it on EVERY round) must reproduce plain peeling exactly — the
    collapse removes whole components of degree-exactly-k nodes, and
    k-core uniqueness says that's the same fixpoint."""
    import numpy as np

    from polaroam_spark.operators.graph import k_core

    rng = np.random.default_rng(23)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2)) if a < b}
    df = spark.createDataFrame(sorted(edges), "u int, v int")
    for k in (2, 3):
        expected = _py_k_core(edges, k)
        got = {
            r.node: r.core_degree
            for r in k_core(df, k=k, chain_collapse_after=0).collect()
        }
        assert got == expected, k


@pytest.mark.slow
def test_k_core_long_chain_converges_via_collapse(spark):
    """A path graph peels O(n) rounds under plain peeling (the
    round-5..7 carried scale-killer); the collapse must finish it
    within default max_rounds, and must NOT touch a welded clique."""
    from polaroam_spark.operators.graph import k_core

    n = 3000
    path = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(path, "u int, v int")
    assert k_core(df, k=2).count() == 0

    clique = [
        (10_000 + a, 10_000 + b) for a in range(12) for b in range(a + 1, 12)
    ]
    weld = spark.createDataFrame(
        path + clique + [(0, 10_000)], "u int, v int"
    )
    out = {r.node: r.core_degree for r in k_core(weld, k=2).collect()}
    assert set(out) == {10_000 + i for i in range(12)}
    assert all(d == 11 for d in out.values())
