"""PageRank (operators/graph.py): exact parity with a NumPy power
iteration on the same graph (same damping, iterations, and
dangling-mass fold-back), probability-mass conservation, dangling and
parallel-edge semantics, and validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.graph import pagerank


def _np_pagerank(edge_list, damping, iterations):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edge_list:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for u, v in edge_list:
            contrib[idx[v]] += r[idx[u]] / deg[idx[u]]
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    # 5 nodes incl. a dangling node 'e' (no out-edges) and a hub 'a'
    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("d", "c"), ("b", "e"),
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, damping=0.85, iterations=20).collect()
    }
    want = _np_pagerank(edge_list, 0.85, 20)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    # dangling fold-back conserves probability mass
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # the hub pointed to by everyone outranks the leaf
    assert got["c"] > got["e"]


def test_pagerank_parallel_edges_weight_contributions(spark):
    # b->c twice: with multiplicity semantics c receives 2/3 of b's rank
    # per step — strictly more than with the deduped graph
    multi = [("a", "b"), ("b", "c"), ("b", "c"), ("b", "a"), ("c", "a")]
    dedup = [("a", "b"), ("b", "c"), ("b", "a"), ("c", "a")]
    rm = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(multi, "src string, dst string"),
            iterations=10,
        ).collect()
    }
    rd = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(dedup, "src string, dst string"),
            iterations=10,
        ).collect()
    }
    assert rm["c"] > rd["c"]
    assert rm["c"] == pytest.approx(
        _np_pagerank(multi, 0.85, 10)["c"], rel=1e-9
    )


def test_pagerank_combine_parallel_edges_matches_per_edge_fold(spark):
    # the r15 optimization: parallel edges pre-aggregate to (src, dst,
    # sum(w)) before the iteration loop. Ranks must match the per-edge
    # fold (combine off) to float-order tolerance on a multigraph with
    # heavy multiplicity AND a dangling node
    multi = (
        [("a", "b")] * 7 + [("b", "c")] * 3 + [("b", "a")] * 2
        + [("c", "d")]  # d dangles
    )
    df = spark.createDataFrame(multi, "src string, dst string")
    combined = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=10).collect()
    }
    per_edge = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, iterations=10, combine_parallel_edges=False
        ).collect()
    }
    assert set(combined) == set(per_edge)
    for v in combined:
        assert combined[v] == pytest.approx(per_edge[v], rel=1e-12), v
    assert sum(combined.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_null_edges_dropped_and_validation(spark):
    edges = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None), ("b", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert set(got) == {"a", "b"}  # NULL endpoints are not nodes
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)

    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="not in edges"):
        pagerank(edges, src_col="nope")
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="no non-NULL edges"):
        pagerank(empty)


def test_pagerank_custom_columns_and_rank_col(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "from_host bigint, to_host bigint"
    )
    out = pagerank(
        edges, src_col="from_host", dst_col="to_host",
        iterations=3, rank_col="authority",
    )
    assert out.columns == ["node", "authority"]
    got = {r["node"]: r["authority"] for r in out.collect()}
    # symmetric 2-cycle: both nodes at exactly 0.5
    assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)


def test_pagerank_weighted_walk(spark):
    """weight_col: the walk follows edges proportionally to weight —
    verified against the NumPy model extended with weights; w<=0/NULL
    edges are dropped; unweighted == all-weights-1."""

    def np_weighted(edge_list, damping, iterations):
        nodes = sorted(
            {u for u, _, _ in edge_list} | {v for _, v, _ in edge_list}
        )
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        outw = np.zeros(n)
        for u, _, w in edge_list:
            outw[idx[u]] += w
        r = np.full(n, 1.0 / n)
        for _ in range(iterations):
            contrib = np.zeros(n)
            for u, v, w in edge_list:
                contrib[idx[v]] += r[idx[u]] * w / outw[idx[u]]
            dangling = r[outw == 0].sum()
            r = (1 - damping) / n + damping * (contrib + dangling / n)
        return {v: r[idx[v]] for v in nodes}

    wedges = [
        ("a", "b", 9.0), ("a", "c", 1.0),   # a mostly points at b
        ("b", "a", 1.0), ("c", "a", 1.0),
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight_col="w", iterations=15).collect()
    }
    want = np_weighted(wedges, 0.85, 15)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    assert got["b"] > got["c"]  # the heavy edge concentrates rank
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)

    # dropped edges: w<=0/NULL behave as absent
    df2 = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 0.0), ("a", "d", None), ("b", "a", 1.0)],
        "src string, dst string, w double",
    )
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(df2, weight_col="w", iterations=10).collect()
    }
    assert set(got2) == {"a", "b"}  # c/d had no real in-edges or out-edges

    # all-weights-1 == unweighted
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]
    uw = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(base, "src string, dst string"),
            iterations=8,
        ).collect()
    }
    w1 = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(
                [(u, v, 1.0) for u, v in base], "src string, dst string, w double"
            ),
            weight_col="w", iterations=8,
        ).collect()
    }
    for v in uw:
        assert w1[v] == pytest.approx(uw[v], rel=1e-12)

    with pytest.raises(ValueError, match="not in edges"):
        pagerank(df, weight_col="nope")


def test_triangle_counts_k4_and_hygiene(spark):
    """K4 has 4 triangles (3 per node); self-loops, reversed
    duplicates, NULL endpoints and pendant nodes are ignored."""
    from pyspark_data_quality_spark.operators.graph import triangle_counts

    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(2, 1), (3, 3), (4, 5), (None, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = sorted(
        (r["node"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    )
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]


def test_triangle_counts_triangle_free(spark):
    """A path and a star have no triangles -> empty output; a single
    3-cycle with degree ties counts once per corner."""
    from pyspark_data_quality_spark.operators.graph import triangle_counts

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5)], "src int, dst int"
    )
    assert triangle_counts(path).count() == 0
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = sorted(
        (r["node"], r["n_triangles"])
        for r in triangle_counts(cyc).collect()
    )
    assert got == [("a", 1), ("b", 1), ("c", 1)]


# ------------------------------------------------------------------- k-core
def test_k_core_triangle_with_tail(spark):
    from pyspark_data_quality_spark.operators.graph import k_core

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    out = {r["id"]: r["degree"] for r in k_core(pairs, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}  # tail 4-5 peels away


def test_k_core_complete_graph_and_empty_core(spark):
    from pyspark_data_quality_spark.operators.graph import k_core

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        ["id_a", "id_b"],
    )
    out = {r["id"]: r["degree"] for r in k_core(k4, 3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above max degree -> empty core, not an error
    assert k_core(k4, 4).count() == 0


def test_k_core_chain_peels_in_waves_and_max_iter_is_loud(spark):
    from pyspark_data_quality_spark.operators.graph import k_core

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
    )
    assert k_core(chain, 2).count() == 0  # full chain dissolves
    with pytest.raises(RuntimeError, match="max_iter"):
        k_core(chain, 2, max_iter=2)


def test_k_core_ignores_self_loops_nulls_and_duplicate_pairs(spark):
    from pyspark_data_quality_spark.operators.graph import k_core

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (None, 2), (2, 3), (1, 3)],
        "id_a bigint, id_b bigint",
    )
    out = {r["id"]: r["degree"] for r in k_core(pairs, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    with pytest.raises(ValueError, match="k must be"):
        k_core(pairs, 0)
