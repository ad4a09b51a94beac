"""Link-graph authority scoring — PageRank as iterative DataFrame
joins, the host-quality prior of web-corpus curation.

Why it's here: per-domain caps (split.cap_per_group) and quality
classifiers (classify.py) treat every host as equal; real curation
recipes weight documents by the authority of the host-link graph
(public lineage: PageRank, Common Crawl host-level webgraph releases).
This operator takes an (src, dst) edge frame — host→host links, doc→doc
citations, any directed graph — and returns per-node authority.

Spark-first shape (no GraphX/graphframes dependency — plain DataFrame
ops the optimizer can see through):

- one action up front for |N| (a scalar), one groupBy for out-degrees;
- per iteration: ONE equi-join (contributions = ranks ⋈ edges on src)
  + ONE groupBy(dst) sum — the textbook power-iteration step; dangling
  mass (nodes with no out-edges) is folded back uniformly via a 1-row
  aggregate broadcast crossJoin (the whitelisted constant-fan-out
  shape), keeping every iteration fully in-plan;
- ranks are ``localCheckpoint``-ed each iteration: the iteration count
  is a PARAMETER, so lineage stays O(1) instead of O(iterations), and
  each step's shuffle output is reused by the next (same contract as
  dedup_components' pointer-jumping loop);
- edges are hash-repartitioned on src once and persisted, so the
  per-iteration join reuses that layout instead of reshuffling the
  (big) edge side every step — only the (small, |N|-row) rank frame
  moves per iteration.

Scale: cost per iteration = shuffle of |N| ranks + the groupBy of
|E| contributions; 10-20 iterations of that is how every distributed
PageRank runs. First to break: a supernode dst (every page links to
one host) concentrates its contribution sum on one reducer — partial
aggregation already collapses per-partition contributions to one row
per (partition, dst), which is exactly the map-side-combine remedy.

Parallel edges contribute once per occurrence (multiplicity = weight);
pass deduplicated edges for the unweighted semantics. NULL endpoints
are dropped (a link to/from nowhere is not a link).

Reference parity: no graph surface in the reference (rule framework
only); training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_core", "pagerank", "triangle_counts"]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 15,
    rank_col: str = "rank",
    combine_parallel_edges: bool = True,
) -> DataFrame:
    """Per-node PageRank after ``iterations`` power-iteration steps:
    ``(node, rank)``, ranks summing to ~1.0 (probability semantics, the
    form rank thresholds and mixing weights are written against).

    ``rank(v) = (1-d)/N + d·(Σ_{u→v} rank(u)·w(u,v)/outweight(u) +
    dangling/N)`` with dangling = total rank parked on nodes without
    out-edges — without the fold-back, rank mass leaks and scores drift
    toward 0. ``weight_col`` makes the walk weighted (a link followed
    proportionally to its weight — link counts, click-through, edge
    confidence); NULL/non-positive weights mean NO edge (dropped, same
    as a NULL endpoint). Unweighted is the weight_col=None special case
    with w=1 everywhere — identical math, identical results. Isolated
    nodes never appear in an edge list; include them by unioning
    zero-degree self-loops upstream if their (1-d)/N floor matters.

    ``combine_parallel_edges`` (default on) collapses parallel edges to
    one ``(src, dst, sum(w))`` row before the iteration loop — the
    multiplicity-as-weight semantics above, folded once instead of
    re-shuffled every step. On multigraphs (link counts, event logs)
    this shrinks every iteration's join+groupBy input from |E| edge
    occurrences to |distinct (src,dst)| rows; on simple graphs the
    pre-aggregation is one extra map-side-combining pass over the edge
    frame that leaves it the same size. Ranks are identical up to
    float-addition order (``k`` occurrences fold to ``k*w`` before the
    contribution sum instead of inside it).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("pagerank: damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    for c in cols:
        if c not in edges.columns:
            raise ValueError(f"pagerank: column {c!r} not in edges")

    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        w.alias("_w"),
    ).filter(
        F.col("_src").isNotNull()
        & F.col("_dst").isNotNull()
        & F.col("_w").isNotNull()
        & (F.col("_w") > 0)
    )
    if combine_parallel_edges:
        # aggregate before the iteration shuffles (map-side combine):
        # every step then joins/groups |distinct (src,dst)| rows, not
        # |E| edge occurrences
        e = e.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
    e = e.repartition(F.col("_src")).persist()
    try:
        nodes = (
            e.select(F.col("_src").alias("node"))
            .union(e.select(F.col("_dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        n = nodes.count()
        if n == 0:
            raise ValueError("pagerank: edge frame has no non-NULL edges")
        # _deg = total outgoing WEIGHT (count when unweighted: w=1)
        out_deg = e.groupBy(F.col("_src").alias("node")).agg(
            F.sum("_w").alias("_deg")
        )
        # ranks carries _deg along so the per-iteration plan needs no
        # second join against the degree frame
        ranks = nodes.join(out_deg, "node", "left").select(
            "node", F.lit(1.0 / n).alias("_r"), "_deg"
        ).localCheckpoint()

        for _ in range(iterations):
            contrib = (
                ranks.filter(F.col("_deg").isNotNull())
                .join(e, ranks["node"] == e["_src"])
                .groupBy(F.col("_dst").alias("node"))
                .agg(
                    F.sum(
                        F.col("_r") * F.col("_w") / F.col("_deg")
                    ).alias("_in")
                )
            )
            dangling = ranks.filter(F.col("_deg").isNull()).agg(
                F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dangling")
            )
            ranks = (
                ranks.select("node", "_deg")
                .join(contrib, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_in"), F.lit(0.0))
                            + F.col("_dangling") / n
                        )
                    ).alias("_r"),
                    "_deg",
                )
                .localCheckpoint()
            )
        return ranks.select("node", F.col("_r").alias(rank_col))
    finally:
        e.unpersist()


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED graph
    — the classic cohesion/community signal (a near-dup cluster whose
    pair graph is triangle-dense is one document family; a link graph's
    triangle count feeds clustering coefficients and spam detection).

    Algorithm: degree-ordered edge orientation (public: the standard
    MapReduce/Cohen triangle scheme; Suri & Vassilvitskii 2011). Edges
    canonicalize to undirected distinct pairs (self-loops and NULLs
    dropped), then each edge orients from its (degree, node)-smaller
    endpoint to the larger — a total order, so the oriented graph is
    acyclic and every triangle has exactly ONE wedge node with two
    out-edges. Wedges (a→b, a→c) joined against the canonical
    undirected edge set (does b—c exist?) count each triangle exactly
    once; exploding the three corners attributes it to its nodes.

    Scale shape: orientation bounds every node's out-degree by
    O(sqrt(E)), so the wedge self-join — the only superlinear step —
    generates at most E^1.5 candidate rows (the theoretical optimum for
    exact counting), shuffled on the (b, c) pair key; everything else
    is |E|-row hash joins on node keys. The canonical edge set feeds
    degrees, orientation and closure, so it is ``localCheckpoint``-ed
    once (this operator is EAGER, like dedup_components): the raw
    input is scanned once, and every downstream reuse — including the
    wedge self-join's two sides — reads the checkpointed edges instead
    of rescanning the source. Output covers nodes in ≥1
    triangle; isolated/acyclic nodes are absent (left-join the node
    frame and coalesce to 0 when the dense output matters).

    Reference parity: no graph surface in the reference; extension
    alongside pagerank (authority) and dedup_components (reachability).
    """
    # the canonical edge set feeds degrees, orientation AND closure —
    # localCheckpoint it once (same contract as dedup_components) so
    # the raw input is scanned once, not once per reuse
    e = (
        edges.filter(
            F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
            & (F.col(src_col) != F.col(dst_col))
        )
        .select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_v"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("_u").alias("_n"))
        .unionAll(e.select(F.col("_v").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    du = deg.select(F.col("_n").alias("_u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col("_n").alias("_v"), F.col("_d").alias("_dv"))
    lower_u = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = (
        e.join(du, "_u").join(dv, "_v")
        .select(
            F.when(lower_u, F.col("_u")).otherwise(F.col("_v")).alias("_a"),
            F.when(lower_u, F.col("_v")).otherwise(F.col("_u")).alias("_b"),
        )
    )
    w1 = oriented.select(F.col("_a").alias("_x"), F.col("_b").alias("_y"))
    w2 = oriented.select(F.col("_a").alias("_x"), F.col("_b").alias("_z"))
    wedges = w1.join(w2, "_x").filter(F.col("_y") < F.col("_z"))
    # close against the CANONICAL edge set (u < v by node order): the
    # wedge endpoints are node-ordered, but the oriented edge between
    # them may run either way (orientation is degree-first), so the
    # oriented frame would miss half the closures.
    closing = e.select(F.col("_u").alias("_y"), F.col("_v").alias("_z"))
    tris = wedges.join(closing, ["_y", "_z"])
    return (
        tris.select(
            F.explode(F.array("_x", "_y", "_z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def k_core(
    pairs: DataFrame,
    k: int,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 100,
) -> DataFrame:
    """The ``k``-core of an undirected graph: the maximal subgraph in
    which EVERY node keeps at least ``k`` neighbors — the standard
    density lens on a near-dup pair graph (2-core = template farms and
    boilerplate rings; pairwise-only matches fall away), complementing
    :func:`triangle_counts` (local density) and connected components
    (mere reachability).

    Classic distributed wave peeling: repeatedly delete nodes of degree
    < ``k`` until a fixpoint. Per round: one degree ``groupBy`` over the
    surviving directed edges + two semi-joins against the keep set, with
    the edge frame ``localCheckpoint``-ed so lineage stays O(1) across
    rounds (the dedup_components / pagerank loop contract) and the
    convergence check is the checkpoint's count. Input pairs are
    symmetrized and deduplicated; self-loops and NULL endpoints are
    dropped. Converges in at most |V| rounds — pathological chains peel
    two ends per round, so ``max_iter`` exhaustion raises loudly rather
    than returning a frame that is not actually a core.

    Output: ``(id, degree)`` — surviving nodes with their WITHIN-CORE
    degree (≥ k by construction).

    Reference parity: no graph surface in the reference; extension in
    the dedup-diagnostics family.
    """
    if k < 1:
        raise ValueError("k_core: k must be >= 1")
    s, d = F.col(src_col), F.col(dst_col)
    half = pairs.select(s.alias("_s"), d.alias("_d")).filter(
        s.isNotNull() & d.isNotNull() & (s != d)
    )
    # lazy checkpoint + count: the count is the action that materializes
    # the checkpoint blocks — one job, not a checkpoint job plus a
    # count job (r16, one action per round)
    edges = (
        half.union(half.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        keep = (
            edges.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("_s")
        )
        pruned = edges.join(keep, "_s", "left_semi").join(
            keep.select(F.col("_s").alias("_d")), "_d", "left_semi"
        )
        pruned = pruned.localCheckpoint(eager=False)
        n_after = pruned.count()
        converged = n_after in (n_edges, 0)  # empty graph IS a fixpoint
        edges, n_edges = pruned, n_after
        if converged:
            break
    else:
        raise RuntimeError(
            f"k_core: no fixpoint within max_iter={max_iter} rounds — "
            "raise max_iter (wave peeling needs up to |V| rounds on "
            "chain-like graphs)"
        )
    return (
        edges.groupBy(F.col("_s").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("id")
    )
