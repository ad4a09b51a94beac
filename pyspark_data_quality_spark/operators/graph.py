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

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 15,
    rank_col: str = "rank",
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
    e = (
        edges.select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            w.alias("_w"),
        )
        .filter(
            F.col("_src").isNotNull()
            & F.col("_dst").isNotNull()
            & F.col("_w").isNotNull()
            & (F.col("_w") > 0)
        )
        .repartition(F.col("_src"))
        .persist()
    )
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
