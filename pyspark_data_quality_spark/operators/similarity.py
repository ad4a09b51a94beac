"""Similarity search over embedding columns (north-star extension).

Two paths:

- :func:`brute_force_topk` — exact top-k cosine neighbors. The query set
  is broadcast (it is small by construction); the corpus is scanned once;
  per-query top-k selection uses a window ranked by similarity. Cost is
  O(|corpus| x |queries|) score computations — the exact baseline every
  ANN variant is measured against.
- :func:`lsh_topk` — approximate top-k: random-hyperplane buckets
  (multi-table) prune the corpus to same-bucket candidates before exact
  scoring. Sub-linear scored pairs at the cost of recall; the scale path
  when |queries| is large.

All scoring is JVM-side (``zip_with``/``aggregate`` dot products) — no
Python UDF. The hyperplanes are deterministic plan literals (fixed seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, rank, cosine). Ties broken by
    neighbor id (deterministic). Queries are explicitly broadcast — the
    join is a broadcast nested loop over one corpus scan, no corpus
    shuffle; the only shuffle is the per-query top-k window over scored
    rows.
    """
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).crossJoin(
        F.broadcast(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vec_col).alias("_qv"),
            )
        )
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("_cv"), F.col("_qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def self_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_ids: list | None = None,
) -> DataFrame:
    """Top-k neighbors within one table (excluding self), optionally for a
    subset of query ids (the common evaluation shape)."""
    queries = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    if query_ids is not None:
        queries = queries.filter(F.col("query_id").isin(query_ids))
    out = brute_force_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k + 1
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 6,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 10000,
    impl: str = "np",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing at least one
    hyperplane-LSH bucket with the query (any of ``num_tables`` tables).

    Recall rises with tables, candidate count with 1/planes; 6x12 at
    64-dim gives ~0.9+ recall@10 on uniform data. Output schema matches
    :func:`brute_force_topk` (fewer than k rows possible when buckets are
    sparse — callers needing exactly k should fall back to brute force for
    starved queries).

    Pass ``dim`` (embedding width) so plan construction stays action-free;
    without it a one-row probe job runs. Corpus buckets larger than
    ``max_bucket_size`` are dropped (hot-bucket guard — a giant
    near-identical cluster would otherwise explode the candidate join).
    """
    import random

    from ..functions.vectors import vector_dim
    from .dedup import _explode_hyperplane_buckets, cap_buckets

    dim = vector_dim(corpus, vec_col, dim)
    if dim is None:  # empty corpus: empty result with the contract schema
        return corpus.limit(0).select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0).alias("rank"),
            F.lit(0.0).alias("cosine"),
        )
    rnd = random.Random(seed)
    tables = [
        [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]

    cb = _explode_hyperplane_buckets(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        ),
        "_cv", tables, impl, ["neighbor_id", "_cv"],
    )
    cb = cap_buckets(cb, ["_t", "_k"], max_bucket_size)

    qb = _explode_hyperplane_buckets(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qv"),
        ),
        "_qv", tables, impl, ["query_id", "_qv"],
    )

    candidates = (
        cb.join(F.broadcast(qb), on=["_t", "_k"])
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("_cv"), F.col("_qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
