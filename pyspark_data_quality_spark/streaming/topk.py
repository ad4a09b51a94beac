"""Streaming heavy hitters: Misra–Gries summaries as keyed stream state.

The batch operator (operators/profile.heavy_hitters) answers "what are
the top values of this column" for data at rest; THIS one maintains the
answer continuously over a stream — trending queries, hot tenants,
runaway log keys — without ever materializing per-value counts for an
unbounded vocabulary.

Sharding design: each value hashes to one of ``num_shards`` groups
(``pmod(xxhash64(value), num_shards)``), and each shard keeps ONE
Misra–Gries summary as its ``applyInPandasWithState`` state. Because a
value lives in exactly one shard, shard summaries never overlap — the
global answer is the plain union of shard outputs, each value's bound
coming from its own shard's decrement budget. State per shard is
O(capacity); total state is ``num_shards × capacity`` counters no
matter how many distinct values the stream carries. Parallelism =
``num_shards`` (size it like a shuffle partition count).

Every micro-batch each updated shard re-emits its CURRENT summary
(update output mode): (shard, value, count_min, count_max). Downstream
keeps the latest row per (shard, value) — with a parquet/memory sink,
`greatest batch id wins`; the e2e test shows the idiom.

Same MG guarantees as the batch operator, per shard: count_min never
exceeds the true count, count_max never undercounts it, and any value
whose true frequency in its shard exceeds the shard's budget is
guaranteed present.

Reference parity: no streaming surface in the reference; extension
alongside windowed_top_values (exact, windowed) — this one is
cumulative and vocabulary-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_heavy_hitters"]


def streaming_heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    capacity: int = 256,
    num_shards: int = 32,
) -> DataFrame:
    """Maintain per-shard Misra–Gries summaries over a streaming
    DataFrame. Output (update mode): ``shard``, ``value`` (stringified),
    ``count_min``, ``count_max``. NULL values are ignored. For data at
    rest use operators/profile.heavy_hitters — same math, one job.
    """
    import pandas as pd

    if not df.isStreaming:
        raise ValueError(
            "streaming_heavy_hitters: input is not a stream — use "
            "operators/profile.heavy_hitters for batch data"
        )
    if capacity < 1:
        raise ValueError("streaming_heavy_hitters: capacity must be >= 1")
    if num_shards < 1:
        raise ValueError("streaming_heavy_hitters: num_shards must be >= 1")
    from pyspark.sql.streaming.state import GroupStateTimeout

    m = capacity
    src = df.select(
        F.col(value_col).cast("string").alias("_v")
    ).filter(F.col("_v").isNotNull()).withColumn(
        "_shard",
        F.pmod(F.xxhash64("_v"), F.lit(num_shards)).cast("int"),
    )

    def fn(key, pdfs, state):
        if state.exists:
            vals, cnts, err = state.get
            counts = dict(zip(vals, cnts))
            err = int(err)
        else:
            counts, err = {}, 0
        for pdf in pdfs:
            for v, c in pdf["_v"].value_counts(dropna=True).items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > m:
                t = sorted(counts.values(), reverse=True)[m]
                counts = {v: c - t for v, c in counts.items() if c > t}
                err += t
        state.update((list(counts.keys()),
                      [int(c) for c in counts.values()], err))
        yield pd.DataFrame(
            {
                "shard": pd.Series([key[0]] * len(counts), dtype="int32"),
                "value": pd.Series(list(counts.keys()), dtype=object),
                "count_min": pd.Series(list(counts.values()),
                                       dtype="int64"),
                "count_max": pd.Series(
                    [c + err for c in counts.values()], dtype="int64"
                ),
            }
        )

    return src.groupBy("_shard").applyInPandasWithState(
        fn,
        "shard int, value string, count_min long, count_max long",
        "vals array<string>, cnts array<long>, err long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
