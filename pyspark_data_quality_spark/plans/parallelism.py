"""Input-parallelism guard for Python-kernel stages.

An Arrow-batched kernel is only as parallel as its input partitioning.
A small upstream file (one parquet footer, one coalesced shuffle output)
arrives as ONE partition, and the whole mapInPandas/pandas_udf stage
then serializes onto one core — measured in-repo: the sf0.1 documents
fixture is a single file, and every shingle kernel ran 1-task until this
guard existed.

The guard repartitions ONLY when the incoming partition count is
pathologically low relative to the cluster (below half the default
parallelism). At real scale the input has hundreds of splits and this is
a no-op — no shuffle is added where the data already provides
parallelism; the shuffle it does add in the low-parallelism case moves
exactly the rows the kernel was about to serialize on anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Round-robin repartition iff the frame has fewer than half of
    ``min_partitions`` (default: the context's default parallelism)."""
    target = (
        min_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
