"""Partitioned dataset writer: the output shape a downstream trainer or
query engine wants to read.

Three levers that matter at scale, surfaced as first-class parameters:

- ``partition_by`` — hive-style directory partitioning for partition
  pruning (the reader skips whole directories);
- ``max_records_per_file`` — bounds file size so a skewed partition
  doesn't produce one multi-GB file (and tiny partitions don't need it);
- ``sort_within`` — clusters rows inside each file so parquet row-group
  min/max statistics prune at the finest level (sort WITHIN partitions:
  no global sort, no extra shuffle beyond the partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_dataset(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    sort_within: list[str] | None = None,
    mode: str = "error",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a partitioned, size-bounded, optionally clustered
    dataset."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    w = out.write.mode(mode).format(format)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def read_dataset(
    spark: SparkSession, path: str, *, format: str = "parquet"
) -> DataFrame:
    return spark.read.format(format).load(path)
