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


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = 256 * 1024 * 1024,
    fmt: str = "parquet",
    sort_within: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    mode: str = "error",
) -> int:
    """Rewrite a fragmented dataset into ~``target_file_bytes`` files —
    the remedy for what :func:`..operators.layout.file_layout_report`
    diagnoses. Small-file swarms make every subsequent scan pay per-file
    open/footer costs and every planner pay the listing.

    The output file count comes from the CURRENT on-disk byte total
    (filesystem listing — metadata-scale), not a row-count action:
    ``ceil(total_bytes / target)``, floor 1. ``repartition`` (round-
    robin) rather than ``coalesce``: coalesce glues whole input
    partitions, so one fat input file would still produce one fat output
    file — exactly the skew this exists to fix. ``sort_within`` restores
    single-column clustering (min/max pruning) after the shuffle;
    ``zorder_cols`` instead re-clusters along the Morton curve of
    several columns (:func:`..operators.zorder.zorder_by`) — the
    OPTIMIZE-ZORDER maintenance pass, compaction and multi-column
    data-skipping layout in the same single rewrite (the z-order range
    shuffle REPLACES the round-robin repartition; the two knobs are
    mutually exclusive).

    Returns the number of files written.
    """
    from math import ceil

    from ..operators.layout import _list_files

    if sort_within and zorder_cols:
        raise ValueError(
            "compact_dataset: sort_within and zorder_cols are mutually "
            "exclusive layouts — pick one clustering"
        )
    total = sum(b for _, b in _list_files(spark, src_path))
    n_files = max(1, ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(src_path)
    # a hive-partitioned source reads its partition columns back as data
    # columns; without re-applying partitionBy the compacted copy would
    # silently LOSE partition pruning (and the round-robin repartition
    # destroys min/max locality on those columns too) — detect the
    # partition dirs from the file paths and preserve the layout
    part_cols = _hive_partition_cols(spark, src_path)
    if zorder_cols:
        from ..operators.zorder import zorder_by

        df = zorder_by(df, zorder_cols, num_partitions=n_files)
    else:
        df = df.repartition(n_files)
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
    w = df.write.mode(mode).format(fmt)
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.save(dst_path)
    return n_files


def _hive_partition_cols(spark: SparkSession, path: str) -> list[str]:
    """Partition columns of a hive-layout dataset, in directory order,
    detected from one leaf file path ("k=v" segments) — metadata-only,
    no Spark job."""
    from ..operators.layout import _list_files

    for p, _ in _list_files(spark, path):
        rel = p[len(path.rstrip("/")):].lstrip("/")
        cols = [
            seg.split("=", 1)[0]
            for seg in rel.split("/")[:-1]
            if "=" in seg
        ]
        if cols:
            return cols
        return []
    return []


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "error",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a BUCKETED catalog table — the storage-level
    answer to "this join shuffles every run".

    Hash-bucketing by the join/aggregation key at write time means every
    subsequent equi-join or groupBy on ``bucket_by`` between tables with
    the SAME bucket count reads co-located data: Spark's planner drops
    the Exchange on both sides (`spark.sql.sources.bucketing.enabled`,
    on by default), so a fact-fact join over 100 TB pays ZERO shuffle
    instead of re-hashing the corpus per query. ``sort_by`` additionally
    pre-sorts within buckets, letting sort-merge join skip its sort.

    Bucketing metadata lives in the catalog, so this writes via
    ``saveAsTable`` (plain ``.save(path)`` silently drops bucketing —
    the classic pitfall); ``path`` makes it an EXTERNAL table at that
    location with only metadata in the catalog. Pick ``num_buckets`` so
    one bucket of the LARGER table fits an executor core's working set
    (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-compression);
    both sides of a co-located join must use the same count.
    """
    if not bucket_by:
        raise ValueError("write_bucketed_table: bucket_by is required")
    if num_buckets < 1:
        raise ValueError(
            f"write_bucketed_table: num_buckets must be >= 1, got {num_buckets}"
        )
    w = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
