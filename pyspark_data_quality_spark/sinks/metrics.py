"""Metrics persistence: append-only parquet history of DQ runs.

The reference had NO sink at all (metrics lived in a transient DataFrame,
``result_obj.py:60-70``); a production DQ system needs run-over-run
history for trend alerts. Layout: parquet partitioned by ``dataset`` and
``run_date`` — partition pruning makes "this dataset, last N days" reads
cheap, and the 14-field METRIC_SCHEMA stays stable across runs so the
history unions schema-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_metrics(metrics: DataFrame, path: str) -> None:
    """Append one run's metric rows, partitioned for pruned reads."""
    (
        metrics.withColumn("run_date", F.to_date("run_ts"))
        .write.mode("append")
        .partitionBy("dataset", "run_date")
        .parquet(path)
    )


def read_metrics(
    spark: SparkSession,
    path: str,
    *,
    dataset: str | None = None,
) -> DataFrame:
    """Load metric history; the dataset filter prunes partitions."""
    df = spark.read.parquet(path)
    if dataset is not None:
        df = df.filter(F.col("dataset") == dataset)
    return df
