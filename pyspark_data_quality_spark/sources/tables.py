"""Table loading for the driver's parquet fixtures (TESTDATA.md).

At test scale these are plain parquet reads; the same call shape works at
100 TB because everything stays declarative: column pruning and predicate
pushdown reach the parquet scan untouched, and partition discovery is
Spark's. Nothing here collects or caches eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table as a DataFrame (lazy parquet scan)."""
    base = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so rules/queries can use SQL."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
