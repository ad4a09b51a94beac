"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DQ report on sf0.001.
``queries()`` maps operator names -> (spark, sf_dir) -> DataFrame.
``oracle_sql()`` gives the DuckDB-equivalent SQL for each query (same
column names/aliases — the driver hash-compares values after sorting
columns by name).

Implementation lives in :mod:`pyspark_data_quality_spark`; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_data_quality_spark.entry_queries import (  # noqa: E402
    ENTRY_QUERIES,
    ORACLE_SQL,
    flagship_report,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full DQ report (completeness + uniqueness + validity)
    over sf0.001 lineitem — ONE fused agg job for all metrics."""
    return flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ENTRY_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
