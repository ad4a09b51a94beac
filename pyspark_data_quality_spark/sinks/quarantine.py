"""Quarantine routing: one DQ pass writes valid rows onward and invalid
rows (with their failure reasons) to a quarantine area.

The standard production pattern the reference never closed the loop on:
its ResultObj exposed the two frames but nothing persisted them. Both
writes share the same upstream plan; the source is persisted for the
duration of the two writes, so each sink's complementary filter reads
the cached batch — one source pass, no UDFs.

Layout: ``<base>/valid/`` (original schema) and ``<base>/invalid/``
(original schema + ``failed_rules array<string>``), both parquet so the
quarantine is queryable for triage and replay. ``partition_by`` columns
apply to both sides (e.g. an ingest-date column keeps replays pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..result import ResultObj


def quarantine_route(
    result: ResultObj,
    base_path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "append",
) -> dict[str, str]:
    """Write ``result``'s valid rows to ``<base>/valid`` and invalid rows
    (with ``failed_rules``) to ``<base>/invalid``. Returns the two paths."""
    paths = {
        "valid": f"{base_path.rstrip('/')}/valid",
        "invalid": f"{base_path.rstrip('/')}/invalid",
    }
    # persist the source for the duration of the two write actions: the
    # valid/invalid accessors each build a fresh plan, so an unpersisted
    # source would be scanned and rule-evaluated once PER SINK — and a
    # source that changes between the actions (files landing in the
    # input path) could route a row into both sides or neither
    result.df.persist()
    try:
        for name, df in (
            ("valid", result.get_valid_df()),
            ("invalid", result.get_invalid_df(with_reasons=True)),
        ):
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(paths[name])
    finally:
        result.df.unpersist()
    return paths


def read_quarantine(spark: SparkSession, base_path: str) -> DataFrame:
    """Load the invalid/quarantined rows for triage."""
    return spark.read.parquet(f"{base_path.rstrip('/')}/invalid")
