"""Skew-aware aggregation helpers.

AQE's skew-join handling covers joins, but a plain ``groupBy`` over a
power-law key (the norm in web/event data: one domain, one user, one
fingerprint dominating) still lands the hot key on one reducer. The
classic fix is SALTING: two-stage aggregation over (key, salt) then key.
Only aggregates that decompose into partials qualify (count/sum/min/max —
what the DQ metrics use); the second stage is tiny (distinct keys x
salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_counts(
    df: DataFrame,
    keys: list[str],
    *,
    salt: int = 16,
    value_col: str | None = None,
) -> DataFrame:
    """``groupBy(keys).count()`` (plus sum/min/max of ``value_col``) with a
    two-stage salted shuffle.

    Stage 1 groups by (keys..., random salt in [0, salt)) — the hot key's
    rows spread over ``salt`` reducers; stage 2 merges the ``salt``
    partials per key. Equivalent results to the direct groupBy for the
    decomposable aggregates computed here.
    """
    salted = df.withColumn(
        "_salt", (F.rand() * salt).cast("int")
    )
    partial_aggs = [F.count(F.lit(1)).alias("_pc")]
    final_aggs = [F.sum("_pc").alias("count")]
    if value_col is not None:
        partial_aggs += [
            F.sum(value_col).alias("_ps"),
            F.min(value_col).alias("_pmin"),
            F.max(value_col).alias("_pmax"),
        ]
        final_aggs += [
            F.sum("_ps").alias(f"sum_{value_col}"),
            F.min("_pmin").alias(f"min_{value_col}"),
            F.max("_pmax").alias(f"max_{value_col}"),
        ]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
