"""Data repair: null imputation from group statistics.

The acting half of a DQ system — after the rules FIND incomplete rows
(quarantine keeps the evidence), imputation produces the repaired frame
for consumers that prefer a filled value over a dropped row.

Strategies: ``mean`` / ``median`` (exact percentile) / ``mode`` (most
frequent, ties to the smallest value) / ``constant``. With ``group_by``
the statistic is per group via a keyed window — one hash shuffle, scales
with the key like any aggregation. WITHOUT groups the statistic comes
from a 1-row aggregate broadcast back (an unpartitioned window would
funnel the whole table through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_STRATEGIES = ("mean", "median", "mode", "constant")


def _stat_expr(col: str, strategy: str):
    if strategy == "mean":
        return F.avg(F.col(col))
    if strategy == "median":
        return F.percentile(F.col(col), F.lit(0.5))
    raise AssertionError(strategy)


def impute(
    df: DataFrame,
    columns: list[str],
    *,
    strategy: str = "mean",
    group_by: list[str] | None = None,
    fill_value=None,
    flag_col: str | None = None,
) -> DataFrame:
    """Fill nulls in ``columns``. ``flag_col`` (optional) records whether
    ANY of the columns was null pre-repair. A group whose statistic is
    itself null (all-null group) leaves the null in place."""
    if strategy not in _STRATEGIES:
        raise ValueError(f"impute: unknown strategy {strategy!r}")
    if strategy == "constant" and fill_value is None:
        raise ValueError("impute: constant strategy requires fill_value")
    out = df
    if flag_col is not None:
        was_null = None
        for c in columns:
            n = F.col(c).isNull()
            was_null = n if was_null is None else (was_null | n)
        out = out.withColumn(flag_col, was_null)

    if strategy == "constant":
        return out.fillna(fill_value, subset=columns)

    keys = group_by or []
    if strategy == "mode":
        for c in columns:
            counts = (
                df.filter(F.col(c).isNotNull())
                .groupBy(*keys, F.col(c).alias("_v"))
                .agg(F.count(F.lit(1)).alias("_n"))
            )
            if keys:
                w = Window.partitionBy(*keys).orderBy(
                    F.col("_n").desc(), F.col("_v").asc()
                )
                modes = (
                    counts.withColumn("_rk", F.row_number().over(w))
                    .filter(F.col("_rk") == 1)
                    .select(*keys, F.col("_v").alias(f"_mode_{c}"))
                )
                joined = out.join(F.broadcast(modes), keys, "left")
            else:
                # 1-row AGGREGATE, not filter+limit: an all-null column
                # must yield a null-mode row — a 0-row frame crossJoined
                # in would silently drop the whole dataset
                modes = counts.agg(
                    F.min(
                        F.struct((-F.col("_n")).alias("a"), F.col("_v").alias("v"))
                    )["v"].alias(f"_mode_{c}")
                )
                joined = out.crossJoin(F.broadcast(modes))
            out = joined.withColumn(
                c, F.coalesce(F.col(c), F.col(f"_mode_{c}"))
            ).drop(f"_mode_{c}")
        return out

    if keys:
        for c in columns:
            stat = _stat_expr(c, strategy).over(Window.partitionBy(*keys))
            out = out.withColumn(c, F.coalesce(F.col(c), stat))
        return out
    stats = df.agg(
        *[_stat_expr(c, strategy).alias(f"_stat_{c}") for c in columns]
    )
    out = out.crossJoin(F.broadcast(stats))
    for c in columns:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.col(f"_stat_{c}"))
        ).drop(f"_stat_{c}")
    return out
