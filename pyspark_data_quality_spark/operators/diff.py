"""Snapshot reconciliation: keyed row-level diff between two versions of
a table — the "what changed since the last load" primitive behind
incremental-pipeline validation and CDC audits.

Reference parity: the reference framework has no cross-snapshot operator
at all (its checks see one DataFrame); this extends the roadmap's
consistency dimension (`/root/reference/src/pyspark_data_quality/core/
_enums.py:12-18` declares Dimension.CONSISTENCY but ships no operator
for it).

Scale shape: ONE full-outer shuffle join on the key columns — the
minimum possible for a keyed diff — with every comparison an expression
(null-safe ``<=>``), so whole-stage codegen keeps it JVM-side. The
summary aggregates map-side before the final tiny shuffle. Per-column
change counts ride the same join via conditional sums: no second pass,
no explode, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Row-status labels emitted by :func:`table_diff`.
STATUSES = ("added", "removed", "changed", "unchanged")


def _diff_base(
    cur: DataFrame,
    ref: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None,
) -> tuple[DataFrame, list[str]]:
    cols = compare_cols or [c for c in cur.columns if c not in keys]
    missing = [c for c in cols + keys if c not in cur.columns or c not in ref.columns]
    if missing:
        raise ValueError(f"table_diff: columns missing from a side: {missing}")
    c = cur.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.lit(True).alias("_in_cur"),
        *[F.col(x).alias(f"_c_{x}") for x in cols],
    )
    r = ref.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.lit(True).alias("_in_ref"),
        *[F.col(x).alias(f"_r_{x}") for x in cols],
    )
    j = c.join(r, [f"_k_{k}" for k in keys], "full_outer")
    any_changed = F.lit(False)
    for x in cols:
        any_changed = any_changed | ~F.col(f"_c_{x}").eqNullSafe(F.col(f"_r_{x}"))
    status = (
        F.when(F.col("_in_ref").isNull(), F.lit("added"))
        .when(F.col("_in_cur").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.withColumn("status", status), cols


def table_diff(
    cur: DataFrame,
    ref: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff summary: one row per status — ``(status, n)`` for
    added / removed / changed / unchanged — over a single keyed
    full-outer join. ``compare_cols`` defaults to every non-key column
    of ``cur`` (all comparisons null-safe: NULL == NULL, NULL != value).
    """
    j, _ = _diff_base(cur, ref, keys, compare_cols)
    return j.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def table_diff_columns(
    cur: DataFrame,
    ref: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-column change profile over rows present on BOTH sides:
    ``(column, n_changed, change_ratio)`` — which columns drive the
    changed count. Same single join as :func:`table_diff`; the per-column
    counts are conditional sums in one fused aggregate (a 100 TB diff
    pays one shuffle total)."""
    j, cols = _diff_base(cur, ref, keys, compare_cols)
    both = j.filter(F.col("_in_cur").isNotNull() & F.col("_in_ref").isNotNull())
    aggs = [F.count(F.lit(1)).alias("_n_both")] + [
        F.sum(
            (~F.col(f"_c_{x}").eqNullSafe(F.col(f"_r_{x}"))).cast("long")
        ).alias(f"_ch_{x}")
        for x in cols
    ]
    wide = both.agg(*aggs)
    # unpivot the 1-row wide aggregate (stack is a projection, not a shuffle)
    pairs = ", ".join(f"'{x}', _ch_{x}" for x in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {pairs}) as (column, n_changed)", "_n_both"
    ).select(
        "column",
        "n_changed",
        F.round(F.try_divide(F.col("n_changed"), F.col("_n_both")), 6).alias(
            "change_ratio"
        ),
    )
