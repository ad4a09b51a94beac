"""Shared equi-width histogram plumbing for the multi-column screens.

One convention, one place (r13 review: :func:`~.drift.drift_screen`
and :func:`~.repair.hbos_scores` had each restated the bounds-unpivot,
column->value explode and bin-clamp blocks — a future change to the
NaN/Inf convention would have had to land three times):

- bounds are per-column FINITE min/max (``functions/expr.finite`` —
  one bad row must not stretch an axis to NaN);
- NULL/NaN values have no bin (``clamped_bin`` yields NULL — callers
  decide whether that means "drop" or "score 0");
- ±Inf clamps into the edge bins (the escaped-mass convention);
- a degenerate column (width 0, or missing bounds) collapses to bin 0
  rather than dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def finite_bounds(df: DataFrame, cols: list[str]) -> DataFrame:
    """ONE pass over ``df`` computing every column's finite min/max:
    a 1-row frame with ``_lo_<c>`` / ``_hi_<c>`` doubles (wide, for
    broadcast next to row data; unpivot with :func:`unpivot_bounds`)."""
    from ..functions.expr import finite

    return df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(finite(F.col(c))).cast("double").alias(f"_lo_{c}"),
                F.max(finite(F.col(c))).cast("double").alias(f"_hi_{c}"),
            )
        ]
    )


def unpivot_bounds(bounds_wide: DataFrame, cols: list[str]) -> DataFrame:
    """The 1-row wide bounds frame as ``(column, _blo, _bhi)`` long
    form — len(cols) rows, the broadcast side of a tagged histogram."""
    return bounds_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_lo_{c}").alias("_blo"),
                        F.col(f"_hi_{c}").alias("_bhi"),
                    )
                    for c in cols
                ]
            )
        ).alias("_b")
    ).select("_b.*")


def explode_values(df: DataFrame, cols: list[str]) -> DataFrame:
    """Every column's values as ``(column, _v double)`` rows via ONE
    exploded map — the single-shuffle fan-out every multi-column
    histogram rides (profile.top_values' trick)."""
    return df.select(
        F.explode(
            F.create_map(
                *[
                    x
                    for c in cols
                    for x in (F.lit(c), F.col(c).cast("double"))
                ]
            )
        ).alias("column", "_v")
    )


def clamped_bin(v: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Equi-width bin index of ``v`` in [lo, hi): NULL for NULL/NaN
    values (no position on the line), edge-clamped for ±Inf and
    escaped mass, bin 0 for width-0/unbounded columns."""
    width = (hi - lo) / F.lit(float(bins))
    raw = F.floor(F.try_divide(v - lo, width))
    clamped = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.coalesce(raw, F.lit(0)))
    ).cast("int")
    return F.when(v.isNotNull() & ~F.isnan(v), clamped)
