"""Expression-tree helpers shared by the column-function modules."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for expression trees: evaluate ``value`` once per row
    and pass it to ``body`` as a lambda variable (O(1) lookup per
    reference). Spark's interpreted expression evaluation has no
    common-subexpression elimination inside higher-order-function
    lambdas, so an expression referenced N times is computed N times —
    binding via a single-element ``transform`` caps that at once.
    Nesting is fine (inner lambdas may reference outer variables).
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def finite(c: Column) -> Column:
    """``c`` when it is a FINITE number, else NULL — the guard every
    statistic aggregate in this package feeds numeric inputs through.

    Why it exists (NaN-adversarial hardening, r12): Spark's ``avg`` /
    ``stddev`` / ``min`` / ``max`` skip NULLs but NOT NaN — one NaN
    poisons the whole aggregate (mean=NaN -> every z-score NaN -> under
    Spark's NaN-is-greatest ordering EVERY row compares ``> threshold``
    as true), and ``max`` returns NaN/Infinity as the greatest value,
    so a single bad reference row silently collapses histogram bounds.
    Routing the STATISTIC input through ``finite`` keeps the summary
    sane while the operator decides separately how to treat the
    non-finite rows themselves (usually: flag as anomalous or clamp to
    an edge bin). Non-floating inputs pass through unchanged (integers
    are never NaN/Inf); the magnitude check casts to double so ANSI
    ``abs`` can never overflow-throw on Long.MinValue.
    """
    return F.when(
        (~F.isnan(c)) & (F.abs(c.cast("double")) < F.lit(float("inf"))),
        c,
    )
