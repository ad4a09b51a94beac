"""Compilation helpers: scope predicates, column folds, schema validation.

These turn declarative rule specs into Catalyst ``Column`` expression trees.
Everything here is driver-side plan building — no Spark actions — so
Catalyst gets the whole predicate at once and can collapse filters,
push them into the parquet scan, and keep the plan in whole-stage codegen.

Reference parity: ``_condition_to_col`` (``completeness_col_ratio_check.py:66-76``
and twins) normalized ``None | Column | Callable``; this version also accepts a
SQL string via ``F.expr`` so scopes can be declared without importing pyspark.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.errors import ColumnNotFoundError, RuleConfigurationError

#: Anything a user may pass as a scope condition or row predicate.
ConditionLike = Union[None, str, Column, Callable[[DataFrame], Column]]


def to_condition(condition: ConditionLike, df: DataFrame) -> Column:
    """Normalize a scope condition into a boolean ``Column``.

    ``None`` -> ``lit(True)`` (whole dataset in scope); SQL strings go
    through ``F.expr``; callables receive the DataFrame and must return a
    ``Column``.
    """
    if condition is None:
        return F.lit(True)
    if isinstance(condition, str):
        return F.expr(condition)
    if isinstance(condition, Column):
        return condition
    if callable(condition):
        out = condition(df)
        if not isinstance(out, Column):
            raise RuleConfigurationError(
                f"condition callable must return a Column, got {type(out).__name__}"
            )
        return out
    raise RuleConfigurationError(
        f"unsupported condition type: {type(condition).__name__}"
    )


def and_fold(cols: list[Column]) -> Column:
    """AND-fold a non-empty predicate list; empty folds to ``lit(True)``."""
    if not cols:
        return F.lit(True)
    return reduce(lambda a, b: a & b, cols)


def or_fold(cols: list[Column]) -> Column:
    """OR-fold a non-empty predicate list; empty folds to ``lit(False)``."""
    if not cols:
        return F.lit(False)
    return reduce(lambda a, b: a | b, cols)


def null_safe(pred: Column) -> Column:
    """Treat a NULL-evaluating predicate as a failure (three-valued logic
    would otherwise silently drop the row from both pass and fail counts)."""
    return F.coalesce(pred, F.lit(False))


def require_columns(df: DataFrame, cols: list[str]) -> None:
    """Analysis-time schema validation (reference ``_pre_check``,
    ``completeness_col_ratio_check.py:61-64``). Raises before any job runs."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(missing, df.columns)


def ratio_agg(scope: Column, pred: Column, alias: str) -> Column:
    """Fraction of in-scope rows satisfying ``pred`` as one aggregate column.

    ``avg`` ignores NULLs, so out-of-scope rows (scope false -> NULL input)
    never contribute; in-scope rows contribute 0.0 or 1.0. This is the
    building block of the fused single-pass analysis (SURVEY.md §4): every
    ratio metric becomes one such expression inside a single ``df.agg``.
    """
    return F.avg(F.when(scope, null_safe(pred).cast("double"))).alias(alias)
