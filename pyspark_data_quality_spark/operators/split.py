"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the wrong tool for corpus curation: it samples per
task attempt (a retried partition can land rows in a different split),
and no other system can reproduce the assignment. The standard fix is
HASH-based assignment — split membership is a pure function of the row's
id (+ an optional salt), so it is stable across runs, engines, retries,
and repartitioning, and any downstream consumer can recompute it.

The hash is the first 8 hex chars of ``md5(id || salt)`` taken mod
10000 — md5 because every engine agrees on it byte-for-byte (the same
reason ``doc_md5`` uses it, functions/text.py), 10000 buckets so weights
have basis-point resolution. Pure expressions: the split column costs a
projection, no shuffle, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10000


def split_assignment(
    id_col: Column | str, weights: dict[str, float], *, salt: str = ""
) -> Column:
    """Column mapping each id to a split name per ``weights`` (need not
    sum to 1 — they are normalized). Assignment = hash-bucket of
    ``md5(id || salt)`` against cumulative weight boundaries."""
    if not weights:
        raise ValueError("split_assignment: weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split_assignment: weights must sum > 0")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")
        % _BUCKETS
    )
    names = list(weights)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(round(acc * _BUCKETS))
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning every row to a named split."""
    return df.withColumn(
        split_col, split_assignment(id_col, weights, salt=salt)
    )
