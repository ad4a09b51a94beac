"""Null-safe key joins — the shared shape for "a NULL group key is a
group of its own".

``groupBy`` puts NULL keys in their own group, but a subsequent plain
equality join back (``df.join(stats, keys)``) silently skips those rows
— the recurring defect this module exists to make impossible at the
next call site. ``eqNullSafe`` (``<=>``) compiles to a normal equi-join
key, so the join strategy (broadcast / sort-merge) is unchanged.

Full-outer joins are deliberately NOT covered: there the left side's
key columns are NULL for right-only rows and must be coalesced with the
right side's per call-site semantics (see ``operators/diff.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_null_safe(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    *,
    broadcast: bool = False,
) -> DataFrame:
    """Join ``right`` onto ``left`` matching ``keys`` NULL-SAFELY, so
    the NULL-key group participates like any other. The output keeps
    LEFT's key columns; ``right``'s are renamed away and dropped.
    ``broadcast=True`` hints the (renamed) right side.
    """
    norm = how.replace("_", "").lower()
    if norm in ("fullouter", "outer", "full"):
        raise ValueError(
            "join_null_safe: full-outer needs call-site key coalescing "
            "— see operators/diff.py for that shape"
        )
    if norm in ("right", "rightouter"):
        # right-only rows carry their key only in the dropped _gk_
        # columns — the key VALUE would be silently lost; swap the
        # sides and use a left join instead
        raise ValueError(
            "join_null_safe: right joins lose the right-only rows' key "
            "values (the output keeps LEFT's key columns) — swap the "
            "sides and use how='left'"
        )
    shared = (set(right.columns) - set(keys)) & set(left.columns)
    if shared:
        raise ValueError(
            "join_null_safe: non-key columns shared by both sides would be "
            f"ambiguous downstream: {sorted(shared)} — rename them first"
        )
    clobbered = {f"_gk_{k}" for k in keys} & (set(left.columns) | set(right.columns))
    if clobbered:
        raise ValueError(
            f"join_null_safe: reserved rename target(s) already present: "
            f"{sorted(clobbered)}"
        )
    renamed = right.select(
        *[F.col(k).alias(f"_gk_{k}") for k in keys],
        *[c for c in right.columns if c not in keys],
    )
    if broadcast:
        renamed = F.broadcast(renamed)
    cond = None
    for k in keys:
        m = F.col(k).eqNullSafe(F.col(f"_gk_{k}"))
        cond = m if cond is None else (cond & m)
    return left.join(renamed, cond, how).drop(*[f"_gk_{k}" for k in keys])
