"""Range (interval) join: match left values into right [lo, hi) bands.

Spark plans a bare non-equi join condition as BroadcastNestedLoopJoin —
O(n·m) compares — because there is no equality key to hash on. The scale
shape here MANUFACTURES one: quantize the value axis into buckets of
``bucket_width``, explode each right interval over the buckets it spans,
hash-join left rows on (keys…, bucket), then re-check the exact interval
predicate. Shuffle cost O(n + Σ span/width); compare cost O(candidates),
not O(n·m). The classic trick from spatial/interval joins (bin-and-
verify), expressed entirely in DataFrame ops so Catalyst/AQE still pick
broadcast vs shuffle hash per side.

``bucket_width`` should be on the order of the typical interval span:
too small explodes the right side, too big makes every bucket a
candidate sweep. Both halves stay correct for any positive width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | None = None,
    bucket_width: float,
    how: str = "inner",
    inclusive: str = "left",
) -> DataFrame:
    """Join each left row to every right row whose ``[lo_col, hi_col)``
    interval contains ``value_col`` (``inclusive='both'`` closes the
    upper bound), optionally also matching on equality keys ``by``.
    ``how`` is ``inner`` or ``left`` (unmatched left rows keep nulls).

    Right columns keep their names — they must not collide with left's
    (rename upstream if needed).
    """
    if bucket_width <= 0:
        raise ValueError("range_join: bucket_width must be > 0")
    if inclusive not in ("left", "both"):
        raise ValueError("range_join: inclusive must be 'left' or 'both'")
    keys = by or []
    w = float(bucket_width)

    v = F.col(value_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    upper_ok = v <= hi if inclusive == "both" else v < hi

    if how not in ("inner", "left"):
        raise ValueError("range_join: how must be 'inner' or 'left'")
    # ONE join for both variants: the interval predicate rides IN the
    # join condition next to the equi keys (Spark hashes on the equi
    # part and applies the rest as a join residual), so the left-outer
    # case keeps unmatched rows with nulls natively — no transient row
    # id (monotonically_increasing_id diverges across join branches).
    l = left.alias("l").withColumn("_bucket", F.floor(v / F.lit(w)))
    r = right.alias("r").withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lo / F.lit(w)), F.floor(hi / F.lit(w)))),
    )
    cond = l["_bucket"] == r["_bucket"]
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lv = F.col(f"l.{value_col}")
    cond = cond & (lv >= F.col(f"r.{lo_col}"))
    cond = cond & (
        lv <= F.col(f"r.{hi_col}")
        if inclusive == "both"
        else lv < F.col(f"r.{hi_col}")
    )
    right_payload = [c for c in right.columns if c not in keys]
    return l.join(r, cond, how).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(c) for c in right_payload],
    )
