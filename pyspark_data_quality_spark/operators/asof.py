"""As-of (point-in-time) join — the time-series operator Spark's join
zoo lacks natively.

For every left row, attach the most recent right row at or before the
left timestamp (per key): "which price/config/order snapshot was in
effect when this event happened". The naive formulation — non-equi range
join + per-left-row max — is quadratic per key in Spark; the standard
scale shape used here is **union + last_value over a keyed window**:

1. tag both sides, align schemas (right payload as one struct, null on
   left rows);
2. union — NO join node at all;
3. one window over (key, ts, side): ``last(_r, ignorenulls=True)``
   carries the latest right payload forward onto each left row;
4. keep left rows, unpack the struct.

Cost: ONE hash shuffle on the key + a per-partition sort — identical to
a sort-merge join's exchange, linear in rows, skew-bounded by the key.
The side tag breaks timestamp ties: right rows sort BEFORE left rows at
an equal timestamp when matches may be simultaneous (``strict=False``),
after them when the match must be strictly earlier (``strict=True``).

DuckDB ships ASOF JOIN natively, which the entry-query oracle uses —
two independent formulations, one answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    right_on: str | None = None,
    right_by: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: int | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the most
    recent ``right`` row with ``right.ts <= left.ts`` (``<`` when
    ``strict``) within the same ``by`` key; unmatched rows keep nulls.

    ``on``/``right_on`` are the timestamp columns (right defaults to
    ``on``); ``by``/``right_by`` the equality keys. Right payload columns
    come back suffixed; the matched right timestamp as ``{on}{suffix}``.
    ``tolerance_seconds`` voids matches older than the given horizon
    (nulls instead, the pandas ``merge_asof`` convention).
    """
    r_on = right_on or on
    l_by = by or []
    r_by = right_by or l_by
    if len(l_by) != len(r_by):
        raise ValueError("asof_join: by/right_by must have equal length")

    payload_cols = [c for c in right.columns if c not in (*r_by, r_on)]
    r_struct = F.struct(
        F.col(r_on).alias("_ts"), *[F.col(c) for c in payload_cols]
    )
    # right rows sort before left at equal ts (inclusive match) unless strict
    r_side, l_side = (1, 0) if strict else (0, 1)
    left_payload = [c for c in left.columns if c not in l_by]
    left_types = {f.name: f.dataType for f in left.schema.fields}
    r_norm = right.select(
        *[F.col(rb).alias(lb) for rb, lb in zip(r_by, l_by)],
        F.col(r_on).alias("_t"),
        F.lit(r_side).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
    )
    l_norm = left.select(
        *l_by,
        F.col(on).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r_norm.schema["_r"].dataType).alias("_r"),
        *left_payload,
    )

    w = (
        Window.partitionBy(*l_by)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    annotated = l_norm.unionByName(r_norm).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out = annotated.filter(F.col("_side") == l_side)

    m = F.col("_m")
    if tolerance_seconds is not None:
        horizon = F.col("_t").cast("long") - F.lit(int(tolerance_seconds))
        m = F.when(m["_ts"].cast("long") >= horizon, m)
    return out.select(
        *l_by,
        *[c for c in left.columns if c not in l_by],
        m["_ts"].alias(f"{on}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in payload_cols],
    )
