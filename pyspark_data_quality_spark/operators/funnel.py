"""Funnel conversion over event sequences — the standard product /
pipeline-health question ("of the users who VIEWED, how many CLICKED,
then SIGNED UP, then PURCHASED — in that order?") as per-step joins,
no sessionization UDFs, no per-user event collection.

Semantics (the greedy unordered-funnel convention every analytics
store uses): a user's step-1 time is their EARLIEST step-1 event; each
later step's time is the earliest matching event STRICTLY AFTER the
previous step's time; ``horizon_seconds`` (optional) additionally
requires every step to land within that window of the user's step-1
time. Greedy earliest-match maximizes conversion under the
strictly-increasing constraint for two steps and is the fixed,
engine-reproducible convention here (documented, oracle-replayed).

Scale shape: step k is ONE equi-join on the user key (previous
survivors ⋈ step-k events) + ONE min-aggregation — k-1 joins total for
a k-step funnel, every shuffle keyed by the same user column so the
exchanges reuse partitioning; survivors shrink monotonically. No
arrays of per-user timestamps are ever collected (the collect_list
funnel breaks on hot users; this shape doesn't care how many events
one user has).

Reference parity: no event-sequence surface in the reference (rule
framework only); training-data extension surface alongside
sequence_gaps / session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_users"]


def funnel_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    *,
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel timestamps: one row per user who completed step 1,
    with ``step_1_ts .. step_k_ts`` (NULL from the first step the user
    never reached — once NULL, all later steps are NULL by
    construction). Feed this to :func:`funnel` for the summary, or join
    it back to user dimensions for segment-level conversion.
    """
    if len(steps) < 2:
        raise ValueError("funnel_users: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_users: steps must be distinct")
    if horizon_seconds is not None and horizon_seconds <= 0:
        raise ValueError("funnel_users: horizon_seconds must be > 0")
    u, ts, ev = F.col(user_col), F.col(ts_col), F.col(event_col)

    cur = (
        df.filter(ev == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("step_1_ts"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = df.filter(ev == step).select(u.alias(user_col), ts.alias("_ts"))
        cond = F.col("_ts") > F.col(f"step_{k - 1}_ts")
        if horizon_seconds is not None:
            cond = cond & (
                F.col("_ts")
                <= F.col("step_1_ts")
                + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")
            )
        prev_cols = [f"step_{j}_ts" for j in range(1, k)]
        reached = (
            cur.join(nxt, user_col)
            .filter(cond)
            .groupBy(user_col, *prev_cols)
            .agg(F.min("_ts").alias(f"step_{k}_ts"))
        )
        # keep users who stalled at step k-1 (their step_k_ts is NULL):
        # the funnel frame stays one-row-per-step-1 user
        cur = cur.join(
            reached.select(user_col, f"step_{k}_ts"), user_col, "left"
        )
    return cur


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    *,
    horizon_seconds: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Funnel summary: one row per step with ``step_index``,
    ``step_name``, ``n_users`` (users reaching the step in order),
    ``conversion_from_start`` (vs step 1) and ``conversion_from_prev``
    — the two drop-off readings every funnel chart shows. Deterministic
    (pure min-aggregations; no sampling, no order ties by construction
    since each user's step time is a MIN).
    """
    users = funnel_users(
        df, user_col, ts_col, event_col, steps,
        horizon_seconds=horizon_seconds,
    )
    counts = users.agg(
        *[
            F.count(F.col(f"step_{k}_ts")).alias(f"_n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for k, name in enumerate(steps, start=1):
        prev = f"_n{k - 1}" if k > 1 else f"_n{k}"
        row = counts.select(
            F.lit(k).alias("step_index"),
            F.lit(name).alias("step_name"),
            F.col(f"_n{k}").cast("bigint").alias("n_users"),
            F.round(
                F.try_divide(F.col(f"_n{k}"), F.col("_n1")), round_to
            ).alias("conversion_from_start"),
            F.round(
                F.try_divide(F.col(f"_n{k}"), F.col(prev)), round_to
            ).alias("conversion_from_prev"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("step_index")
