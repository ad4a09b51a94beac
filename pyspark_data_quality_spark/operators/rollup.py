"""Multi-resolution time rollups (hypertable-style continuous aggregates).

One pass produces the SAME aggregate at several time granularities
(hour/day/month/...) via GROUPING SETS: Catalyst's Expand emits one row
per (input row × grouping set) into a single hash aggregation — one
shuffle for every resolution, vs one full job per granularity when
naively looping. At 100 TB the Expand multiplies map-side rows by
len(levels), but partial aggregation collapses them before the exchange,
so the shuffle carries |distinct windows| rows per level — the same as
the loop, minus the repeated scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: granularities accepted by date_trunc in both Spark and DuckDB
SUPPORTED_LEVELS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    *,
    levels: tuple[str, ...] = ("hour", "day", "month"),
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate ``df`` at every granularity in ``levels`` in ONE job.

    Output: ``level`` (granularity name), ``window_start`` (truncated
    timestamp), the ``group_cols``, then the aggregates (default:
    ``count(1) as n``). Uses GROUPING SETS — the ``grouping()`` bit, not
    value-nullness, identifies each row's level, so null timestamps
    don't misattribute rows.
    """
    for lvl in levels:
        if lvl not in SUPPORTED_LEVELS:
            raise ValueError(f"time_rollup: unsupported level {lvl!r}")
    gcols = group_cols or []
    aggs = aggs if aggs is not None else [F.count(F.lit(1)).alias("n")]

    trunc_names = [f"_{lvl}" for lvl in levels]
    base = df.select(
        *[
            F.date_trunc(lvl, F.col(ts_col)).alias(name)
            for lvl, name in zip(levels, trunc_names)
        ],
        *[c for c in df.columns],
    )
    sets = [[name, *gcols] for name in trunc_names]
    level = None
    for lvl, name in zip(levels, trunc_names):
        cond = F.grouping(name) == 0
        level = F.when(cond, lvl) if level is None else level.when(cond, lvl)
    agged = base.groupingSets(sets, *trunc_names, *gcols).agg(
        level.alias("level"),
        F.coalesce(*[F.col(n) for n in trunc_names]).alias("window_start"),
        *aggs,
    )
    out_aggs = [
        c
        for c in agged.columns
        if c not in (*trunc_names, *gcols, "level", "window_start")
    ]
    return agged.select("level", "window_start", *gcols, *out_aggs)


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    window: str = "1 hour",
    round_to: int = 6,
) -> DataFrame:
    """Time-based trailing-window statistics per row: count / mean /
    stddev of ``value_col`` over the last ``window`` of event time within
    each group — the moving-baseline every streaming-metric alert
    compares against, computed batch-side with a RANGE frame.

    The window partitions by ``group_cols`` (keyed — state per task is
    one group's rows inside one frame, never the table; an unpartitioned
    rolling window would funnel everything through one task, so
    ``group_cols=None`` is rejected rather than silently funneling).
    The RANGE frame orders by epoch seconds, so rows with equal
    timestamps share a frame (deterministic, engine-stable — matches SQL
    ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``).

    Output: input columns + ``n_window`` / ``mean_window`` /
    ``stddev_window``.
    """
    from pyspark.sql.window import Window

    if not group_cols:
        raise ValueError(
            "rolling_stats: group_cols is required — an unpartitioned "
            "rolling window funnels the whole table through one task"
        )
    parts = window.split()
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(
            f"rolling_stats: window must look like '15 minutes', got {window!r}"
        )
    unit_seconds = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }
    if parts[1] not in unit_seconds:
        raise ValueError(f"rolling_stats: unsupported unit {parts[1]!r}")
    span = int(parts[0]) * unit_seconds[parts[1]]

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(ts_col).cast("timestamp").cast("long"))
        .rangeBetween(-span, 0)
    )
    return (
        df.withColumn("n_window", F.count(value_col).over(w))
        .withColumn("mean_window", F.round(F.avg(value_col).over(w), round_to))
        .withColumn(
            "stddev_window",
            F.round(F.stddev_samp(value_col).over(w), round_to),
        )
    )


def group_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    *,
    k: int = 3,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` — the per-partition leader
    board (longest documents per language, biggest orders per customer).

    Rank is ``row_number`` over a window partitioned BY GROUP, so the sort
    is per-group after one hash shuffle — never a global sort. Ties break
    on ``tiebreak_col`` (asc) to make the rank total and engine-stable;
    it defaults to ``order_col`` alone, which is only deterministic when
    the order column is unique within each group — pass an id column for
    oracle-grade determinism.

    At 100 TB: cost is the one shuffle on the grouping key plus a
    per-group in-memory sort; a skewed group sorts on one task, so for
    heavy-hitter groups pre-filter with an approximate per-group
    threshold first (see ``vocab_top_k`` for the TakeOrdered global
    variant).
    """
    from pyspark.sql.window import Window

    direction = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [direction]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(*group_cols, "rank")
    )


def trend_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend: is this segment's metric
    drifting up or down, and how linearly? One row per group with
    ``n`` (pairs where both sides are non-NULL), ``slope``,
    ``intercept`` and ``r2`` — the monitoring primitive behind "daily
    volume is decaying 2%/day in segment X" alerts, fit over whatever
    ``x`` the caller supplies (day index, batch number, a numeric
    feature).

    Pure SQL-standard aggregates (``regr_slope`` / ``regr_intercept`` /
    ``regr_r2`` / ``regr_count``) — single hash aggregation, partial
    map-side combine, shuffle carries one sufficient-statistics row per
    group; no window, no second pass, NULL-pair rows ignored per the
    standard. Standard semantics carry the edge cases: a group with a
    constant ``x`` has no defined slope (NULL), a perfectly flat ``y``
    fits with r2 = 1.

    Timestamps/dates for ``x``: cast upstream (``unix_date`` /
    epoch seconds) — the fit needs a real number, and the caller knows
    which unit the slope should be "per" of.

    Reference parity: no counterpart in the reference rule framework
    (src/pyspark_data_quality has no regression surface); extension
    operator for segment-health monitoring, SQL-replayable 1:1 (DuckDB
    ships the same regr_* family).
    """
    dtypes = dict(df.dtypes)
    for c in (x_col, y_col):
        if c not in dtypes:
            raise ValueError(f"trend_fit: column {c!r} not in df")
        if dtypes[c].startswith(("timestamp", "date", "string")):
            raise ValueError(
                f"trend_fit: column {c!r} has type {dtypes[c]}; cast to "
                "a numeric x/y upstream (unix_date / epoch seconds) so "
                "the slope unit is explicit"
            )
    y, x = F.col(y_col), F.col(x_col)
    out = (
        df.groupBy(*(group_cols or []))
        .agg(
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_slope(y, x), round_to).alias("slope"),
            F.round(F.regr_intercept(y, x), round_to).alias("intercept"),
            F.round(F.regr_r2(y, x), round_to).alias("r2"),
        )
    )
    return out.orderBy(*(group_cols or [])) if group_cols else out


def interarrival_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-key inter-arrival statistics: gap mean / sample stddev /
    coefficient of variation / max over consecutive event gaps — the
    traffic-shape signal behind bot detection (CV ≈ 0 = metronomic
    scraper; CV > 1 = bursty human/incident traffic) and feed-health
    monitoring (max_gap = the worst silent window).

    One key-partitioned lag window (the sort each key's gaps need
    anyway) + one groupBy. Tied timestamps are safe: gaps depend only
    on the SORTED multiset of timestamps, so tie order cannot change
    any output (a tie contributes a 0-gap either way). Keys with < 2
    events report ``n_gaps = 0`` and NULL gap stats; NULL timestamps
    are ignored.

    Output: key cols + ``n_events``, ``n_gaps``, ``mean_gap_s``,
    ``sd_gap_s`` (sample stddev; NULL when n_gaps < 2), ``cv`` =
    sd/mean (NULL when mean is 0), ``max_gap_s``. Seconds as doubles
    (sub-second timestamps keep their fraction).

    Reference parity: no arrival-shape surface in the reference;
    extension alongside rolling_stats (value shape over time) and
    sequence_gaps (id-space holes).
    """
    if not key_cols:
        raise ValueError("interarrival_stats: key_cols must be non-empty")
    sec = (
        F.col(ts_col).cast("timestamp").cast("double")
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("_s").asc())
    # filter on the CASTED value: a raw value that casts to NULL must
    # be ignored like a NULL timestamp, not counted as an event
    gapped = (
        df.select(*key_cols, sec.alias("_s"))
        .filter(F.col("_s").isNotNull())
        .withColumn("_gap", F.col("_s") - F.lag("_s").over(w))
    )
    return (
        gapped.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_gap").alias("n_gaps"),
            F.round(F.avg("_gap"), round_to).alias("mean_gap_s"),
            F.round(F.stddev_samp("_gap"), round_to).alias("sd_gap_s"),
            F.round(
                F.try_divide(
                    F.stddev_samp("_gap"),
                    F.when(F.avg("_gap") != 0.0, F.avg("_gap")),
                ),
                round_to,
            ).alias("cv"),
            F.round(F.max("_gap"), round_to).alias("max_gap_s"),
        )
        .orderBy(*[F.col(k).asc_nulls_first() for k in key_cols])
    )
