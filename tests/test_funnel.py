"""Funnel conversion (operators/funnel.py): hand-built event journeys —
ordering is enforced (events out of order don't count), the greedy
earliest-match convention, the horizon cutoff, stalled users keep NULL
tails, and the summary arithmetic."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.funnel import funnel, funnel_users


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts string, event_type string"
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )


STEPS = ["view", "click", "buy"]


def test_funnel_order_enforced_and_null_tails(spark):
    df = _events(spark, [
        # u1 completes in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:30:00", "buy"),
        # u2 clicked BEFORE viewing: click must not count; stalls at view
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 09:30:00", "view"),
        # u3 views and clicks, never buys
        (3, "2024-01-01 08:00:00", "view"),
        (3, "2024-01-01 08:10:00", "click"),
        # u4 never views: not in the funnel at all
        (4, "2024-01-01 07:00:00", "click"),
        (4, "2024-01-01 07:10:00", "buy"),
    ])
    users = {r["user_id"]: r for r in
             funnel_users(df, "user_id", "ts", "event_type", STEPS).collect()}
    assert set(users) == {1, 2, 3}
    assert users[1]["step_3_ts"] is not None
    assert users[2]["step_2_ts"] is None and users[2]["step_3_ts"] is None
    assert users[3]["step_2_ts"] is not None and users[3]["step_3_ts"] is None

    summary = {r["step_index"]: r for r in
               funnel(df, "user_id", "ts", "event_type", STEPS).collect()}
    assert [summary[k]["n_users"] for k in (1, 2, 3)] == [3, 2, 1]
    assert summary[1]["conversion_from_start"] == 1.0
    assert summary[2]["conversion_from_start"] == pytest.approx(2 / 3, abs=1e-6)
    assert summary[3]["conversion_from_prev"] == pytest.approx(0.5)
    assert [r["step_name"] for r in sorted(summary.values(),
            key=lambda r: r["step_index"])] == STEPS


def test_funnel_greedy_earliest_and_horizon(spark):
    df = _events(spark, [
        # u1: two views; funnel anchors on the EARLIEST (10:00), so the
        # 10:30 click converts; a buy lands 2h after step 1
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "view"),
        (1, "2024-01-01 10:30:00", "click"),
        (1, "2024-01-01 12:00:00", "buy"),
    ])
    no_h = {r["step_index"]: r["n_users"] for r in
            funnel(df, "user_id", "ts", "event_type", STEPS).collect()}
    assert no_h == {1: 1, 2: 1, 3: 1}
    # 1-hour horizon from step 1 (10:00): click at 10:30 in, buy at
    # 12:00 out
    with_h = {r["step_index"]: r["n_users"] for r in
              funnel(df, "user_id", "ts", "event_type", STEPS,
                     horizon_seconds=3600).collect()}
    assert with_h == {1: 1, 2: 1, 3: 0}


def test_funnel_validation(spark):
    df = _events(spark, [(1, "2024-01-01 00:00:00", "view")])
    with pytest.raises(ValueError, match="2 steps"):
        funnel_users(df, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_users(df, "user_id", "ts", "event_type", ["a", "a"])
    with pytest.raises(ValueError, match="horizon"):
        funnel_users(df, "user_id", "ts", "event_type", STEPS,
                     horizon_seconds=0)
    # nobody completes step 1: every count 0, rates NULL (try_divide)
    empty = funnel(df.filter("user_id < 0"), "user_id", "ts",
                   "event_type", STEPS).collect()
    assert [r["n_users"] for r in empty] == [0, 0, 0]
    assert all(r["conversion_from_start"] is None for r in empty)


def test_funnel_step_names_are_data_not_sql(spark):
    """Step names containing quotes or backslashes must pass through
    verbatim — the melt uses typed literals, so no name can corrupt or
    reparse the plan (the old stack() interpolation broke on a trailing
    backslash)."""
    hostile = ["it's a view\\", 'click "now"', "buy\\'"]
    df = _events(
        spark,
        [(1, "2024-01-01 00:00:00", hostile[0]),
         (1, "2024-01-01 00:01:00", hostile[1]),
         (1, "2024-01-01 00:02:00", hostile[2]),
         (2, "2024-01-01 00:00:00", hostile[0])],
    )
    out = funnel(df, "user_id", "ts", "event_type", hostile).collect()
    assert [r["step_name"] for r in out] == hostile
    assert [r["n_users"] for r in out] == [2, 1, 1]


def test_funnel_per_segment(spark):
    """segment_col: users attributed to the step-1 ANCHOR event's
    segment (min_by ts), one summary row per (segment, step), rates
    within the segment."""
    df = spark.createDataFrame(
        [
            # ads user converts fully; attribution = FIRST view's segment
            (1, "2024-01-01 10:00:00", "view", "ads"),
            (1, "2024-01-01 11:00:00", "view", "organic"),
            (1, "2024-01-01 10:30:00", "click", None),
            (1, "2024-01-01 12:00:00", "buy", None),
            # two organic users stall after view
            (2, "2024-01-01 09:00:00", "view", "organic"),
            (3, "2024-01-01 09:10:00", "view", "organic"),
            (3, "2024-01-01 09:20:00", "click", None),
        ],
        "user_id int, ts string, event_type string, seg string",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "seg",
    )
    out = funnel(
        df, "user_id", "ts", "event_type", STEPS, segment_col="seg"
    ).collect()
    by = {(r["segment"], r["step_index"]): r for r in out}
    assert len(out) == 6  # 2 segments x 3 steps
    assert by[("ads", 1)]["n_users"] == 1
    assert by[("ads", 3)]["conversion_from_start"] == 1.0
    assert by[("organic", 1)]["n_users"] == 2
    assert by[("organic", 2)]["n_users"] == 1
    assert by[("organic", 2)]["conversion_from_start"] == 0.5
    assert by[("organic", 3)]["n_users"] == 0

    # per-user frame carries the anchor segment
    users = {
        r["user_id"]: r["segment"]
        for r in funnel_users(
            df, "user_id", "ts", "event_type", STEPS, segment_col="seg"
        ).collect()
    }
    assert users == {1: "ads", 2: "organic", 3: "organic"}

    with pytest.raises(ValueError, match="not in df"):
        funnel(df, "user_id", "ts", "event_type", STEPS, segment_col="nope")


def test_event_transitions_matrix(spark):
    """Hand-built journeys: transition counts, per-from row
    normalization, terminal sentinel mode, id tiebreaker, and the
    output-name clash guard."""
    from pyspark_data_quality_spark.operators.funnel import event_transitions

    df = _events(spark, [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "view"),
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:01:00", "click"),
        (3, "2024-01-01 00:00:00", "error"),
    ])
    out = {
        (r["from_state"], r["to_state"]): r
        for r in event_transitions(df, "user_id", "ts", "event_type").collect()
    }
    # view->click twice, click->view once; user 3 has no successor
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "click")]["prob"] == 1.0
    assert out[("click", "view")]["n_transitions"] == 1
    assert out[("click", "view")]["prob"] == 1.0
    assert ("error", "__end__") not in out

    term = {
        (r["from_state"], r["to_state"]): r
        for r in event_transitions(
            df, "user_id", "ts", "event_type", include_terminal=True
        ).collect()
    }
    assert term[("error", "__end__")]["n_transitions"] == 1
    # view row is now a proper distribution: 2x ->click, 1x ->__end__
    assert term[("view", "click")]["prob"] == 0.666667
    assert term[("view", "__end__")]["prob"] == 0.333333
    total = sum(
        r["prob"] for (f, _), r in term.items() if f == "view"
    )
    assert abs(total - 1.0) < 1e-4

    # equal timestamps: id_col pins the order deterministically
    tie = _events(spark, [
        (9, "2024-01-01 00:00:00", "a"),
        (9, "2024-01-01 00:00:00", "b"),
    ]).withColumn("eid", F.when(F.col("event_type") == "a", 1).otherwise(2))
    for _ in range(3):
        got = event_transitions(
            tie, "user_id", "ts", "event_type", id_col="eid"
        ).collect()
        assert [(r["from_state"], r["to_state"]) for r in got] == [("a", "b")]

    with pytest.raises(ValueError, match="from_state"):
        event_transitions(
            df.withColumn("from_state", F.lit("x")),
            "user_id", "ts", "event_type",
        )

    # NULL states are not states: (a, NULL, b) yields a->b, and the
    # terminal sentinel never mislabels a mid-sequence NULL as __end__
    nul = _events(spark, [
        (7, "2024-01-01 00:00:00", "a"),
        (7, "2024-01-01 00:01:00", None),
        (7, "2024-01-01 00:02:00", "b"),
    ])
    nt = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in event_transitions(
            nul, "user_id", "ts", "event_type", include_terminal=True
        ).collect()
    }
    assert nt == {("a", "b"): 1, ("b", "__end__"): 1}


def test_sessionize_gap_assignment(spark):
    """Per-key gap sessions: ids are 1-based and increment past the gap;
    keys are independent; NULL ts rows drop; id tiebreak pins ties."""
    from pyspark_data_quality_spark.operators.funnel import sessionize

    df = _events(spark, [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:10:00", "b"),     # 600s gap: same session
        (1, "2024-01-01 01:10:00", "c"),     # 3600s gap: new session
        (1, "2024-01-01 01:10:30", "d"),
        (2, "2024-01-01 00:00:00", "a"),     # fresh key: session 1
        (2, None, "x"),                      # no timestamp: excluded
    ])
    out = sessionize(df, "user_id", "ts", gap_seconds=1800)
    got = {(r["user_id"], r["event_type"]): r["session_id"]
           for r in out.collect()}
    assert got == {
        (1, "a"): 1, (1, "b"): 1, (1, "c"): 2, (1, "d"): 2, (2, "a"): 1,
    }
    # exactly-at-gap is the SAME session (strict > opens a new one)
    edge = _events(spark, [
        (3, "2024-01-01 00:00:00", "a"), (3, "2024-01-01 00:30:00", "b"),
    ])
    e = sessionize(edge, "user_id", "ts", gap_seconds=1800).collect()
    assert {r["session_id"] for r in e} == {1}

    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df, "user_id", "ts", gap_seconds=0)
    with pytest.raises(ValueError, match="session_id"):
        sessionize(df.withColumn("session_id", F.lit(1)),
                   "user_id", "ts", gap_seconds=10)
