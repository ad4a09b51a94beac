"""Range-join and time-rollup operator tests."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.range_join import range_join
from pyspark_data_quality_spark.operators.rollup import time_rollup


@pytest.fixture
def bands(spark):
    return spark.createDataFrame(
        [(0.0, 3.0, "low"), (3.0, 5.0, "mid"), (5.0, 99.0, "high")],
        "lo double, hi double, band string",
    )


def test_range_join_inner_and_bounds(spark, bands):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 2.9), (3, 3.0), (4, 98.9), (5, 99.0), (6, -1.0)],
        "id int, v double",
    )
    got = {
        r["id"]: r["band"]
        for r in range_join(
            df, bands, value_col="v", lo_col="lo", hi_col="hi", bucket_width=2.0
        ).collect()
    }
    # half-open [lo, hi): 3.0 goes to mid, 99.0 and -1.0 match nothing
    assert got == {1: "low", 2: "low", 3: "mid", 4: "high"}
    both = {
        r["id"]: r["band"]
        for r in range_join(
            df, bands, value_col="v", lo_col="lo", hi_col="hi",
            bucket_width=2.0, inclusive="both",
        ).collect()
    }
    assert both[5] == "high"  # closed upper bound
    # 3.0 now matches BOTH low's hi and mid's lo -> two rows; dict kept one
    assert len(
        range_join(
            df, bands, value_col="v", lo_col="lo", hi_col="hi",
            bucket_width=2.0, inclusive="both",
        ).filter(F.col("id") == 3).collect()
    ) == 2


def test_range_join_left_keeps_unmatched(spark, bands):
    df = spark.createDataFrame([(1, 2.0), (2, -5.0), (3, 2.0)], "id int, v double")
    rows = range_join(
        df, bands, value_col="v", lo_col="lo", hi_col="hi",
        bucket_width=2.0, how="left",
    ).collect()
    assert len(rows) == 3
    got = {r["id"]: r["band"] for r in rows}
    assert got == {1: "low", 2: None, 3: "low"}


def test_range_join_by_keys_and_width_independence(spark):
    left = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "k string, id int, v double"
    )
    right = spark.createDataFrame(
        [("a", 0.0, 10.0, "ra"), ("b", 6.0, 10.0, "rb")],
        "k string, lo double, hi double, tag string",
    )
    for w in (0.5, 3.0, 100.0):
        got = {
            r["id"]: r["tag"]
            for r in range_join(
                left, right, value_col="v", lo_col="lo", hi_col="hi",
                by=["k"], bucket_width=w,
            ).collect()
        }
        assert got == {1: "ra"}, f"width {w}"


def test_time_rollup_levels(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:30:00", 2.0),
            (2, "2024-01-01 11:15:00", 4.0),
            (3, "2024-02-03 00:00:00", 6.0),
        ],
        "id int, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_rollup(
        df, "ts",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.avg("v"), 6).alias("avg_v")],
    ).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level"], []).append(r)
    assert len(by_level["hour"]) == 3
    assert len(by_level["day"]) == 2
    assert len(by_level["month"]) == 2
    jan = next(r for r in by_level["month"] if "2024-01" in str(r["window_start"]))
    assert jan["n"] == 2 and jan["avg_v"] == 3.0


def test_time_rollup_group_cols_and_validation(spark):
    df = spark.createDataFrame(
        [("x", "2024-01-01 10:00:00"), ("y", "2024-01-01 10:30:00")],
        "k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_rollup(df, "ts", levels=("hour",), group_cols=["k"]).collect()
    assert {(r["k"], r["n"]) for r in out} == {("x", 1), ("y", 1)}
    with pytest.raises(ValueError, match="unsupported level"):
        time_rollup(df, "ts", levels=("fortnight",))


def test_join_diagnosis_exact_counts(spark):
    from pyspark_data_quality_spark.operators.join_audit import join_diagnosis

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k int"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,), (None,)], "k int"
    )
    got = {r["metric"]: r["value"] for r in join_diagnosis(left, right, "k").collect()}
    assert got["left_rows"] == 5.0
    assert got["right_rows"] == 6.0
    assert got["left_null_keys"] == 1.0
    assert got["right_null_keys"] == 2.0
    assert got["left_distinct_keys"] == 3.0  # 1,2,3
    assert got["right_distinct_keys"] == 3.0  # 1,2,4
    assert got["matched_keys"] == 2.0  # 1,2
    assert got["left_matched_rows"] == 3.0  # two 1s + one 2
    assert got["right_matched_rows"] == 3.0  # one 1 + two 2s
    # key 1: 2*1, key 2: 1*2 -> 4 rows out of an inner join
    assert got["inner_join_rows"] == 4.0
    assert got["left_max_key_rows"] == 2.0
    assert got["right_max_key_rows"] == 2.0
    assert got["key_overlap_ratio"] == 0.5  # 2 matched / 4 union keys


def test_join_diagnosis_disjoint_and_empty(spark):
    from pyspark_data_quality_spark.operators.join_audit import join_diagnosis

    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(2,)], "k int")
    got = {r["metric"]: r["value"] for r in join_diagnosis(left, right, "k").collect()}
    assert got["matched_keys"] == 0.0
    assert got["inner_join_rows"] == 0.0
    assert got["key_overlap_ratio"] == 0.0

    empty = left.limit(0)
    got = {r["metric"]: r["value"] for r in join_diagnosis(empty, right, "k").collect()}
    assert got["left_rows"] == 0.0 and got["right_distinct_keys"] == 1.0


def test_rolling_stats_hand_computed(spark):
    from pyspark_data_quality_spark.operators.rollup import rolling_stats

    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:30:00", 20.0),
        ("a", "2024-01-01 01:00:00", 30.0),  # frame: all three (1h incl.)
        ("a", "2024-01-01 02:30:00", 40.0),  # frame: itself only
        ("b", "2024-01-01 00:45:00", 5.0),   # other key: independent
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["k"], str(r["ts"])): (r["n_window"], r["mean_window"])
        for r in rolling_stats(
            df, "ts", "value", group_cols=["k"], window="1 hour"
        ).collect()
    }
    assert out[("a", "2024-01-01 00:00:00")] == (1, 10.0)
    assert out[("a", "2024-01-01 00:30:00")] == (2, 15.0)
    assert out[("a", "2024-01-01 01:00:00")] == (3, 20.0)
    assert out[("a", "2024-01-01 02:30:00")] == (1, 40.0)
    assert out[("b", "2024-01-01 00:45:00")] == (1, 5.0)

    import pytest

    with pytest.raises(ValueError, match="group_cols"):
        rolling_stats(df, "ts", "value", group_cols=None)
    with pytest.raises(ValueError, match="unsupported unit"):
        rolling_stats(df, "ts", "value", group_cols=["k"], window="1 fortnight")


def test_group_top_k(spark):
    from pyspark_data_quality_spark.operators.rollup import group_top_k

    df = spark.createDataFrame(
        [("g1", 1, 10.0), ("g1", 2, 30.0), ("g1", 3, 30.0), ("g1", 4, 5.0),
         ("g2", 5, 1.0)],
        ["g", "id", "v"],
    )
    top = group_top_k(df, ["g"], "v", k=2, tiebreak_col="id").collect()
    got = [(r["g"], r["id"], r["rank"]) for r in top]
    assert got == [("g1", 2, 1), ("g1", 3, 2), ("g2", 5, 1)]
    # ascending: smallest first
    bottom = group_top_k(
        df, ["g"], "v", k=1, ascending=True, tiebreak_col="id"
    ).collect()
    assert [(r["g"], r["id"]) for r in bottom] == [("g1", 4), ("g2", 5)]


def test_join_null_safe_guards_and_null_groups(spark):
    from pyspark_data_quality_spark.plans.joins import join_null_safe

    left = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", 3.0)], ["k", "x"]
    )
    stats = spark.createDataFrame(
        [("a", 10.0), (None, 20.0)], ["k", "s"]
    )
    got = {
        r["k"]: r["s"]
        for r in join_null_safe(left, stats, ["k"], "left").collect()
    }
    # NULL key joins its own group; unmatched key survives the left join
    assert got == {"a": 10.0, None: 20.0, "b": None}

    # non-key column shared by both sides -> loud failure, not ambiguity
    clash = spark.createDataFrame([("a", 9.0)], ["k", "x"])
    with pytest.raises(ValueError, match="ambiguous"):
        join_null_safe(left, clash, ["k"])

    # reserved _gk_<key> name on either side -> loud failure
    reserved = spark.createDataFrame([("a", 1.0)], ["k", "_gk_k"])
    with pytest.raises(ValueError, match="_gk_k"):
        join_null_safe(left, reserved, ["k"])
    with pytest.raises(ValueError, match="_gk_k"):
        join_null_safe(reserved, stats.withColumnRenamed("s", "s2"), ["k"])


def test_constraints_off_refcount(spark):
    from pyspark_data_quality_spark.operators.dedup import (
        _CONF_SWAP_STATE,
        _constraints_off,
    )

    conf = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(conf, "true")
    with _constraints_off(spark):
        assert spark.conf.get(conf) == "false"
        with _constraints_off(spark):  # nested entrant: still off
            assert spark.conf.get(conf) == "false"
        # inner exit must NOT restore while the outer loop is active
        assert spark.conf.get(conf) == "false"
    assert spark.conf.get(conf) == prev
    assert id(spark) not in _CONF_SWAP_STATE


def test_trend_fit_hand_computed(spark):
    """OLS per group vs hand math: a perfect line recovers its slope and
    intercept with r2=1; a noisy-flat group fits slope 0; NULL pairs
    drop from n; constant-x has no defined slope (SQL-standard NULL)."""
    from pyspark_data_quality_spark.operators.rollup import trend_fit

    rows = [
        # g=a: y = 3x + 1 exactly
        ("a", 0.0, 1.0), ("a", 1.0, 4.0), ("a", 2.0, 7.0), ("a", 3.0, 10.0),
        # g=b: symmetric around x=1 -> slope 0, mean 5
        ("b", 0.0, 4.0), ("b", 1.0, 5.0), ("b", 2.0, 6.0),
        ("b", 0.0, 6.0), ("b", 1.0, 5.0), ("b", 2.0, 4.0),
        # g=c: constant x -> slope undefined
        ("c", 1.0, 1.0), ("c", 1.0, 2.0),
        # g=d: one NULL on each side -> n counts only complete pairs
        ("d", 0.0, 0.0), ("d", 1.0, 2.0), ("d", None, 9.0), ("d", 2.0, None),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in trend_fit(df, "x", "y", group_cols=["g"]).collect()}
    assert out["a"]["n"] == 4 and out["a"]["slope"] == 3.0
    assert out["a"]["intercept"] == 1.0 and out["a"]["r2"] == 1.0
    assert out["b"]["slope"] == 0.0 and out["b"]["r2"] == 0.0
    assert out["c"]["slope"] is None
    assert out["d"]["n"] == 2 and out["d"]["slope"] == 2.0

    # ungrouped: one global row
    g = trend_fit(df.filter("g = 'a'"), "x", "y").collect()
    assert len(g) == 1 and g[0]["slope"] == 3.0

    import pytest as _pt
    with _pt.raises(ValueError, match="cast"):
        trend_fit(df.withColumn("t", F.current_timestamp()), "t", "y")
    with _pt.raises(ValueError, match="not in df"):
        trend_fit(df, "nope", "y")


def test_interarrival_stats_hand_checked(spark):
    """Gaps, CV and the <2-event / tie / NULL-ts conventions."""
    import datetime as dt

    from pyspark_data_quality_spark.operators.rollup import (
        interarrival_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key a: gaps 10, 10, 40 -> mean 20, sd samp ~17.320508
        ("a", t0),
        ("a", t0 + dt.timedelta(seconds=10)),
        ("a", t0 + dt.timedelta(seconds=20)),
        ("a", t0 + dt.timedelta(seconds=60)),
        # key b: tie -> single 0 gap; sd NULL (n_gaps < 2 is false: 1 gap)
        ("b", t0), ("b", t0),
        # key c: single event -> no gaps
        ("c", t0),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r["k"]: r for r in interarrival_stats(df, ["k"], "ts").collect()}
    a = out["a"]
    assert (a["n_events"], a["n_gaps"]) == (4, 3)
    assert a["mean_gap_s"] == 20.0
    assert a["sd_gap_s"] == round((300.0) ** 0.5, 6)  # var=((100+100+1600)-3*400)/2
    assert a["cv"] == round((300.0 ** 0.5) / 20.0, 6)
    assert a["max_gap_s"] == 40.0
    b = out["b"]
    assert (b["n_gaps"], b["mean_gap_s"], b["sd_gap_s"], b["cv"]) == (
        1, 0.0, None, None
    )
    c = out["c"]
    assert (c["n_events"], c["n_gaps"], c["mean_gap_s"]) == (1, 0, None)
    assert "d" not in out  # NULL ts ignored -> no rows at all

    import pytest as _pt
    with _pt.raises(ValueError, match="key_cols"):
        interarrival_stats(df, [], "ts")
