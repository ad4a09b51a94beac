"""Snapshot diff (operators/diff.py) and Wasserstein drift."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.diff import (
    table_diff,
    table_diff_columns,
)
from pyspark_data_quality_spark.operators.drift import wasserstein_1d


@pytest.fixture
def snapshots(spark):
    ref = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "id int, name string, amount double",
    )
    cur = spark.createDataFrame(
        [
            (1, "a", 10.0),       # unchanged
            (2, "B", 20.0),       # changed: name
            (3, "c", 30.0),       # changed: NULL -> value (null-safe)
            (5, "e", 50.0),       # added
        ],                        # 4 removed
        "id int, name string, amount double",
    )
    return cur, ref


def test_table_diff_summary(snapshots):
    cur, ref = snapshots
    got = {r["status"]: r["n"] for r in table_diff(cur, ref, ["id"]).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}


def test_table_diff_compare_cols_subset(snapshots):
    cur, ref = snapshots
    # only compare `amount`: row 2's name edit no longer counts as changed
    got = {
        r["status"]: r["n"]
        for r in table_diff(cur, ref, ["id"], compare_cols=["amount"]).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}

    with pytest.raises(ValueError, match="missing"):
        table_diff(cur, ref, ["id"], compare_cols=["nope"])


def test_table_diff_columns(snapshots):
    cur, ref = snapshots
    rows = {
        r["column"]: r for r in table_diff_columns(cur, ref, ["id"]).collect()
    }
    # 3 rows on both sides: id 1 (no change), 2 (name), 3 (amount)
    assert rows["name"]["n_changed"] == 1
    assert rows["amount"]["n_changed"] == 1
    assert rows["name"]["change_ratio"] == pytest.approx(1 / 3, abs=1e-6)


def test_table_diff_single_shuffle(snapshots):
    cur, ref = snapshots
    plan = (
        table_diff(cur, ref, ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one keyed exchange per side for the join + the final tiny agg
    # exchange; no cartesian or nested-loop anywhere
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_wasserstein_identical_and_shifted(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    same = wasserstein_1d(a, a, "x", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert same["w1"] == 0.0 and same["n_cur"] == 100 and same["n_ref"] == 100

    # all mass at 0 vs all mass at 10, 10 bins over [0, 10]: the CDF gap
    # is 1 across 9 interior bins of width 1 -> W1 = 9 (binned lower
    # bound of the true distance 10)
    z = spark.createDataFrame([(0.0,)] * 50, "x double")
    t = spark.createDataFrame([(10.0,)] * 50, "x double")
    far = wasserstein_1d(z, t, "x", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert far["w1"] == pytest.approx(9.0)

    # default bounds come from the REFERENCE side (numeric_drift convention)
    d = wasserstein_1d(a, a, "x").collect()[0]
    assert d["w1"] == 0.0


def test_wasserstein_empty_middle_bins(spark):
    # mass only in the edge bins; the 8 empty middle bins still carry the
    # CDF gap and must contribute
    cur = spark.createDataFrame([(0.5,)] * 10, "x double")
    ref = spark.createDataFrame([(9.5,)] * 10, "x double")
    r = wasserstein_1d(cur, ref, "x", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert r["w1"] == pytest.approx(9.0)


def test_reconcile_aggregates(spark):
    from pyspark_data_quality_spark.operators.diff import reconcile_aggregates

    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (3, 7.0)], "k int, v double"
    )
    summary = spark.createDataFrame(
        [(1, 30.0), (2, 99.0), (4, 1.0)], "k int, total double"
    )
    rows = {
        r["k"]: r
        for r in reconcile_aggregates(
            detail, summary, ["k"], {"v": "total"}
        ).collect()
    }
    assert rows[1]["matched"] is True and rows[1]["diff"] == 0.0
    assert rows[2]["matched"] is False and rows[2]["diff"] == -94.0
    assert rows[3]["matched"] is False and rows[3]["summary_value"] is None
    assert rows[4]["matched"] is False and rows[4]["detail_value"] is None

    # tolerance + only_mismatches
    close = spark.createDataFrame([(1, 30.05)], "k int, total double")
    out = reconcile_aggregates(
        detail.filter(F.col("k") == 1), close, ["k"], {"v": "total"},
        tolerance=0.1, only_mismatches=True,
    )
    assert out.count() == 0

    with pytest.raises(ValueError, match="unknown agg"):
        reconcile_aggregates(detail, summary, ["k"], {"v": "total"}, agg="avg")
    with pytest.raises(ValueError, match="non-empty"):
        reconcile_aggregates(detail, summary, ["k"], {})


def test_diff_and_reconcile_null_keys_compared(spark):
    """NULL-keyed rows are a comparable identity (null-safe key joins):
    diff compares them instead of double-counting added+removed, and
    reconcile matches the NULL detail group to the NULL summary row."""
    from pyspark_data_quality_spark.operators.diff import (
        reconcile_aggregates,
        table_diff,
    )

    cur = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k int, v double")
    ref = spark.createDataFrame([(None, 1.0), (1, 9.0)], "k int, v double")
    statuses = {r["status"]: r["n"] for r in table_diff(cur, ref, ["k"]).collect()}
    assert statuses == {"unchanged": 1, "changed": 1}

    detail = spark.createDataFrame(
        [(None, 5.0), (None, 5.0), (1, 3.0)], "k int, v double"
    )
    summary = spark.createDataFrame(
        [(None, 10.0), (1, 3.0)], "k int, total double"
    )
    rows = {
        r["k"]: r
        for r in reconcile_aggregates(
            detail, summary, ["k"], {"v": "total"}
        ).collect()
    }
    assert rows[None]["matched"] is True and rows[None]["diff"] == 0.0
    assert rows[1]["matched"] is True
