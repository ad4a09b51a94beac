"""Cohort retention matrix tests (operators/retention.py): hand-checked
matrix, offset-0 invariant, NULL hygiene, max_offset truncation, and
parameter validation."""

import datetime as dt

import pytest

from pyspark_data_quality_spark.operators.retention import retention_matrix


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _t(day):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)


def test_retention_matrix_hand_checked(spark):
    # period_days=2; epoch-day of 2024-01-01 is 19723, so day d maps to
    # period (19723 + d) // 2: d0->P, d1/d2->P+1, d3/d4->P+2, d5/d6->P+3
    rows = [
        (1, _t(0)), (2, _t(0)),                     # cohort P: users 1,2
        (1, _t(2)),                                 # u1 active P+1
        (1, _t(4)), (2, _t(3)),                     # u1,u2 active P+2
        (3, _t(1)),                                 # cohort P+1: user 3
        (4, _t(4)), (4, _t(5)), (4, _t(6)),         # cohort P+2: user 4
        (None, _t(0)), (9, None),                   # ignored
    ]
    out = retention_matrix(_ev(spark, rows), period_days=2).collect()
    got = {
        (r["cohort"], r["period_offset"]):
        (r["n_cohort"], r["n_active"], r["retention"])
        for r in out
    }
    base = 19723 // 2
    assert got[(base, 0)] == (2, 2, 1.0)
    assert got[(base, 1)] == (2, 1, 0.5)
    assert got[(base, 2)] == (2, 2, 1.0)
    assert got[(base + 1, 0)] == (1, 1, 1.0)
    assert got[(base + 2, 0)] == (1, 1, 1.0)
    assert got[(base + 2, 1)] == (1, 1, 1.0)
    assert len(got) == 6

    # offset 0 is always full retention — the self-check invariant
    assert all(v[2] == 1.0 for kk, v in got.items() if kk[1] == 0)


def test_retention_matrix_max_offset_and_validation(spark):
    rows = [(1, _t(0)), (1, _t(10))]
    full = retention_matrix(_ev(spark, rows), period_days=2)
    assert {r["period_offset"] for r in full.collect()} == {0, 5}
    trunc = retention_matrix(_ev(spark, rows), period_days=2, max_offset=3)
    assert {r["period_offset"] for r in trunc.collect()} == {0}

    with pytest.raises(ValueError, match="period_days"):
        retention_matrix(_ev(spark, rows), period_days=0)
    with pytest.raises(ValueError, match="max_offset"):
        retention_matrix(_ev(spark, rows), max_offset=-1)
