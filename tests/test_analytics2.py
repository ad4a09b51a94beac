"""Unit tests for the round-9 second analytics batch: pattern_profile,
concentration_report, ab_test_report, acf_profile, quantile_normalize,
compression_profile."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.abtest import ab_test_report
from pyspark_data_quality_spark.operators.profile import (
    concentration_report,
    pattern_profile,
)
from pyspark_data_quality_spark.operators.repair import quantile_normalize
from pyspark_data_quality_spark.operators.rollup import acf_profile
from pyspark_data_quality_spark.operators.text import compression_profile


# ---------------------------------------------------------------- patterns
def test_pattern_profile_masks_and_ratio(spark):
    df = spark.createDataFrame(
        [("AB-12", "x1"), ("CD-34", "x2"), ("ef 5", None)],
        ["id", "tag"],
    )
    out = pattern_profile(df, ["id", "tag"])
    rows = {(r["column"], r["mask"]): r for r in out.collect()}
    assert rows[("id", "AA-99")]["n"] == 2
    assert rows[("id", "AA-99")]["ratio"] == pytest.approx(2 / 3)
    assert rows[("id", "aa 9")]["n"] == 1
    assert rows[("tag", "a9")]["n"] == 2
    assert rows[("tag", None)]["n"] == 1  # NULL mask row


def test_pattern_profile_collapse_runs_and_topk(spark):
    df = spark.createDataFrame(
        [("AAA1",), ("BB22",), ("C3",), ("D4",)], ["v"]
    )
    out = pattern_profile(df, ["v"], collapse_runs=True, k=1)
    rows = out.collect()
    assert len(rows) == 1
    # AAA1 -> A+9, BB22 -> A+9+, C3/D4 -> A9: top mask is A9 (n=2)
    assert rows[0]["mask"] == "A9" and rows[0]["n"] == 2
    assert rows[0]["rank"] == 1


# ----------------------------------------------------------- concentration
def test_concentration_gini_known_values(spark):
    # equal shares -> gini 0
    eq = spark.createDataFrame([("g", 5.0)] * 4, ["g", "x"])
    r = concentration_report(eq, ["g"], "x").collect()[0]
    assert r["gini"] == pytest.approx(0.0)
    assert r["n"] == 4 and r["total"] == 20.0
    assert r["max_share"] == pytest.approx(0.25)
    # one row owns everything: G = (n-1)/n = 0.75
    one = spark.createDataFrame(
        [("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 8.0)], ["g", "x"]
    )
    r = concentration_report(one, ["g"], "x").collect()[0]
    assert r["gini"] == pytest.approx(0.75)
    assert r["max_share"] == pytest.approx(1.0)
    assert r["top_decile_share"] == pytest.approx(1.0)  # top-1 row


def test_concentration_nulls_and_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 2.0)], ["g", "x"]
    )
    rows = {r["g"]: r for r in concentration_report(df, ["g"], "x").collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["n_null"] == 1
    # gini for [1,3]: 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5 = 0.25
    assert rows["a"]["gini"] == pytest.approx(0.25)
    assert rows["b"]["n"] == 1 and rows["b"]["gini"] == pytest.approx(0.0)


# ------------------------------------------------------------------ abtest
def _ab_frame(spark):
    rows = []
    for i in range(40):
        rows.append(("a", float(10 + (i % 5)), i % 5 == 0))
    for i in range(60):
        rows.append(("b", float(20 + (i % 7)), i % 2 == 0))
    return spark.createDataFrame(rows, ["variant", "metric", "success"])


def test_ab_test_report_math(spark):
    out = ab_test_report(
        _ab_frame(spark), "variant", "metric", "success"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["variant_a"], r["variant_b"]) == ("a", "b")
    assert r["n_a"] == 40 and r["n_b"] == 60
    # replicate welch by hand
    import statistics

    a = [10 + (i % 5) for i in range(40)]
    b = [20 + (i % 7) for i in range(60)]
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / 40 + vb / 60
    t = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(se2)
    dfree = se2**2 / ((va / 40) ** 2 / 39 + (vb / 60) ** 2 / 59)
    assert r["welch_t"] == pytest.approx(t, abs=1e-5)
    assert r["welch_df"] == pytest.approx(dfree, abs=1e-4)
    assert r["significant"] is True
    # proportions: a 8/40, b 30/60
    assert r["rate_a"] == pytest.approx(0.2)
    assert r["rate_b"] == pytest.approx(0.5)
    pool = 38 / 100
    z = (0.2 - 0.5) / math.sqrt(pool * (1 - pool) * (1 / 40 + 1 / 60))
    assert r["prop_z"] == pytest.approx(z, abs=1e-5)


def test_ab_test_refuses_wrong_variant_count(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], ["v", "m"]
    )
    with pytest.raises(ValueError, match="exactly 2"):
        ab_test_report(df, "v", "m")


def test_ab_test_null_handling(spark):
    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", None, True), ("b", 2.0, False),
         ("b", 4.0, False), (None, 99.0, True)],
        ["v", "m", "s"],
    )
    r = ab_test_report(df, "v", "m", "s").collect()[0]
    assert r["n_a"] == 1  # null metric excluded from mean/var
    assert r["rate_a"] == pytest.approx(1.0)  # 2/2 assigned rows
    assert r["mean_b"] == pytest.approx(3.0)


# --------------------------------------------------------------------- acf
def test_acf_perfect_period_two(spark):
    # alternating bucket counts 1,3,1,3,... -> acf(1) = -1, acf(2) = +1
    rows = []
    for h in range(12):
        n = 1 if h % 2 == 0 else 3
        for j in range(n):
            rows.append(("k", f"2024-01-01 {h:02d}:00:{j:02d}"))
    df = spark.createDataFrame(rows, ["k", "ts"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["lag"]: r for r in
           acf_profile(df, ["k"], "ts", lags=[1, 2]).collect()}
    assert out[1]["n_buckets"] == 12 and out[1]["n_pairs"] == 11
    # hand ACF: mean 2, dev ±1; lag1 sum = -11, lag2 sum = +10, ss = 12
    assert out[1]["acf"] == pytest.approx(-11 / 12, abs=1e-6)
    assert out[2]["acf"] == pytest.approx(10 / 12, abs=1e-6)


def test_acf_gaps_and_constant_series(spark):
    rows = [("k", "2024-01-01 00:00:00"), ("k", "2024-01-01 01:00:00"),
            ("k", "2024-01-01 03:00:00")]  # hour 2 missing
    df = spark.createDataFrame(rows, ["k", "ts"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["lag"]: r for r in
           acf_profile(df, ["k"], "ts", lags=[1, 9]).collect()}
    assert out[1]["n_pairs"] == 1  # (0,1) only; (2,3) side missing
    assert out[1]["acf"] is None  # constant counts -> zero variance
    assert 9 not in out  # lag beyond span emits no row


def test_acf_rejects_bad_lags(spark):
    df = spark.createDataFrame([("k", "2024-01-01")], ["k", "ts"])
    with pytest.raises(ValueError, match="positive"):
        acf_profile(df, ["k"], "ts", lags=[0])


# ------------------------------------------------------ quantile normalize
def test_quantile_normalize_maps_onto_reference(spark):
    cur = spark.createDataFrame(
        [("g", 100.0), ("g", 200.0), ("g", 300.0), ("g", 400.0)],
        ["g", "x"],
    )
    ref = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)], ["g", "x"]
    )
    out = {r["x"]: r["x_qn"] for r in
           quantile_normalize(cur, "x", ref, ["g"]).collect()}
    assert out == {100.0: 1.0, 200.0: 2.0, 300.0: 3.0, 400.0: 4.0}


def test_quantile_normalize_sizes_ties_nulls(spark):
    # n_cur=3 onto n_ref=6: idx = ceil(cnt_le*2) -> 2nd, 4th, 6th ref value
    cur = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", 9.0), ("g", None), ("h", 1.0)],
        ["g", "x"],
    )
    ref = spark.createDataFrame(
        [("g", float(v)) for v in [10, 20, 30, 40, 50, 60]], ["g", "x"]
    )
    rows = quantile_normalize(cur, "x", ref, ["g"]).collect()
    got = sorted(
        [(r["g"], r["x"], r["x_qn"]) for r in rows],
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    # ties (5.0,5.0): cnt_le=2 for both -> idx=ceil(2*6/3)=4 -> 40
    assert got == [
        ("g", 5.0, 40.0),
        ("g", 5.0, 40.0),
        ("g", 9.0, 60.0),
        ("g", None, None),      # null passes through
        ("h", 1.0, None),       # group absent from reference
    ]


def test_quantile_normalize_refuses_ungrouped(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError, match="group_cols"):
        quantile_normalize(df, "x", df, [])


# ------------------------------------------------------------- compression
def test_compression_profile_signal_direction(spark):
    rep = "spam " * 400
    import random

    rng = random.Random(7)
    rand = "".join(chr(rng.randrange(0x20, 0x7F)) for _ in range(2000))
    df = spark.createDataFrame(
        [(1, rep), (2, rand), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            compression_profile(df, "text").collect()}
    assert rows[1]["compression_ratio"] < 0.05
    assert rows[2]["compression_ratio"] > 0.7
    assert rows[1]["n_bytes"] == 2000 and rows[2]["n_bytes"] == 2000
    assert rows[3]["n_bytes"] is None and rows[3]["compression_ratio"] is None
    assert rows[4]["n_bytes"] == 0 and rows[4]["compression_ratio"] is None


def test_compression_profile_deterministic(spark):
    df = spark.createDataFrame([(1, "abcabcabc" * 50)], ["doc_id", "text"])
    a = compression_profile(df).collect()[0]
    b = compression_profile(df).collect()[0]
    import zlib

    expect = len(zlib.compress(("abcabcabc" * 50).encode(), 6))
    assert a["n_compressed"] == b["n_compressed"] == expect


def test_concentration_all_zero_group_is_null_not_error(spark):
    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0)], ["g", "x"]
    )
    r = concentration_report(df, ["g"], "x").collect()[0]
    assert r["n"] == 2 and r["total"] == 0.0
    assert r["gini"] is None and r["max_share"] is None


def test_quantile_normalize_sketched_reference(spark):
    # m >= n_ref: bit-identical to the unbounded mapping
    cur = spark.createDataFrame(
        [("g", float(v)) for v in [11, 22, 33, 44, 55, 66]], ["g", "x"]
    )
    ref = spark.createDataFrame(
        [("g", float(v)) for v in [1, 2, 3, 4, 5]], ["g", "x"]
    )
    full = sorted(
        (r["x"], r["x_qn"])
        for r in quantile_normalize(cur, "x", ref, ["g"]).collect()
    )
    same = sorted(
        (r["x"], r["x_qn"])
        for r in quantile_normalize(
            cur, "x", ref, ["g"], ref_max_per_group=50
        ).collect()
    )
    assert full == same
    # m=2 over n_ref=5 keeps positions ceil(2.5)=3 and 5 -> values 3, 5;
    # idx = ceil(cnt_le*2/6) maps the lower half to 3, upper half to 5
    red = {r["x"]: r["x_qn"] for r in quantile_normalize(
        cur, "x", ref, ["g"], ref_max_per_group=2
    ).collect()}
    assert red == {11.0: 3.0, 22.0: 3.0, 33.0: 3.0,
                   44.0: 5.0, 55.0: 5.0, 66.0: 5.0}


def test_quantile_normalize_sketch_rejects_bad_m(spark):
    df = spark.createDataFrame([("g", 1.0)], ["g", "x"])
    with pytest.raises(ValueError, match="ref_max_per_group"):
        quantile_normalize(df, "x", df, ["g"], ref_max_per_group=0)


def test_ab_test_degenerate_experiments_report_null_not_error(spark):
    # zero variance in both arms -> NULL t/df/significant, no ANSI error
    const = spark.createDataFrame(
        [("a", 5.0, True), ("a", 5.0, False),
         ("b", 5.0, True), ("b", 5.0, True)],
        ["v", "m", "s"],
    )
    r = ab_test_report(const, "v", "m", "s").collect()[0]
    assert r["welch_t"] is None and r["welch_df"] is None
    assert r["significant"] is None
    # zero conversions in BOTH arms -> NULL prop_z, rates 0
    nosucc = spark.createDataFrame(
        [("a", 1.0, False), ("a", 2.0, False),
         ("b", 3.0, False), ("b", 5.0, False)],
        ["v", "m", "s"],
    )
    r = ab_test_report(nosucc, "v", "m", "s").collect()[0]
    assert r["prop_z"] is None
    assert r["rate_a"] == 0.0 and r["rate_b"] == 0.0
    assert r["welch_t"] is not None  # means still differ
    # single-sample arm -> var undefined -> NULL t, no error
    single = spark.createDataFrame(
        [("a", 1.0, True), ("b", 2.0, False), ("b", 3.0, False)],
        ["v", "m", "s"],
    )
    r = ab_test_report(single, "v", "m", "s").collect()[0]
    assert r["welch_t"] is None and r["welch_df"] is None


def test_ab_test_metric_only_schema(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0)], ["v", "m"]
    )
    out = ab_test_report(df, "v", "m")
    assert out.columns == [
        "variant_a", "variant_b", "n_a", "n_b", "mean_a", "mean_b",
        "mean_diff", "welch_t", "welch_df", "significant",
    ]
    assert out.count() == 1


def test_acf_duplicate_lags_deduped(spark):
    rows = []
    for h in range(8):
        for j in range(1 if h % 2 == 0 else 3):
            rows.append(("k", f"2024-01-01 {h:02d}:00:{j:02d}"))
    df = spark.createDataFrame(rows, ["k", "ts"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    once = acf_profile(df, ["k"], "ts", lags=[1]).collect()
    twice = acf_profile(df, ["k"], "ts", lags=[1, 1]).collect()
    assert len(twice) == 1
    assert twice[0]["acf"] == once[0]["acf"]
    assert twice[0]["n_pairs"] == once[0]["n_pairs"]


def test_concentration_all_null_group_emits_zero_row(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("z", None), ("z", None)], ["g", "x"]
    )
    rows = {r["g"]: r for r in concentration_report(df, ["g"], "x").collect()}
    assert rows["z"]["n"] == 0 and rows["z"]["n_null"] == 2
    assert rows["z"]["gini"] is None and rows["z"]["total"] is None


def test_acf_metric_series_mode(spark):
    # hourly metric levels 10,30,10,30,... -> same ACF as counts 1,3
    rows = []
    for h in range(10):
        v = 10.0 if h % 2 == 0 else 30.0
        rows.append(("k", f"2024-01-01 {h:02d}:00:00", v))
        rows.append(("k", f"2024-01-01 {h:02d}:30:00", None))  # ignored
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {r["lag"]: r for r in acf_profile(
        df, ["k"], "ts", lags=[1, 2], value_col="v", agg="avg"
    ).collect()}
    # mean 20, dev +-10: lag1 = -9/10, lag2 = +8/10
    assert out[1]["acf"] == pytest.approx(-0.9, abs=1e-6)
    assert out[2]["acf"] == pytest.approx(0.8, abs=1e-6)
    with pytest.raises(ValueError, match="unsupported agg"):
        acf_profile(df, ["k"], "ts", value_col="v", agg="median")


def test_acf_all_null_bucket_is_a_gap(spark):
    """A bucket whose metric values are ALL NULL must behave exactly
    like an EMPTY bucket: out of n_buckets, out of the moments, out of
    the lag pairs. The r9 advice bug: the NULL level stayed in
    n_buckets, inflating the variance denominator (_ss uses
    n_buckets) and biasing acf toward 0."""
    import numpy as np

    # hours 0,1,3,4 carry levels; hour 2's values are all NULL
    levels = {0: 5.0, 1: 9.0, 3: 2.0, 4: 8.0}
    rows = []
    for h in range(5):
        v = levels.get(h)  # None for hour 2
        rows.append(("k", f"2024-01-01 0{h}:00:00", v))
        rows.append(("k", f"2024-01-01 0{h}:30:00", None))
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"),
        F.col("v").cast("double").alias("v"),
    )
    out = {r["lag"]: r for r in acf_profile(
        df, ["k"], "ts", lags=[1], value_col="v", agg="max"
    ).collect()}
    r = out[1]
    # identical to physically deleting hour 2 from the series
    x = np.array(sorted(levels))  # bucket indexes 0,1,3,4
    v = np.array([levels[b] for b in sorted(levels)])
    mu = v.mean()
    ss = ((v - mu) ** 2).sum()
    pairs = [(i, j) for i in range(4) for j in range(4)
             if x[j] - x[i] == 1]  # (0,1) and (3,4)
    num = sum((v[i] - mu) * (v[j] - mu) for i, j in pairs)
    assert r["n_buckets"] == 4
    assert r["n_pairs"] == len(pairs) == 2
    assert r["acf"] == pytest.approx(num / ss, abs=1e-6)
