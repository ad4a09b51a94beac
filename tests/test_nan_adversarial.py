"""NaN/±Infinity-adversarial sweep (r12).

The NULL-adversarial property sweep (test_properties.py) misses a
separate poisoning class: Spark's avg/stddev/percentile/min/max skip
NULLs but NOT NaN, and its ordering treats NaN as the GREATEST value.
Measured consequences before the `functions/expr.finite` guards: ONE
NaN row made flag_outliers(zscore) flag EVERY row (mean=NaN -> every
score NaN -> NaN > threshold is true); ONE NaN/Inf row in a drift
REFERENCE collapsed numeric_drift's histogram to a single bin with
PSI 0 — masking the drift outright.

Contract pinned here: statistics are computed over FINITE values only;
the non-finite rows themselves still behave as anomalous (outlier
flags fire on exactly them) or as missing/edge mass per the operator's
documented convention (NaN out of histograms and ECDFs, ±Inf clamped
into edge bins).
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def clean(spark):
    return spark.createDataFrame(
        [Row(i=i, x=float(i % 7)) for i in range(40)]
    )


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [Row(i=i, x=float(i % 7)) for i in range(40)] + [
        Row(i=100, x=NAN),
        Row(i=101, x=INF),
        Row(i=102, x=-INF),
        Row(i=103, x=None),
    ]
    return spark.createDataFrame(rows)


def test_flag_outliers_not_poisoned(spark, dirty):
    from pyspark_data_quality_spark.operators.repair import flag_outliers

    for method in ("zscore", "iqr"):
        out = flag_outliers(dirty, "x", method=method).collect()
        flagged = sorted(r["i"] for r in out if r["is_outlier"])
        assert flagged == [100, 101, 102], (method, flagged)


def test_numeric_drift_survives_dirty_reference(spark, clean, dirty):
    from pyspark_data_quality_spark.operators.drift import numeric_drift

    # dirty REFERENCE: bounds must come from its finite values, so the
    # clean current side still spreads over multiple bins
    bins = numeric_drift(clean, dirty, "x").collect()
    assert len(bins) > 3
    assert all(not math.isnan(r["psi_term"]) for r in bins)
    # dirty CURRENT side: NaN drops, ±Inf clamps into the edge bins —
    # total current mass accounts for 42 of the 44 rows (NaN + NULL out)
    bins2 = numeric_drift(dirty, clean, "x").collect()
    assert abs(sum(r["p_cur"] for r in bins2) - 1.0) < 1e-6


def test_ks_and_wasserstein_drop_nan_keep_inf(spark, clean, dirty):
    from pyspark_data_quality_spark.operators.drift import (
        ks_by_group,
        ks_statistic,
        wasserstein_1d,
    )

    r = ks_statistic(dirty, clean, "x").collect()[0]
    assert r["n_cur"] == 42  # 40 finite + 2 Inf; NaN and NULL excluded
    assert not math.isnan(r["ks"]) and 0.0 <= r["ks"] <= 1.0
    w = wasserstein_1d(dirty, clean, "x").collect()[0]
    assert not math.isnan(w["w1"])
    g = ks_by_group(
        dirty.withColumn("g", F.lit("a")),
        clean.withColumn("g", F.lit("a")),
        "x",
        "g",
    ).collect()[0]
    assert g["n_cur"] == 42 and not math.isnan(g["ks"])


def test_winsorize_bounds_finite(spark, dirty):
    from pyspark_data_quality_spark.operators.repair import winsorize

    for exact in (False, True):
        got = winsorize(
            dirty, ["x"], exact=exact, flag_col="clamped"
        ).collect()
        by_i = {r["i"]: r for r in got}
        vals = [r["x"] for r in got if r["x"] is not None]
        finite_vals = [v for v in vals if not math.isnan(v)]
        # ±Inf rows clamp into the finite band...
        assert max(finite_vals) < INF and min(finite_vals) > -INF
        # ...but NaN passes through UN-clamped and NULL stays NULL
        # (greatest/least would otherwise rewrite them to the bounds —
        # damage must surface, not be repaired into plausible values),
        # and neither counts as a clamped row.
        assert math.isnan(by_i[100]["x"]) and by_i[100]["clamped"] == 0
        assert by_i[103]["x"] is None and by_i[103]["clamped"] == 0
        # the ±Inf rows DO count as clamped
        assert by_i[101]["clamped"] == 1 and by_i[102]["clamped"] == 1


def test_impute_and_normalize_not_poisoned(spark, dirty):
    from pyspark_data_quality_spark.operators.repair import (
        impute,
        normalize_columns,
    )

    filled = {r["i"]: r["x"] for r in impute(dirty, ["x"]).collect()}
    assert filled[103] is not None and math.isfinite(filled[103])
    normed = normalize_columns(dirty, ["x"], method="zscore").collect()
    clean_scaled = [
        r["x_norm"] for r in normed if r["i"] < 100
    ]
    assert all(v is not None and math.isfinite(v) for v in clean_scaled)


def test_mahalanobis_not_poisoned(spark, dirty):
    from pyspark_data_quality_spark.operators.repair import (
        mahalanobis_outliers,
    )

    d2 = dirty.withColumn("y", (F.col("i") * 37 % 11).cast("double"))
    out = mahalanobis_outliers(d2, ["x", "y"]).collect()
    flagged = sorted(r["i"] for r in out if r["is_outlier"])
    # the clean rows must not be flagged; the non-finite rows must be
    assert all(i >= 100 for i in flagged) and 100 in flagged


def test_quantile_stats_nan_immune(spark, dirty):
    from pyspark_data_quality_spark.operators.profile import (
        value_histogram_stats,
    )

    rows = value_histogram_stats(
        dirty, ["x"], quantiles=(0.5, 0.95)
    ).collect()
    by_stat = {r["stat"]: r["value"] for r in rows}
    assert not math.isnan(by_stat["q0.5"])
    assert not math.isnan(by_stat["q0.95"])
    # NaN still shows up in the DISTINCT count (visible, not hidden)
    assert by_stat["distinct_count"] >= 8


def test_trailing_anomaly_detectors_not_poisoned(spark):
    from pyspark_data_quality_spark.operators.anomaly import (
        iqr_anomalies,
        seasonal_anomalies,
        zscore_anomalies,
    )

    rows = [Row(t=i, m=float(10 + (i % 3))) for i in range(48)]
    rows[10] = Row(t=10, m=NAN)   # damage
    rows[40] = Row(t=40, m=50.0)  # genuine spike
    df = spark.createDataFrame(rows)
    # pre-guard behavior: every row whose trailing window contained the
    # NaN (rows 11..22) was flagged too — NaN baselines compare greater
    # than any threshold. Post-guard: exactly the damage and the spike.
    z = zscore_anomalies(df, "m", ["t"], lookback=12).collect()
    assert sorted(r["t"] for r in z if r["is_anomaly"]) == [10, 40]
    q = iqr_anomalies(df, "m", ["t"], lookback=12).collect()
    assert sorted(r["t"] for r in q if r["is_anomaly"]) == [10, 40]
    # seasonal needs same-phase variance (a zero-stddev baseline never
    # flags, by contract) — alternate each phase between two levels
    rows2 = [
        Row(t=i, m=float(10 + (i % 3) + (0.5 if (i // 3) % 2 else 0.0)))
        for i in range(48)
    ]
    rows2[10] = Row(t=10, m=NAN)
    rows2[40] = Row(t=40, m=50.0)
    df2 = spark.createDataFrame(rows2)
    s = seasonal_anomalies(
        df2, "m", ["t"], period=3, lookback_cycles=6, min_cycles=2,
        threshold=3.0,
    ).collect()
    flagged = sorted(r["t"] for r in s if r["is_anomaly"])
    assert 40 in flagged and all(f in (10, 40) for f in flagged)


def test_ab_test_arm_not_poisoned(spark):
    from pyspark_data_quality_spark.operators.abtest import ab_test_report

    ab = spark.createDataFrame(
        [Row(v="a", x=float(i % 5)) for i in range(30)]
        + [Row(v="b", x=float(i % 5) + 0.5) for i in range(30)]
        + [Row(v="a", x=NAN)]
    )
    r = ab_test_report(ab, "v", "x").collect()[0]
    # a NaN metric row drops from the arm like a NULL row: the mean
    # stays finite and a NaN Welch t can no longer read as significant
    assert r["n_a"] == 30 and math.isfinite(r["mean_a"])
    assert r["welch_t"] is not None and math.isfinite(r["welch_t"])
    assert r["significant"] is False


def test_streaming_batch_faces_not_poisoned(spark):
    """The BATCH faces of streaming_zscore/streaming_cusum must mask NaN
    exactly like their streaming faces (~np.isnan): before the r13 fix a
    single NaN latched the trailing statistics (zscore) or both
    cumulative sums (CUSUM) at NaN, and NaN compares greater than any
    threshold — every subsequent row alarmed forever."""
    from pyspark_data_quality_spark.streaming import (
        streaming_cusum,
        streaming_zscore,
    )

    rows = [
        Row(k="a", ts=float(i), x=(NAN if i == 7 else 10.0))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows)

    z = streaming_zscore(df, ["k"], "x", "ts", min_periods=3).collect()
    by_ts = {r["ts"]: r for r in sorted(z, key=lambda r: r["ts"])}
    # a flat series must never alarm, before or after the NaN
    assert not any(r["is_anomaly"] for r in z)
    # the NaN row itself passes through unscored
    assert by_ts[7.0]["zscore"] is None
    # rows after the NaN keep finite statistics (zscore defined = 0/0
    # guarded to NULL by try_divide on a zero-std flat series)
    assert all(
        r["zscore"] is None or not math.isnan(r["zscore"]) for r in z
    )

    c = streaming_cusum(
        df, ["k"], "x", "ts", target=10.0, slack=0.1, threshold=2.0
    ).collect()
    assert not any(r["is_alarm"] for r in c)
    assert all(not math.isnan(r["s_pos"]) for r in c)
    # and a REAL shift after the NaN still alarms (the mask must not
    # blind the detector)
    shifted = spark.createDataFrame(
        rows + [Row(k="a", ts=float(i), x=20.0) for i in range(16, 22)]
    )
    c2 = streaming_cusum(
        shifted, ["k"], "x", "ts", target=10.0, slack=0.1, threshold=2.0
    ).collect()
    assert any(r["is_alarm"] for r in c2)


def test_ann_paths_not_poisoned_by_nonfinite_vectors(spark):
    """One Inf/NaN corpus vector must not become the #1 neighbor of
    every query: a non-finite norm makes the cosine NaN, and Spark
    ranks NaN above every real double in DESC order. The guard maps
    non-finite similarities to NULL (sorted last); damaged QUERY
    vectors are dropped by the PQ batch collector."""
    import numpy as np

    from pyspark_data_quality_spark.operators.similarity import (
        brute_force_topk,
        pca_apply,
        pca_fit,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.randn(8)])
        for i in range(30)
    ]
    rows.append(Row(vec_id=100, embedding=[INF] * 8))
    rows.append(Row(vec_id=101, embedding=[NAN] + [1.0] * 7))
    corpus = spark.createDataFrame(rows)
    queries = spark.createDataFrame(
        [Row(query_id=0, query_vec=rows[0]["embedding"])]
    )

    top = brute_force_topk(corpus, queries, k=5).collect()
    ranked = [r["neighbor_id"] for r in top]
    assert 100 not in ranked and 101 not in ranked
    assert all(r["cosine"] is not None for r in top)
    # the damaged vectors surface as NULL cosine, not as neighbors
    assert top[0]["neighbor_id"] == 0  # self-match stays #1

    # PQ: training ignores the damaged vectors; a NaN query is dropped
    books = train_pq_codebooks(
        corpus, num_subvectors=2, codebook_size=8, sample_size=64
    )
    codes = pq_encode(corpus, codebooks=books)
    t = pq_topk(codes, queries, codebooks=books, k=5).collect()
    assert all(not math.isnan(r["score"]) for r in t)
    bad_q = spark.createDataFrame(
        [Row(query_id=9, query_vec=[NAN] * 8)]
    )
    with pytest.raises(ValueError, match="finite"):
        pq_topk(codes, bad_q, codebooks=books, k=5)

    # PCA: the damaged vectors are excluded from the moments instead of
    # surfacing as an eigensolver LinAlgError after the full pass
    model = pca_fit(corpus, vec_col="embedding", dim_out=3)
    assert all(math.isfinite(v) for v in model["mean"])
    # and a model/column dimensionality mismatch fails loud
    with pytest.raises(ValueError, match="dimension"):
        pca_apply(
            corpus.select(
                "vec_id", F.slice("embedding", 1, 4).alias("embedding")
            ),
            model,
        )
