"""Bottom-k corpus-overlap sketch tests (operators/overlap.py):
determinism under repartition, exact regime below k, estimator accuracy
in the sketch regime, and the empty/disjoint edges."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.overlap import (
    bottom_k_sketch,
    corpus_overlap,
)


def _ids(spark, lo, hi, parts=4):
    return (
        spark.range(lo, hi, 1, parts)
        .select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    )


def test_sketch_deterministic_and_exact_below_k(spark):
    df = _ids(spark, 0, 50)
    s1 = bottom_k_sketch(df, "v", 64)
    s2 = bottom_k_sketch(df.repartition(13), "v", 64)
    assert s1 == s2 and len(s1) == 50  # below k: the full hashed value set
    # duplicates collapse: same value set -> same sketch
    s3 = bottom_k_sketch(df.union(df), "v", 64)
    assert s3 == s1
    with pytest.raises(ValueError, match="k must be"):
        bottom_k_sketch(df, "v", 1)


def test_overlap_exact_regime(spark):
    # |A|=300, |B|=300, |A∩B|=150 — k above every cardinality: all exact
    a, b = _ids(spark, 0, 300), _ids(spark, 150, 450)
    row = corpus_overlap(a, b, "v", k=1024).collect()[0]
    assert row["n_a_est"] == 300.0 and row["n_b_est"] == 300.0
    assert row["n_union_est"] == 450.0
    assert row["intersection_est"] == pytest.approx(150.0, abs=1e-6)
    assert row["jaccard_est"] == pytest.approx(round(150 / 450, 6))
    assert row["containment_a"] == pytest.approx(0.5)
    assert row["containment_b"] == pytest.approx(0.5)


def test_overlap_sketch_regime_accuracy_and_determinism(spark):
    # 4000 vs 4000 with 2000 shared; k=256 -> ~1/16 relative error scale
    a, b = _ids(spark, 0, 4000), _ids(spark, 2000, 6000)
    r1 = corpus_overlap(a, b, "v", k=256).collect()[0]
    r2 = corpus_overlap(a.repartition(9), b.repartition(3), "v", k=256).collect()[0]
    assert r1.asDict() == r2.asDict()  # partitioning holds no sway
    assert r1["n_a_est"] == pytest.approx(4000, rel=0.25)
    assert r1["jaccard_est"] == pytest.approx(1 / 3, rel=0.35)
    assert r1["intersection_est"] == pytest.approx(2000, rel=0.35)

    # disjoint corpora: zero everything
    z = corpus_overlap(_ids(spark, 0, 100), _ids(spark, 500, 600), "v", k=64)
    zr = z.collect()[0]
    assert zr["jaccard_est"] == 0.0 and zr["intersection_est"] == 0.0

    # empty side
    er = corpus_overlap(
        _ids(spark, 0, 100), _ids(spark, 0, 0), "v", k=64
    ).collect()[0]
    assert er["n_b_est"] == 0.0 and er["containment_a"] == 0.0


def test_overlap_from_sketches_incremental(spark):
    """Persisted-sketch composition: comparing stored sketches equals
    comparing the corpora directly, truncation compares mixed-k
    sketches, and malformed entries are refused."""
    from pyspark_data_quality_spark.operators.overlap import (
        overlap_from_sketches,
    )

    a, b = _ids(spark, 0, 300), _ids(spark, 150, 450)
    direct = corpus_overlap(a, b, "v", k=128).collect()[0]
    sa, sb = bottom_k_sketch(a, "v", 128), bottom_k_sketch(b, "v", 128)
    via = overlap_from_sketches(spark, sa, sb, 128).collect()[0]
    assert via.asDict() == direct.asDict()

    # mixed k: a k=256 sketch truncates to its bottom-128 exactly
    sa256 = bottom_k_sketch(a, "v", 256)
    mixed = overlap_from_sketches(spark, sa256, sb, 128).collect()[0]
    assert mixed.asDict() == direct.asDict()

    with pytest.raises(ValueError, match="md5-hex"):
        overlap_from_sketches(spark, ["xyz"], sb, 128)

    # upward k is invalid (a small-k sketch is indistinguishable from a
    # small corpus): declaring build_k makes the misuse loud
    with pytest.raises(ValueError, match="exceeds build_k"):
        overlap_from_sketches(spark, sa, sb, 256, build_k=128)
    # downward with build_k declared stays fine
    ok = overlap_from_sketches(
        spark, sa256, sb, 128, build_k=128
    ).collect()[0]
    assert ok.asDict() == direct.asDict()


def test_joinability_report_fk_direction(spark):
    """FK⊂PK containment reads ~1 in the FK→PK direction only; names
    key the report and must be unique."""
    from pyspark_data_quality_spark.operators.overlap import (
        joinability_report,
    )

    pk = _ids(spark, 0, 200)                      # all values
    fk = _ids(spark, 0, 120)                      # strict subset
    other = _ids(spark, 500, 700)                 # disjoint
    out = joinability_report(
        spark,
        [("fk", fk, "v"), ("pk", pk, "v"), ("other", other, "v")],
        k=256,
    ).collect()
    got = {(r["a"], r["b"]): r for r in out}
    assert len(got) == 6
    assert got[("fk", "pk")]["containment"] == 1.0
    assert got[("pk", "fk")]["containment"] == round(120 / 200, 6)
    assert got[("fk", "other")]["containment"] == 0.0
    # sorted containment-descending
    assert out[0]["containment"] == 1.0

    with pytest.raises(ValueError, match="duplicate"):
        joinability_report(spark, [("x", pk, "v"), ("x", fk, "v")])
    with pytest.raises(ValueError, match="at least 2"):
        joinability_report(spark, [("x", pk, "v")])
