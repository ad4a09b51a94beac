"""Broadcast Bloom-filter membership + bloom-prefiltered incremental
dedup (operators/bloom.py)."""

import pytest
from pyspark.sql import Row, functions as F

from pyspark_data_quality_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_probe,
    dedup_against_bloom,
)
from pyspark_data_quality_spark.operators.dedup import dedup_against


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # ~9.6 bits/item at 1% fpp, k ~= 7
    assert 9000 <= m <= 10240
    assert k == 7
    # floor behavior
    m1, k1 = bloom_params(1, 0.5)
    assert m1 >= 64 and k1 >= 1
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives(spark):
    m, k = bloom_params(500, 0.01)
    vals = spark.range(500).select(F.concat(F.lit("v"), "id").alias("v"))
    bloom = bloom_build(vals, "v", num_bits=m, num_hashes=k)
    assert bloom.select(F.size("words")).first()[0] == (m + 63) // 64
    probed = bloom_probe(vals, bloom, "v")
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_fpp_in_range(spark):
    m, k = bloom_params(500, 0.01)
    vals = spark.range(500).select(F.concat(F.lit("v"), "id").alias("v"))
    bloom = bloom_build(vals, "v", num_bits=m, num_hashes=k)
    other = spark.range(5000).select(F.concat(F.lit("x"), "id").alias("v"))
    fp = bloom_probe(other, bloom, "v").filter("bloom_maybe").count()
    # expected ~1%; generous bound, deterministic hashes so no flake
    assert fp / 5000 < 0.05


def test_bloom_null_values_roundtrip(spark):
    # NULL hashes to the deterministic seed-only position set: a bloom
    # built over a set containing NULL reports NULL as maybe-present,
    # and one built without NULL (usually) reports it absent.
    m, k = bloom_params(100, 0.01)
    with_null = spark.createDataFrame(
        [Row(v="a"), Row(v=None), Row(v="b")]
    )
    bloom = bloom_build(with_null, "v", num_bits=m, num_hashes=k)
    got = {
        r.v: r.bloom_maybe
        for r in bloom_probe(with_null, bloom, "v").collect()
    }
    assert got["a"] and got["b"] and got[None]


def test_bloom_probe_column_collision_raises(spark):
    m, k = bloom_params(10, 0.1)
    vals = spark.range(10).select(F.col("id").cast("string").alias("words"))
    bloom = bloom_build(vals, "words", num_bits=m, num_hashes=k)
    with pytest.raises(ValueError, match="collide"):
        bloom_probe(vals, bloom, "words")


def test_bloom_probe_self_describing(spark):
    # omitting num_bits/num_hashes reads them from the bloom row
    m, k = bloom_params(200, 0.01)
    vals = spark.range(200).select(F.concat(F.lit("v"), "id").alias("v"))
    bloom = bloom_build(vals, "v", num_bits=m, num_hashes=k)
    probed = bloom_probe(vals, bloom, "v", num_bits=None, num_hashes=None)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_empty_reference(spark):
    m, k = 640, 3
    empty = spark.range(0).select(F.col("id").cast("string").alias("v"))
    bloom = bloom_build(empty, "v", num_bits=m, num_hashes=k)
    vals = spark.range(50).select(F.concat(F.lit("v"), "id").alias("v"))
    assert bloom_probe(vals, bloom, "v").filter("bloom_maybe").count() == 0


def test_bloom_probe_empty_bitmap_frame_raises(spark):
    """A ZERO-ROW bloom frame (missing/never-written bitmap, NOT a bloom
    built over an empty reference) must fail loud on BOTH param paths —
    a crossJoin would otherwise silently drop every probe row. The
    metadata path raises at call time (it collects the row anyway); the
    explicit-params path stays a LAZY plan builder, so its guard is the
    in-plan raise_error firing at execution."""
    no_bitmap = spark.range(0).select(
        F.array(F.col("id")).alias("words"),  # schema-shaped, zero rows
        F.lit(640).alias("num_bits"),
        F.lit(3).alias("num_hashes"),
    )
    vals = spark.range(5).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="empty"):
        bloom_probe(vals, no_bitmap, "v")  # metadata path: call time
    probed = bloom_probe(vals, no_bitmap, "v", num_bits=640, num_hashes=3)
    with pytest.raises(Exception, match="EMPTY"):
        probed.collect()  # explicit path: loud at execution, not silent


@pytest.mark.parametrize("mode", ["survivors", "dups"])
def test_dedup_against_bloom_matches_exact(spark, sf_dir, mode):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter("doc_id % 3 != 0")
    ref = docs.filter("doc_id % 2 = 0")
    exact = sorted(
        r.doc_id
        for r in dedup_against(batch, ref, "text", mode=mode).collect()
    )
    bloom = sorted(
        r.doc_id
        for r in dedup_against_bloom(
            batch, ref, "text", mode=mode, expected_items=200, fpp=0.01
        ).collect()
    )
    assert exact == bloom
    assert len(exact) > 0


def test_dedup_against_bloom_approximate_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter("doc_id % 3 != 0")
    ref = docs.filter("doc_id % 2 = 0")
    exact_survivors = dedup_against(batch, ref, "text").count()
    approx = dedup_against_bloom(
        batch,
        ref,
        "text",
        expected_items=200,
        fpp=0.01,
        exact_verify=False,
    ).count()
    # no false negatives => approx survivors is a subset of the exact
    # survivors; at 1% fpp it can only be slightly smaller
    assert approx <= exact_survivors
    assert approx >= int(exact_survivors * 0.9)


def test_dedup_against_bloom_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="expected_items"):
        dedup_against_bloom(docs, docs, "text")
    with pytest.raises(ValueError, match="mode"):
        dedup_against_bloom(
            docs, docs, "text", mode="nope", expected_items=10
        )


def test_bloom_build_validation(spark):
    vals = spark.range(5).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        bloom_build(vals, "v", num_bits=32, num_hashes=1)
    with pytest.raises(ValueError):
        bloom_build(vals, "v", num_bits=640, num_hashes=0)


def test_bloom_probe_param_mismatch_fails_loud(spark):
    """Regression: probing with parameters that disagree with the
    bitmap's metadata used to silently void the no-false-negative
    contract; it now fails the job."""
    m, k = bloom_params(100, 0.01)
    vals = spark.range(100).select(F.concat(F.lit("v"), "id").alias("v"))
    bloom = bloom_build(vals, "v", num_bits=m, num_hashes=k)
    bad = bloom_probe(vals, bloom, "v", num_bits=m * 2, num_hashes=k)
    with pytest.raises(Exception, match="do not match"):
        bad.collect()


def test_dedup_against_bloom_temp_column_clash_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_fp = docs.withColumn("_fp", F.lit(1))
    with pytest.raises(ValueError, match="_fp"):
        dedup_against_bloom(with_fp, docs, "text", expected_items=10)


def test_bloom_probe_rejects_multirow_bitmap(spark):
    """A bitmap parquet accidentally written twice used to silently
    DOUBLE every probe row through the lit(True) join; it now fails
    loud in-plan."""
    from pyspark_data_quality_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    ref = spark.createDataFrame([("a",), ("b",)], ["v"])
    bm = bloom_build(ref, "v", num_bits=256, num_hashes=3)
    doubled = bm.unionByName(bm)
    probe = bloom_probe(
        spark.createDataFrame([("a",)], ["v"]), doubled, "v",
        num_bits=256, num_hashes=3,
    )
    with pytest.raises(Exception, match="MULTIPLE rows|bloom_probe"):
        probe.collect()


def test_dedup_against_bloom_autok_matches_caller_bits(spark):
    """num_hashes auto-sizing must target the caller's num_bits, not
    the auto bitmap size: probing a deliberately small bitmap with the
    auto k saturates it far beyond the requested fpp."""
    import math

    from pyspark_data_quality_spark.operators.bloom import (
        dedup_against_bloom,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(40)], ["doc_id", "text"]
    )
    batch = docs.filter("doc_id >= 20")
    ref = docs.filter("doc_id < 20")
    # tiny bitmap (2 bits/item): optimal k = round(2*ln2) = 1, and the
    # exact-verify path must still return the exact survivor set
    out = dedup_against_bloom(
        batch, ref, "text", num_bits=64, expected_items=20
    )
    assert sorted(r["doc_id"] for r in out.collect()) == list(
        range(20, 40)
    )
