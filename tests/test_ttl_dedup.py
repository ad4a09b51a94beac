"""TTL-bounded streaming dedup (streaming/ttl.py) on the Spark 4
arbitrary-state API. The end-to-end path needs the protobuf package
(transformWithState's state protocol); where it is absent the operator
must fail loud and early, and the e2e test skips — the same
dual-branch contract as the multimodal codec paths."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.streaming.ttl import (
    ROCKSDB_PROVIDER,
    _parse_duration_ms,
    dedup_with_ttl,
    ttl_dedup_confs,
)


def _protobuf_ok():
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_parse_duration_ms():
    assert _parse_duration_ms("500 milliseconds") == 500
    assert _parse_duration_ms("90 seconds") == 90_000
    assert _parse_duration_ms("10 minutes") == 600_000
    assert _parse_duration_ms("1 hour") == 3_600_000
    assert _parse_duration_ms("2 days") == 172_800_000
    for bad in ("", "fast", "10 fortnights", "-5 seconds"):
        with pytest.raises(ValueError):
            _parse_duration_ms(bad)


def test_ttl_dedup_confs_names_rocksdb():
    confs = ttl_dedup_confs()
    assert confs["spark.sql.streaming.stateStore.providerClass"] == (
        ROCKSDB_PROVIDER
    )
    assert "RocksDB" in ROCKSDB_PROVIDER


def test_dedup_with_ttl_validation(spark):
    batch = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="streaming"):
        dedup_with_ttl(batch, ["k"])
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="keys"):
        dedup_with_ttl(stream, [])


@pytest.mark.skipif(
    _protobuf_ok(), reason="protobuf present: the loud-failure branch is moot"
)
def test_dedup_with_ttl_fails_loud_without_protobuf(spark):
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ImportError, match="protobuf"):
        dedup_with_ttl(stream, ["value"])


@pytest.mark.skipif(
    not _protobuf_ok(), reason="protobuf absent in this environment"
)
def test_dedup_with_ttl_end_to_end(spark, tmp_path):
    """First sighting per key emits; in-batch repeats drop; state
    persists across availableNow runs via the checkpoint."""
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    for k, v in ttl_dedup_confs().items():
        spark.conf.set(k, v)
    try:
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k int, v string"
        ).coalesce(1).write.mode("append").parquet(src)

        def run(name):
            sdf = spark.readStream.schema("k int, v string").parquet(src)
            out = dedup_with_ttl(sdf, ["k"], ttl="1 hour")
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.table(name)

        t1 = run("ttl_t1")
        assert sorted(r.k for r in t1.collect()) == [1, 2]

        spark.createDataFrame(
            [(1, "x"), (3, "y")], "k int, v string"
        ).coalesce(1).write.mode("append").parquet(src)
        t2 = run("ttl_t2")
        # k=1 is in state from run 1 -> only k=3 is new
        assert sorted((r.k, r.v) for r in t2.collect()) == [(3, "y")]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
