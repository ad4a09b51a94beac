"""Runtime plan telemetry (plans/telemetry.py): the scale contracts the
docstrings claim, asserted against the REAL executed-plan accumulators."""

from pyspark.sql import functions as F

from pyspark_data_quality_spark.plans.telemetry import (
    harvest_plan_metrics,
    measured_collect,
    summarize_metrics,
)


def test_harvest_walks_aqe_and_stages(spark):
    df = spark.range(10_000).groupBy((F.col("id") % 7).alias("k")).count()
    rows, metrics = measured_collect(df)
    assert len(rows) == 7
    names = [m["node"] for m in metrics]
    assert "Exchange" in names and "HashAggregate" in names
    s = summarize_metrics(metrics)
    # partial aggregation collapsed 10k rows to <= partitions*7 partials
    assert 0 < s["shuffle_records_written"] <= 4 * 7
    assert 0 < s["shuffle_bytes_written"] < 10_000


def test_exact_dedup_shuffles_hashes_not_documents(spark, sf_dir):
    """The dedup docstrings' core scale claim, proven at runtime: the
    shuffled bytes are a small multiple of 8 bytes/doc (fingerprints +
    ids + framing), orders of magnitude under the text bytes."""
    from pyspark_data_quality_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    n_docs = docs.count()

    out = exact_dedup(docs, "text", "doc_id")
    rows, metrics = measured_collect(out)
    s = summarize_metrics(metrics)
    assert len(rows) > 0
    assert s["shuffle_bytes_written"] > 0
    # generous framing allowance: 64 bytes per doc ≈ 8x the fingerprint
    assert s["shuffle_bytes_written"] <= 64 * n_docs
    assert s["shuffle_bytes_written"] < text_bytes / 3


def test_broadcast_side_is_bounded(spark, sf_dir):
    """A 1-row stats broadcast must ship KBs, not the table."""
    from pyspark_data_quality_spark.operators.repair import winsorize

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice"
    )
    w = winsorize(li, ["l_extendedprice"], lower=0.05, upper=0.95)
    rows, metrics = measured_collect(w.limit(50))
    s = summarize_metrics(metrics)
    assert len(rows) == 50
    assert 0 < s["broadcast_bytes"] < 64 * 1024
    assert s["spill_bytes"] == 0
