"""Recommended SparkSession configuration for this engine.

Nothing here is required — every operator works on a vanilla session —
but these are the knobs the operators are designed around, collected in
one place so a deployment starts from the right defaults instead of
rediscovering them. All values are plain Spark confs (public API).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Conf -> (value, why). The rationale strings double as documentation.
RECOMMENDED_CONFS: dict[str, tuple[str, str]] = {
    "spark.sql.adaptive.enabled": (
        "true",
        "AQE re-plans at runtime: coalesces small shuffle partitions, "
        "converts sort-merge to broadcast when a side turns out small, "
        "and splits skewed join partitions — all shapes this engine emits",
    ),
    "spark.sql.adaptive.skewJoin.enabled": (
        "true",
        "power-law keys are the norm in event/web data; the diff/join "
        "operators rely on AQE splitting hot partitions",
    ),
    "spark.sql.session.timeZone": (
        "UTC",
        "freshness/rollup/window operators emit epoch casts; a fixed zone "
        "keeps them reproducible across clusters",
    ),
    "spark.sql.execution.arrow.maxRecordsPerBatch": (
        "2048",
        "Arrow batch size for the pandas-UDF kernels (minhash/simhash/"
        "text profile). Lower it (~256) for multimodal payload columns: "
        "10k rows x 1 MB binaries in one batch is an executor OOM",
    ),
    "spark.sql.parquet.aggregatePushdown": (
        "true",
        "count/min/max-only profiles can be answered from parquet footers",
    ),
    "spark.sql.ansi.enabled": (
        "true",
        "the engine is ANSI-clean (try_divide/try_cast everywhere a "
        "failure is data-dependent); keeping ANSI on makes genuine logic "
        "errors loud instead of silently NULL",
    ),
}


def build_session(
    app_name: str = "pyspark-dq-engine",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or extend) a session with the recommended confs.

    ``shuffle_partitions`` should track total executor cores at small
    scale and ~2-3x total cores at 100 TB scale (AQE coalesces the
    excess; too FEW partitions cannot be split except by skew handling).
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, (v, _why) in RECOMMENDED_CONFS.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
