"""Table loading for the driver's parquet fixtures (TESTDATA.md).

At test scale these are plain parquet reads; the same call shape works at
100 TB because everything stays declarative: column pruning and predicate
pushdown reach the parquet scan untouched, and partition discovery is
Spark's. Nothing here collects or caches eagerly.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextlib.contextmanager
def _scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of the block, then restore the
    prior value (or unset). Safe for parquet schema-conversion confs: the
    conversion happens when ``spark.read.parquet`` resolves the schema, so
    restoring immediately afterwards does not affect later actions on the
    returned DataFrame (verified empirically — see tests/test_io.py)."""
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Bring ``ts`` to a session-timezone TIMESTAMP whatever the fixture's
    physical parquet type was:

    - TIMESTAMP(NANOS) read under ``nanosAsLong`` -> bigint nanos, which
      become a microsecond timestamp;
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ under
      Spark's default ``inferTimestampNTZ``, cast to TIMESTAMP (the
      session zone is UTC throughout this engine, so the instant is
      preserved). NTZ matters: watermarks/windows on streams REQUIRE the
      zoned type ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as TIMESTAMP(NANOS) parquet — which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]) unless the
    ``nanosAsLong`` legacy conf reads it as bigint nanos — and as plain
    TIMESTAMP(MICROS) NTZ. :func:`normalize_event_ts` folds both to a
    session-zone TIMESTAMP. The conf is scoped to the read (set, then
    restored), so other nanos-typed parquet reads in the same session
    still fail loudly rather than silently coming back as bigint.
    """
    base = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        with _scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
            df = spark.read.parquet(f"{base}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming source over a directory of events parquet files (same
    nanos handling as :func:`load_table`; schema pinned from a batch footer
    read, as readStream requires an explicit schema).

    Unlike :func:`load_table`, the ``nanosAsLong`` conf deliberately stays
    set on the session: Structured Streaming captures session confs when
    the query *starts*, and each microbatch re-reads parquet footers, so
    restoring the conf here would crash the stream at runtime. This is the
    one documented session-wide side effect of the streaming path.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    df = spark.readStream.schema(schema).parquet(events_dir)
    return normalize_event_ts(df)


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so rules/queries can use SQL."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
