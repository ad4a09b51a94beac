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


#: Divisor bringing a bigint in the given unit down to microseconds.
_BIGINT_TS_UNITS = {"ns": 1000, "us": 1, "ms": None, "s": None}


def normalize_event_ts(df: DataFrame, *, bigint_unit: str = "ns") -> DataFrame:
    """Bring ``ts`` to a session-timezone TIMESTAMP whatever the fixture's
    physical parquet type was:

    - a bigint ``ts`` is interpreted per ``bigint_unit`` — default ``"ns"``
      because the only sanctioned way a bigint ts reaches this helper is a
      TIMESTAMP(NANOS) parquet read under ``nanosAsLong`` (see
      :func:`load_table`). A fixture shipping ts as plain INT64 epoch
      micros/millis/seconds must pass ``bigint_unit="us"|"ms"|"s"``
      explicitly, or the values would be silently divided by 1000;
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ under
      Spark's default ``inferTimestampNTZ``, cast to TIMESTAMP. The cast
      interprets the NTZ wall-clock in the SESSION timezone, so it
      preserves the instant only under the engine's pinned UTC session —
      asserted here, because a caller mirroring a tz-flipping test would
      otherwise silently shift every instant. NTZ matters: watermarks/
      windows on streams REQUIRE the zoned type
      ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        if bigint_unit not in _BIGINT_TS_UNITS:
            raise ValueError(
                f"normalize_event_ts: bigint_unit must be one of "
                f"{sorted(_BIGINT_TS_UNITS)}, got {bigint_unit!r}"
            )
        if bigint_unit == "ms":
            return df.withColumn("ts", F.timestamp_millis(F.col("ts")))
        if bigint_unit == "s":
            return df.withColumn("ts", F.timestamp_seconds(F.col("ts")))
        div = _BIGINT_TS_UNITS[bigint_unit]
        expr = F.expr(f"ts div {div}") if div != 1 else F.col("ts")
        return df.withColumn("ts", F.timestamp_micros(expr))
    if dt == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z"):
            raise ValueError(
                "normalize_event_ts: casting TIMESTAMP_NTZ to TIMESTAMP is "
                f"session-timezone-dependent and the session is {tz!r}, not "
                "UTC. Set spark.sql.session.timeZone=UTC (the engine-wide "
                "contract) before loading events."
            )
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


def load_events_batch(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch read of an events directory with the same nanos handling and
    ts normalization as :func:`load_table` — the order-independent way for
    a test (or a stream-vs-batch parity check) to read the comparison
    side, instead of a raw ``spark.read.parquet`` that only works if an
    earlier streaming load happened to leave ``nanosAsLong`` set."""
    with _scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
        df = spark.read.parquet(events_dir)
    return normalize_event_ts(df)


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
