"""TTL-bounded streaming dedup on the arbitrary-state API
(``transformWithStateInPandas``, Spark 4) — the third point in the
streaming-dedup design space this package covers:

- ``dropDuplicates`` (streaming): exact, but state grows forever;
- ``dedup_within_watermark`` (windows.py): state bounded by EVENT-time
  lateness — needs an event-time column and only suppresses duplicates
  arriving within the watermark;
- ``dedup_with_ttl`` (here): state bounded by PROCESSING-time TTL —
  no event-time column required, the right tool when "duplicate" means
  "same key seen in the last N hours of wall clock" (retry storms,
  at-least-once upstreams, periodic re-sends).

State is one RocksDB value per key with a sliding TTL (refreshed on
every sighting), so steady-state size is |keys active within TTL|, not
|keys ever seen|. Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``...state.RocksDBStateStoreProvider``) — the TTL column family is a
RocksDB feature; :func:`ttl_dedup_confs` returns the confs to set.

Batch face: plain ``dropDuplicates(keys)`` (TTL is meaningless when the
whole input is one batch); parity asserted in tests for the
first-sighting-wins contract.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def ttl_dedup_confs() -> dict[str, str]:
    """Session confs ``dedup_with_ttl`` needs (set before starting the
    query): the RocksDB state store provider that backs TTL state."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


def dedup_with_ttl(
    df: DataFrame,
    keys: list[str],
    *,
    ttl: str = "1 hour",
    output_mode: str = "append",
) -> DataFrame:
    """First sighting of each key within a sliding processing-time
    ``ttl`` passes through; repeats are dropped; keys silent for a full
    ``ttl`` age out of state and their next sighting emits again.

    ``df`` must be a STREAMING DataFrame (use ``dropDuplicates(keys)``
    for batch). Within one micro-batch the first row of the key's
    arrival order wins — same contract as streaming dropDuplicates.
    State per key is a single byte-row with TTL, refreshed on every
    sighting (sliding); the emitted row schema is the input schema.
    """
    if not keys:
        raise ValueError("dedup_with_ttl: keys must be non-empty")
    if not df.isStreaming:
        raise ValueError(
            "dedup_with_ttl: df must be streaming; use "
            "dropDuplicates(keys) on a batch DataFrame"
        )
    _require_protobuf()
    ttl_ms = _parse_duration_ms(ttl)
    out_schema = df.schema

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _FirstSighting(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "seen byte", ttlDurationMs=ttl_ms
            )

        def handleInputRows(
            self, key: Any, rows: Iterator, timerValues: Any
        ) -> Iterator:
            first_time = self._seen.get() is None
            # refresh the sliding TTL on every sighting, first or not
            self._seen.update((1,))
            if first_time:
                for pdf in rows:
                    if len(pdf) > 0:
                        yield pdf.head(1)
                        break

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_FirstSighting(),
        outputStructType=out_schema,
        outputMode=output_mode,
        timeMode="ProcessingTime",
    )


def _require_protobuf() -> None:
    """transformWithState's Python↔JVM state protocol rides protobuf
    (pyspark.sql.streaming.proto); without a working google.protobuf the
    query crashes at START with an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — fail loud and early
    here instead (same import-guard contract as multimodal/media.py's
    codec paths). The operator is fully functional wherever
    ``protobuf`` is installed (it ships with standard Spark distros)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "dedup_with_ttl needs the 'protobuf' package "
            "(transformWithStateInPandas state protocol); install "
            "protobuf, or use dedup_within_watermark / "
            "dropDuplicatesWithinWatermark on event-time streams"
        ) from e


def _parse_duration_ms(s: str) -> int:
    """'90 seconds' / '10 minutes' / '1 hour' / '500 milliseconds' →
    milliseconds (the subset of Spark's duration grammar this needs)."""
    parts = s.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"dedup_with_ttl: cannot parse ttl {s!r}")
    qty = float(parts[0])
    unit = parts[1].rstrip("s")
    scale = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }.get(unit)
    if scale is None or qty <= 0:
        raise ValueError(f"dedup_with_ttl: cannot parse ttl {s!r}")
    return int(qty * scale)
