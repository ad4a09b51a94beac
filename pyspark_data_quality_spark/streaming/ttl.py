"""TTL-bounded streaming dedup — the third point in the streaming-dedup
design space this package covers:

- ``dropDuplicates`` (streaming): exact, but state grows forever;
- ``dedup_within_watermark`` (windows.py): state bounded by EVENT-time
  lateness — needs an event-time column and only suppresses duplicates
  arriving within the watermark;
- ``dedup_with_ttl`` (here): state bounded by PROCESSING-time TTL —
  no event-time column required, the right tool when "duplicate" means
  "same key seen in the last N hours of wall clock" (retry storms,
  at-least-once upstreams, periodic re-sends).

Two implementations, one contract (first sighting within a sliding
``ttl`` emits; repeats drop; keys silent for a full ``ttl`` age out and
their next sighting emits again):

- ``impl='state'`` — ``applyInPandasWithState`` with a processing-time
  timeout. State per key is ONE long (last-seen batch timestamp); the
  re-emission decision compares the batch's processing time against it,
  so correctness never depends on when the engine fires the timeout —
  the timeout only REMOVES idle keys, bounding state at
  |keys active within ttl|. Runs on any state store provider and needs
  nothing beyond pyspark itself.
- ``impl='tws'`` — ``transformWithStateInPandas`` (Spark 4) with a
  native RocksDB TTL column family: aging happens inside the store
  (no timeout bookkeeping in Python) — the preferred path where its
  protobuf state protocol is available. Requires the RocksDB provider
  (:func:`ttl_dedup_confs` returns the conf to set).

``impl='auto'`` (default) picks ``tws`` when protobuf imports, else
``state`` — so the operator is executable everywhere and upgrades
itself on a standard Spark distro. Parity between the two is contract-
level (same first-sighting/TTL semantics); test both where protobuf
exists.

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
    """Session confs the ``impl='tws'`` path needs (set before starting
    the query): the RocksDB state store provider that backs native TTL
    state. The ``impl='state'`` path runs on any provider and needs no
    confs."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


def dedup_with_ttl(
    df: DataFrame,
    keys: list[str],
    *,
    ttl: str = "1 hour",
    output_mode: str = "append",
    impl: str = "auto",
) -> DataFrame:
    """First sighting of each key within a sliding processing-time
    ``ttl`` passes through; repeats are dropped; keys silent for a full
    ``ttl`` age out of state and their next sighting emits again.

    ``df`` must be a STREAMING DataFrame (use ``dropDuplicates(keys)``
    for batch). Within one micro-batch the first row of the key's
    arrival order wins — same contract as streaming dropDuplicates.
    The sliding TTL refreshes on every sighting; the emitted row schema
    is the input schema. ``impl``: ``'auto'`` (default — native
    ``'tws'`` where protobuf is available, portable ``'state'``
    otherwise), ``'state'``, or ``'tws'``.
    """
    if not keys:
        raise ValueError("dedup_with_ttl: keys must be non-empty")
    if not df.isStreaming:
        raise ValueError(
            "dedup_with_ttl: df must be streaming; use "
            "dropDuplicates(keys) on a batch DataFrame"
        )
    if impl not in ("auto", "state", "tws"):
        raise ValueError(f"dedup_with_ttl: unknown impl {impl!r}")
    ttl_ms = _parse_duration_ms(ttl)
    if impl == "auto":
        impl = "tws" if _protobuf_available() else "state"
    if impl == "tws":
        _require_protobuf()
        return _ttl_dedup_tws(df, keys, ttl_ms, output_mode)
    return _ttl_dedup_state(df, keys, ttl_ms, output_mode)


def _ttl_dedup_state(
    df: DataFrame, keys: list[str], ttl_ms: int, output_mode: str
) -> DataFrame:
    """Portable path: ``applyInPandasWithState`` + processing-time
    timeout. The emitted/suppressed decision is made from the stored
    last-seen batch timestamp (``getCurrentProcessingTimeMs`` — the
    batch's timestamp, stable across task retries), NOT from whether the
    timeout has fired: timeouts in this API are evaluated only when a
    batch runs, and a key receiving data in the same batch its deadline
    passed is delivered WITH the data (hasTimedOut=False) — so aging is
    re-checked inline and the timeout's only job is evicting idle keys.

    Trigger caveat: pending processing-time timers make the engine run a
    state-cleanup micro-batch on EVERY trigger, so the stream never
    reaches a quiescent point — a ``Trigger.AvailableNow`` run of this
    path never self-terminates, and ``processAllAvailable()`` never
    returns. Drive it with a normal trigger and await sink contents
    (or ``stop()`` on your own signal); a TTL'd dedup is a
    continuous-pipeline operator — run-to-completion over a finite batch
    input is exactly what ``dropDuplicates`` is for.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(f"`{c}` {fields[c]}" for c in df.columns)
    state_schema = "last_seen long"

    def fn(key: Any, pdfs: Iterator, state: Any) -> Iterator:
        if state.hasTimedOut:
            # idle for a full ttl: forget the key so its next sighting
            # emits again (and state size stays |active keys|)
            state.remove()
            return
        now = state.getCurrentProcessingTimeMs()
        last = state.get[0] if state.exists else None
        first = last is None or (now - last) >= ttl_ms
        # refresh the sliding TTL on every sighting, first or not
        state.update((now,))
        state.setTimeoutDuration(ttl_ms)
        if first:
            for pdf in pdfs:
                if len(pdf) > 0:
                    yield pdf.head(1)
                    break

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        output_mode,
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def _ttl_dedup_tws(
    df: DataFrame, keys: list[str], ttl_ms: int, output_mode: str
) -> DataFrame:
    """Native path: ``transformWithStateInPandas`` with a RocksDB TTL
    value state — aging is the store's job, no timestamps in Python.
    Requires protobuf (the Python↔JVM state protocol) and the RocksDB
    provider (:func:`ttl_dedup_confs`)."""
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


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _require_protobuf() -> None:
    """transformWithState's Python↔JVM state protocol rides protobuf
    (pyspark.sql.streaming.proto); without a working google.protobuf the
    query crashes at START with an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — fail loud and early
    here instead (same import-guard contract as multimodal/media.py's
    codec paths). Where protobuf is absent, ``impl='state'`` (or the
    default ``'auto'``) provides the same contract."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "dedup_with_ttl(impl='tws') needs the 'protobuf' package "
            "(transformWithStateInPandas state protocol); install "
            "protobuf, or use impl='state' (applyInPandasWithState — "
            "same contract, no extra dependency)"
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
