"""TTL-bounded streaming dedup (streaming/ttl.py).

The portable ``impl='state'`` path (applyInPandasWithState +
processing-time timeout) runs end-to-end HERE — cross-micro-batch
suppression and TTL-expiry re-emission are asserted against real
checkpointed streams. E2e assertions are timing-robust by construction:
suppression uses a ttl far above any plausible test-runner latency, and
expiry only needs a LOWER bound on elapsed time (sleep >= ttl). The
timing-sensitive sliding-refresh semantics are pinned deterministically
at the unit level with a fake GroupState. The native ``impl='tws'``
path needs the protobuf package (transformWithState's state protocol);
where it is absent the operator must fail loud and early when asked for
it explicitly, and ``impl='auto'`` must silently pick the portable path
— the same dual-branch contract as the multimodal codec paths.
"""

import os
import time

import pytest

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
    with pytest.raises(ValueError, match="impl"):
        dedup_with_ttl(stream, ["value"], impl="magic")


@pytest.mark.skipif(
    _protobuf_ok(), reason="protobuf present: the loud-failure branch is moot"
)
def test_dedup_with_ttl_tws_fails_loud_without_protobuf(spark):
    """Asking for the native path explicitly without its dependency must
    raise at call time; 'auto' must NOT raise (it falls back)."""
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ImportError, match="protobuf"):
        dedup_with_ttl(stream, ["value"], impl="tws")
    out = dedup_with_ttl(stream, ["value"])  # auto -> state, no raise
    assert out.isStreaming


class _FakeState:
    """Minimal stand-in for pyspark's GroupState: just enough surface for
    _ttl_dedup_state's fn — lets the sliding-TTL arithmetic be pinned at
    exact, simulated batch timestamps (the e2e tests can't control the
    engine clock)."""

    def __init__(self, now_ms, value=None, has_timed_out=False):
        self._now = now_ms
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentProcessingTimeMs(self):
        return self._now

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _fn_under_test(spark):
    """Capture the inner applyInPandasWithState function by intercepting
    the groupBy handoff on a plan-only streaming frame."""
    from unittest.mock import patch

    from pyspark.sql.group import GroupedData

    sdf = spark.readStream.format("rate").load()
    captured = {}
    orig = GroupedData.applyInPandasWithState

    def spy(self, fn, *a, **kw):
        captured["fn"] = fn
        return orig(self, fn, *a, **kw)

    with patch.object(GroupedData, "applyInPandasWithState", spy):
        dedup_with_ttl(sdf, ["value"], ttl="10 seconds", impl="state")
    return captured["fn"]


def test_ttl_state_fn_sliding_refresh_unit(spark):
    """Deterministic timestamps: first sighting at t=0 emits; a repeat
    at t=7s is suppressed AND slides the window (state updates to 7s and
    the timeout re-arms), so a repeat at t=12s — 12s after the FIRST
    sighting but 5s after the refresh — is still suppressed (absolute
    TTL would have re-emitted); at t=18s (11s idle) it emits again; and
    a timed-out invocation evicts the key."""
    import pandas as pd

    fn = _fn_under_test(spark)  # ttl = 10 seconds
    pdf = pd.DataFrame({"timestamp": [0], "value": [7]})

    s = _FakeState(now_ms=0)
    assert len(list(fn((7,), iter([pdf]), s))) == 1  # first sighting
    assert s.get == (0,) and s.timeout_set == 10_000

    s = _FakeState(now_ms=7_000, value=s.get)
    assert list(fn((7,), iter([pdf]), s)) == []  # inside ttl: drop
    assert s.get == (7_000,)  # ...but the clock slid

    s = _FakeState(now_ms=12_000, value=s.get)
    assert list(fn((7,), iter([pdf]), s)) == []  # sliding: still inside
    assert s.get == (12_000,)

    s = _FakeState(now_ms=23_000, value=s.get)
    assert len(list(fn((7,), iter([pdf]), s))) == 1  # idle > ttl: re-emit

    s = _FakeState(now_ms=40_000, value=(23_000,), has_timed_out=True)
    assert list(fn((7,), iter([]), s)) == []  # timeout: evict, emit nothing
    assert s.removed


def _start_ttl_stream(spark, src, ckpt, out, ttl, impl):
    """Continuous query writing to a parquet sink. NOT availableNow, and
    barriers are _await_rows, NOT processAllAvailable: pending
    processing-time timers make the engine run a state-cleanup batch on
    EVERY trigger, so the stream never reaches the quiescent point
    either of those waits for (documented in _ttl_dedup_state; observed
    here: 'No new data but cleaning up state' forever). The parquet sink
    supports checkpoint recovery (the memory sink does not), which the
    restart test needs, and its _spark_metadata log makes _sink_rows
    transactional — a committed batch is visible atomically, so an
    await on row count is a sound barrier for same-batch assertions.
    The 1s trigger matters: with the ASAP default, those pending timers
    drive a batch every few milliseconds, each committing sink files."""
    sdf = spark.readStream.schema("k int, v string").parquet(src)
    deduped = dedup_with_ttl(sdf, ["k"], ttl=ttl, impl=impl).coalesce(1)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )


def _append(spark, src, rows):
    spark.createDataFrame(rows, "k int, v string").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _sink_rows(spark, out):
    try:
        return sorted(
            (r.k, r.v)
            for r in spark.read.schema("k int, v string")
            .parquet(out)
            .collect()
        )
    except Exception:  # sink dir not yet created by the first commit
        return []


def _await_rows(spark, q, out, n, timeout=120):
    """Block until the sink holds >= n rows (or the query dies / the
    deadline passes). Because the parquet sink commits batches
    atomically, reaching the expected count means the whole batch that
    produced row n is visible — suppressed rows from that same batch
    are already provably absent."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception() is not None:
            raise q.exception()
        rows = _sink_rows(spark, out)
        if len(rows) >= n:
            return rows
        time.sleep(0.3)
    raise TimeoutError(
        f"sink has {len(_sink_rows(spark, out))} rows, wanted {n}"
    )


def test_dedup_with_ttl_state_cross_batch_suppression(spark, tmp_path):
    """E2e, portable path: first sighting per key emits and in-batch
    repeats drop (batch 1); a repeat in a later micro-batch within the
    ttl is suppressed by state (batch 2); and the state survives a full
    stop/restart from the checkpoint (batch 3, new query). ttl is 10
    minutes so no plausible test latency can age keys out between
    batches."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _append(spark, src, [(1, "a"), (1, "b"), (2, "c")])
    q = _start_ttl_stream(spark, src, ckpt, out, "10 minutes", "state")
    try:
        got1 = _await_rows(spark, q, out, 2)
        assert [k for k, _ in got1] == [1, 2]  # one row per key
        assert got1[1] == (2, "c")  # k=2 had a single candidate row

        _append(spark, src, [(1, "x"), (3, "y")])
        # (1,"x") and (3,"y") land in the same micro-batch, so once
        # (3,"y") is visible the suppression of (1,"x") is decided
        assert _await_rows(spark, q, out, 3) == got1 + [(3, "y")]
    finally:
        q.stop()

    # restart from the checkpoint: k=1/2/3 are still in (recovered)
    # state, so only the never-seen k=4 emits
    _append(spark, src, [(1, "r"), (4, "s")])
    q2 = _start_ttl_stream(spark, src, ckpt, out, "10 minutes", "state")
    try:
        assert _await_rows(spark, q2, out, 4) == sorted(
            got1 + [(3, "y"), (4, "s")]
        )
    finally:
        q2.stop()


def test_dedup_with_ttl_state_expiry_reemits(spark, tmp_path):
    """E2e, portable path: a key silent for a full ttl re-emits on its
    next sighting. Only a LOWER bound on elapsed time is needed (sleep
    >= ttl), so this cannot flake on a slow runner. While the query
    idles through the sleep, the processing-time timeout fires for the
    silent keys and evicts them (branch coverage; the re-emission
    contract itself is guaranteed by the inline age check either way).
    k=5 stays silent after batch 1, so its eviction is pure timeout."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _append(spark, src, [(1, "a"), (5, "b")])
    q = _start_ttl_stream(spark, src, ckpt, out, "2 seconds", "state")
    try:
        assert [k for k, _ in _await_rows(spark, q, out, 2)] == [1, 5]

        # batch 1's stored timestamp predates the rows becoming visible,
        # so sleeping >= ttl from HERE guarantees the window elapsed
        time.sleep(2.5)
        _append(spark, src, [(1, "z"), (9, "w")])
        # k=1 aged out -> re-emits; k=9 is new; k=5 stays evicted
        assert _await_rows(spark, q, out, 4) == [
            (1, "a"), (1, "z"), (5, "b"), (9, "w"),
        ]
    finally:
        q.stop()


@pytest.mark.skipif(
    not _protobuf_ok(), reason="protobuf absent in this environment"
)
def test_dedup_with_ttl_tws_end_to_end(spark, tmp_path):
    """Native-path parity where protobuf exists: same first-sighting and
    cross-batch suppression contract as the portable path."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    for k, v in ttl_dedup_confs().items():
        spark.conf.set(k, v)
    out = str(tmp_path / "out")
    try:
        _append(spark, src, [(1, "a"), (1, "b"), (2, "c")])
        q = _start_ttl_stream(spark, src, ckpt, out, "1 hour", "tws")
        try:
            got1 = _await_rows(spark, q, out, 2)
            assert sorted(k for k, _ in got1) == [1, 2]

            _append(spark, src, [(1, "x"), (3, "y")])
            # k=1 is in state from batch 1 -> only k=3 is new
            got2 = _await_rows(spark, q, out, 3)
            assert (3, "y") in got2
            assert len(got2) == 3
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
