"""Runtime plan telemetry: harvest SQLMetrics from an executed physical
plan — the numbers behind every "the shuffle carries hashes, not
documents" claim in this package, turned into something a test can
assert.

`scripts/audit_plans.py` audits plans STATICALLY (operator shapes,
pushdown, UDF kinds); this module reads the runtime accumulators after
an action: bytes actually written to each shuffle, rows out of each
operator, spill sizes, broadcast data sizes. Use it to pin scale
contracts in CI — e.g. exact dedup over a corpus must shuffle a small
multiple of 8 bytes/doc (the fingerprints), never the document bodies
(tests/test_telemetry.py does exactly that).

Implementation: a py4j walk of ``queryExecution().executedPlan()``,
transparently unwrapping AQE (``AdaptiveSparkPlan`` → its final
``executedPlan``; ``*QueryStage`` wrappers → their ``plan``). Metrics
are SQLMetric accumulators attached to the reused physical plan, so
harvest AFTER an action on the SAME DataFrame object; values accumulate
across repeated actions on that object (re-create the frame for a fresh
count).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["measured_collect", "harvest_plan_metrics", "summarize_metrics"]


def harvest_plan_metrics(df: DataFrame) -> list[dict[str, Any]]:
    """Post-action metric rows, one per physical operator:
    ``{"node": str, "depth": int, "metrics": {name: value}}`` in
    pre-order. Run an action on ``df`` first.

    Caveat for persisted frames (r11): ``InMemoryTableScan`` is a LEAF
    here — the cached child plan is not reachable via ``children()``,
    so the work done to MATERIALIZE a cache (its source scans, its
    shuffles) is invisible to this walk; only the cache READS appear
    (their ``numOutputRows`` = rows served from the cache). Summaries
    must therefore treat InMemoryTableScan as a cache read, not a
    source scan (see :func:`summarize_metrics`), and a fully-cached
    plan legitimately reports scan_output_rows=0."""
    out: list[dict[str, Any]] = []

    def walk(node, depth):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth)
            return
        if "QueryStage" in name:
            walk(node.plan(), depth)
            return
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        out.append({"node": name, "depth": depth, "metrics": metrics})
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return out


def measured_collect(df: DataFrame):
    """``(rows, metric_rows)``: collect the frame and harvest its
    executed plan's runtime metrics in one call."""
    rows = df.collect()
    return rows, harvest_plan_metrics(df)


def summarize_metrics(metric_rows: list[dict[str, Any]]) -> dict[str, int]:
    """Scale-relevant totals from :func:`harvest_plan_metrics` output:

    - ``shuffle_bytes_written``: sum over Exchange nodes — the real
      cost of every groupBy/join in the plan;
    - ``shuffle_records_written``: its row-count sibling;
    - ``broadcast_bytes``: sum of broadcast ``dataSize`` — how much
      rode to every executor;
    - ``spill_bytes``: memory pressure actually hit;
    - ``scan_output_rows``: rows surviving the scans (post-pushdown).
    """
    totals = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "broadcast_bytes": 0,
        "spill_bytes": 0,
        "scan_output_rows": 0,
    }
    for row in metric_rows:
        m = row["metrics"]
        node = row["node"]
        if node == "Exchange":
            totals["shuffle_bytes_written"] += int(
                m.get("shuffleBytesWritten", 0)
            )
            totals["shuffle_records_written"] += int(
                m.get("shuffleRecordsWritten", 0)
            )
        if node == "BroadcastExchange":
            totals["broadcast_bytes"] += int(m.get("dataSize", 0))
        totals["spill_bytes"] += int(m.get("spillSize", 0))
        # SOURCE scans only: InMemoryTableScan is a cache READ, not a
        # rescan of the data — counting it as a scan reports an N-fold
        # phantom re-read for every persisted frame with N consumers
        if "Scan" in node and "InMemory" not in node:
            totals["scan_output_rows"] += int(m.get("numOutputRows", 0))
    return totals
