"""Sinks — metric history (:mod:`.metrics`), valid/invalid routing
(:mod:`.quarantine`), and dataset writers (:mod:`.dataset`: partitioned
/ size-bounded / clustered writes, compaction, bucketed catalog
tables)."""

from .dataset import (
    compact_dataset,
    read_dataset,
    write_bucketed_table,
    write_dataset,
)
from .metrics import monitor_metrics, read_metrics, write_metrics
from .quarantine import quarantine_route, read_quarantine

__all__ = [
    "compact_dataset",
    "monitor_metrics",
    "quarantine_route",
    "read_dataset",
    "read_metrics",
    "read_quarantine",
    "write_bucketed_table",
    "write_dataset",
    "write_metrics",
]
