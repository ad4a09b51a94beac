"""Sinks — metric history (:mod:`.metrics`) and valid/invalid routing
(:mod:`.quarantine`)."""

from .metrics import read_metrics, write_metrics
from .quarantine import quarantine_route, read_quarantine

__all__ = [
    "quarantine_route",
    "read_metrics",
    "read_quarantine",
    "write_metrics",
]
