"""Metric sinks — see :mod:`.metrics`."""

from .metrics import read_metrics, write_metrics

__all__ = ["read_metrics", "write_metrics"]
