"""Streaming DQ checks (Structured Streaming) — see :mod:`.windows`
and :mod:`.anomaly`."""

from .anomaly import streaming_cusum, streaming_zscore
from .route import stream_quarantine_route
from .windows import (
    dedup_within_watermark,
    running_totals,
    session_counts,
    windowed_cardinality,
    windowed_counts,
    windowed_pass_ratios,
    windowed_top_values,
)

__all__ = [
    "dedup_within_watermark",
    "running_totals",
    "session_counts",
    "stream_quarantine_route",
    "streaming_cusum",
    "streaming_zscore",
    "windowed_cardinality",
    "windowed_counts",
    "windowed_pass_ratios",
    "windowed_top_values",
]
