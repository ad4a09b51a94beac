"""Streaming DQ checks (Structured Streaming) — see :mod:`.windows`,
:mod:`.anomaly`, :mod:`.topk`, :mod:`.ttl`, :mod:`.route`."""

from .anomaly import streaming_cusum, streaming_ewma, streaming_zscore
from .route import stream_quarantine_route
from .topk import streaming_heavy_hitters
from .ttl import dedup_with_ttl, ttl_dedup_confs
from .windows import (
    dedup_within_watermark,
    running_totals,
    session_counts,
    windowed_cardinality,
    windowed_counts,
    windowed_numeric_psi,
    windowed_pass_ratios,
    windowed_psi,
    windowed_top_values,
)

__all__ = [
    "dedup_with_ttl",
    "dedup_within_watermark",
    "running_totals",
    "session_counts",
    "stream_quarantine_route",
    "streaming_cusum",
    "streaming_ewma",
    "streaming_heavy_hitters",
    "streaming_zscore",
    "ttl_dedup_confs",
    "windowed_cardinality",
    "windowed_counts",
    "windowed_numeric_psi",
    "windowed_pass_ratios",
    "windowed_psi",
    "windowed_top_values",
]
