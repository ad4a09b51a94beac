"""Composed end-to-end pipelines built from the certified operators."""

from .curation import CurationStats, curate_corpus, curation_stats
from .segment_health import segment_health_report

__all__ = [
    "CurationStats",
    "curate_corpus",
    "curation_stats",
    "segment_health_report",
]
