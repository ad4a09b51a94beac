"""Composed end-to-end pipelines built from the certified operators."""

from .curation import CurationStats, curate_corpus, curation_stats

__all__ = ["CurationStats", "curate_corpus", "curation_stats"]
