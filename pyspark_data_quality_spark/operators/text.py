"""Text-analysis operators over a document table (north-star extension).

One projection pass computes every per-document signal — token counts,
quality signals, language ID, fingerprints — as pure column expressions
(:mod:`..functions.text`): zero shuffles, zero UDFs, linear scan that
Catalyst fuses with any downstream filter/aggregate. At 100 TB this runs
at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    doc_md5,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard text-analysis columns to ``df``."""
    return (
        df.withColumn("token_count", token_count(text_col))
        .withColumn("bpe_token_count", bpe_ish_token_count(text_col))
        .withColumn("stopword_ratio", F.round(stopword_ratio(text_col), 6))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("mean_word_len", F.round(mean_word_length(text_col), 6))
        .withColumn("quality_score", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", doc_fingerprint(text_col))
        .withColumn("fingerprint_md5", doc_md5(text_col))
    )


def quality_summary(df: DataFrame, text_col: str = "text", group_col: str | None = None) -> DataFrame:
    """Aggregate quality stats, optionally per group (e.g. per source):
    one fused agg job (doc counts, token totals, mean quality, low-quality
    share)."""
    profiled = text_profile(df, text_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
        F.round(F.avg("token_count"), 6).alias("avg_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        F.round(
            F.avg((F.col("quality_score") < 0.75).cast("double")), 6
        ).alias("low_quality_share"),
        F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
    ]
    if group_col:
        return profiled.groupBy(group_col).agg(*aggs)
    return profiled.agg(*aggs)
