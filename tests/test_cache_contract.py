"""The plans/cache.py contract: every operator that caches internally
takes ``persist``; ``persist=False`` leaves ZERO entries in the SQL
CacheManager (no session-lived residue for long-lived looping callers)
and produces identical results to the cached default.

Driver for the test list: the r11 advice — the round added ~12
MEMORY_AND_DISK persists with no release handle and docstrings claiming
LRU eviction Spark does not do. The sweep also guards the escape
hatch's one correctness hazard: the prefix-sum operators join
per-partition offsets on ``spark_partition_id``, so their persist=False
path must PIN partitions (lazy localCheckpoint), never re-execute a
``repartitionByRange`` per consumer.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.bloom import dedup_against_bloom
from pyspark_data_quality_spark.operators.classify import train_nb_classifier
from pyspark_data_quality_spark.operators.drift import (
    classifier_drift,
    corpus_divergence,
    embedding_drift,
    ks_by_group,
    ks_statistic,
    mmd_drift,
    numeric_drift,
    wasserstein_1d,
)
from pyspark_data_quality_spark.operators.fuzzy import fuzzy_match_pairs
from pyspark_data_quality_spark.operators.profile import value_histogram_stats
from pyspark_data_quality_spark.operators.text import (
    bigram_logprob,
    distinctive_terms,
    tfidf_top_terms,
    unigram_logprob,
)


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(
            doc_id=i,
            text=f"the quick brown fox {i % 7} jumps over the lazy dog "
            f"number {i % 3} again and again",
            lang="en" if i % 3 else "de",
            score=float(i % 13) + (0.5 if i % 2 else 0.0),
        )
        for i in range(120)
    ]
    return spark.createDataFrame(rows)


def _vecs(d, parity):
    return d.filter(f"doc_id % 2 = {parity}").select(
        F.array("score", F.col("score") * 2).alias("v")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


# every builder forwards **kw to the ONE operator under test
CASES = [
    ("numeric_drift", lambda d, **kw: numeric_drift(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"), "score", **kw
    )),
    ("ks_statistic", lambda d, **kw: ks_statistic(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"), "score", **kw
    )),
    ("ks_by_group", lambda d, **kw: ks_by_group(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"),
        "score", "lang", **kw
    )),
    ("wasserstein_1d", lambda d, **kw: wasserstein_1d(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"), "score", **kw
    )),
    ("corpus_divergence", lambda d, **kw: corpus_divergence(
        d, "text", "lang", **kw
    )),
    ("embedding_drift", lambda d, **kw: embedding_drift(
        _vecs(d, 0), _vecs(d, 1), "v", **kw
    )),
    ("mmd_drift", lambda d, **kw: mmd_drift(
        _vecs(d, 0), _vecs(d, 1), "v", num_features=8, dim=2, **kw
    )),
    ("classifier_drift", lambda d, **kw: classifier_drift(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"),
        "text", "doc_id", **kw
    )),
    ("tfidf_top_terms", lambda d, **kw: tfidf_top_terms(
        d, "text", "doc_id", **kw
    )),
    ("unigram_logprob", lambda d, **kw: unigram_logprob(
        d, "text", "doc_id", **kw
    )),
    ("bigram_logprob", lambda d, **kw: bigram_logprob(
        d, "text", "doc_id", **kw
    )),
    ("distinctive_terms", lambda d, **kw: distinctive_terms(
        d, "text", "lang", **kw
    )),
    ("fuzzy_match_pairs", lambda d, **kw: fuzzy_match_pairs(
        d.select(
            "doc_id",
            F.concat(
                F.lit("name"), (F.col("doc_id") % 9).cast("string")
            ).alias("s"),
        ),
        "s", "doc_id", **kw
    )),
    ("dedup_against_bloom", lambda d, **kw: dedup_against_bloom(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 3 = 0"),
        "text", expected_items=100, **kw
    )),
    ("value_histogram_stats", lambda d, **kw: value_histogram_stats(
        d, ["score", "lang"], **kw
    )),
]


@pytest.mark.parametrize("name,build", CASES, ids=[c[0] for c in CASES])
def test_persist_false_no_residue_same_result(spark, docs, name, build):
    spark.catalog.clearCache()
    cached = _rows(build(docs))
    assert not _cache_empty(spark), (
        f"{name}: expected the default path to register a cache entry "
        "(if the operator stopped caching, drop it from this sweep)"
    )
    spark.catalog.clearCache()
    uncached = _rows(build(docs, persist=False))
    assert _cache_empty(spark), (
        f"{name}: persist=False left entries in the SQL CacheManager"
    )
    assert cached == uncached, f"{name}: persist flag changed the result"


def test_train_nb_classifier_persist_false(spark, docs):
    spark.catalog.clearCache()
    m = train_nb_classifier(docs, "text", "lang", persist=False)
    m.features.collect()
    m.classes.collect()
    assert _cache_empty(spark)
