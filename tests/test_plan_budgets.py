"""Plan-shape regression pins for the composite pipelines.

The r10/r11 shuffle diets (segment_health 27 -> 23 -> 12, the tagged-
union drift fusion, the shared-subtree caches) were verified by ad-hoc
`scripts/audit_plans.py` runs; this test makes the wins regression-
proof: if a rewrite re-introduces a per-section source scan or an
unfused cur-vs-ref shape, the Exchange/Scan count rises and the pin
fails loudly with the offending plan's counts.

Budgets are CEILINGS with one unit of slack over the audited r11
values (AQE and partition-count differences can legally add a local
exchange), not exact counts — the goal is catching +5-shuffle
regressions, not blocking a ±1 replan.
"""

import re

import pytest
from pyspark.sql import functions as F


def _counts(df):
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )

    def ops(pattern: str) -> int:
        # formatted explain lists operators in the tree AND the details
        # section — count distinct operator ids (audit_plans.py's rule)
        return len(set(re.findall(rf"\((\d+)\) (?:{pattern})", plan)))

    return {
        "shuffles": ops("Exchange"),
        "scans": ops("Scan parquet"),
        "row_python": ops("BatchEvalPython"),
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_segment_health_shuffle_budget(spark, orders):
    from pyspark_data_quality_spark.pipelines.segment_health import (
        segment_health_report,
    )

    cur = orders.filter(F.col("o_orderkey") % 2 == 0)
    ref = orders.filter(F.col("o_orderkey") % 2 == 1)
    report = segment_health_report(
        cur,
        group_col="o_orderstatus",
        completeness_cols=["o_totalprice", "o_custkey"],
        ts_col="o_orderdate",
        unique_keys=["o_orderkey"],
        psi_cols=["o_orderpriority"],
        ks_col="o_totalprice",
        ref=ref,
    )
    c = _counts(report)
    assert c["shuffles"] <= 13, c  # audited r11: 12
    assert c["row_python"] == 0, c
    # the prune+persist contract: each side contributes ONE logical scan
    # however many sections consume it
    assert c["scans"] <= 2, c
    assert report.count() > 0
    spark.catalog.clearCache()


def test_corpus_card_shuffle_budget(spark, docs):
    from pyspark_data_quality_spark.pipelines.corpus_card import corpus_report

    card = corpus_report(docs.limit(500), "text")
    c = _counts(card)
    assert c["shuffles"] <= 10, c  # audited r11: 9
    assert c["row_python"] == 0, c
    assert card.count() > 0
    spark.catalog.clearCache()


def test_curation_shuffle_budget(spark, docs):
    from pyspark_data_quality_spark.pipelines.curation import curate_corpus

    curated = curate_corpus(docs.limit(500), text_col="text", id_col="doc_id")
    c = _counts(curated)
    assert c["shuffles"] <= 17, c  # audited r11: 16
    assert c["row_python"] == 0, c
    assert curated.count() >= 0
    spark.catalog.clearCache()


#: r13 composite registry entries: (shuffle ceiling, scan ceiling),
#: one unit of slack over the audited r13 values — a rewrite that
#: re-multiplies corpus scans (the dq_text_cleanup one-scan collapse)
#: or unfuses a part must fail loudly here.
_COMPOSITE_BUDGETS = {
    "dq_text_cleanup": (1, 4),       # audited: 0 / 3
    "dq_sequence_audit": (4, 3),     # audited: 3 / 2
    "dq_graph_profile": (9, 1),      # audited: 8 / 0 (checkpointed edges)
    "dq_group_drift": (9, 5),        # audited: 8 / 4
    # r15-opt: +2 round-robin exchanges (readability + gopher parts
    # spread the single-split fixture scan so interpreted HOF lambdas
    # don't serialize on one task; no-op at scale — idle 2.3 -> 1.9 s)
    "dq_doc_quality": (6, 3),        # audited r15-opt: 5 / 2
    "dq_timeseries_shape": (6, 2),   # audited: 5 / 1 (events scan shared)
    # r14: + confident-learning part (softmax/rank windows + threshold
    # broadcast + joint agg over docs x 3 classes)
    "dq_label_quality": (11, 3),     # audited: 10 / 2
    "dq_dup_profile": (7, 3),        # audited: 6 / 2
    # r15-opt: +2-3 round-robin exchanges from ensure_min_partitions in
    # the brute-force faces — tiny bounded subsets repartitioned so the
    # interpreted O(n^2) cosine scoring doesn't serialize on the
    # fixture's single-file scan (idle-median 2.0 -> 1.1 s at sf0.1)
    "dq_exact_similarity": (5, 5),   # audited r15-opt: 4 / 4 (+1 slack)
    "dq_stream_faces": (5, 5),       # audited r13+numeric_psi: 4 / 4
    "dq_user_journeys": (6, 2),      # audited: 5 / 1
    "dq_value_shape": (7, 3),        # audited: 6 / 2
    "dq_unicode_profile": (2, 2),    # audited: 1 / 1
    "dq_privacy": (13, 7),           # audited: 12 / 6
    # static plans below double-count subtrees a runtime
    # ReusedExchange/cache collapses (ks prefix-sum + w1 + screen each
    # re-list the orders scan); the pin guards against a +5 regression,
    # not the dump's double counting
    "dq_drift_screen": (15, 9),      # audited: 14 / 8
    "dq_hbos": (4, 4),               # audited: 3 / 3
    "dq_fd_check": (6, 3),           # audited: 5 / 2
    "dq_outliers": (3, 3),           # audited: 2 / 2 (z + mad parts)
    # r14: series part (1 window shuffle over the daily agg) + runs part
    # (rank/agg/join over runs x rules metric rows — never data-scale)
    "dq_metric_anomalies": (5, 2),   # audited: 4 / 1
    # r14: cusum + ewma parts — one keyed window shuffle each over the
    # same filtered scan (pushed user_id < 20 predicate)
    "dq_cusum": (3, 3),              # audited: 2 / 2
    # r14: fields part (one fused agg) + conversations part (parse +
    # HOF lint riding the documents scan — zero extra shuffles)
    "dq_json_fields": (2, 3),        # audited: 1 / 2
    # r15: ws + bpe parts = two full token_budget_mix 'partitioned'
    # prefix-sum pipelines (range partition + per-source totals +
    # offsets broadcast each); static dump double-counts subtrees the
    # runtime ReusedExchange collapses
    "dq_token_mix": (19, 7),         # audited r15: 18 / 6
    # r15: contract + compat(x3 modes) — driver-side metadata only,
    # LocalTableScan unions; any Exchange or parquet scan appearing
    # here means someone made schema introspection read data
    "dq_schema_report": (1, 1),      # audited r15: 0 / 0
    # r15 md5-oracle face: shingle/sig Arrow stages ride the pushed
    # doc_id<500 scan; ONE bucket shuffle + pair-dedup agg
    "dq_minhash_pairs": (4, 2),      # audited r15: 3 / 1
    # r15 md5-oracle faces for the remaining approximate ops: each is
    # ONE bucket/candidate shuffle (+dedup agg) over a pushed bounded
    # scan; ivf is a broadcast probe join with zero corpus shuffle
    "dq_simhash_pairs": (4, 2),      # audited r15: 3 / 1
    "dq_embedding_pairs_lsh": (3, 2),  # audited r15: 2 / 1
    "dq_lsh_topk": (4, 3),           # audited r15: 3 / 2
    "dq_ivf_topk": (2, 3),           # audited r15: 1 / 2
    # r15 deterministic face: width-bounds agg + two logical-group
    # span aggs (z-cells / ntile) — no repartitionByRange in the entry
    "dq_zorder": (4, 3),             # audited r15: 3 / 2
}


@pytest.mark.parametrize("name", sorted(_COMPOSITE_BUDGETS))
def test_composite_entry_plan_budgets(spark, sf_dir, name):
    from pyspark_data_quality_spark.entry_queries import ENTRY_QUERIES

    max_shuffles, max_scans = _COMPOSITE_BUDGETS[name]
    c = _counts(ENTRY_QUERIES[name](spark, sf_dir))
    assert c["shuffles"] <= max_shuffles, (name, c)
    assert c["scans"] <= max_scans, (name, c)
    assert c["row_python"] == 0, (name, c)
    spark.catalog.clearCache()


def test_kernel_not_duplicated_around_pushed_filters(spark, docs):
    """r15-opt pin: explode()'s implicit size>0 condition used to be
    pushed below the exchange as a filter ON the kernel output, planning
    a SECOND ArrowEvalPython whose result was projected away — every
    shingle pipeline paid the kernel twice per action. The kernels are
    marked asNondeterministic (deterministic in fact) precisely to stop
    that; this pins the single-evaluation plan."""
    import re

    from pyspark_data_quality_spark.functions.vectors import (
        shingle_hashes_np,
    )
    from pyspark_data_quality_spark.plans.parallelism import (
        ensure_min_partitions,
    )

    h = shingle_hashes_np("char", 8, seed=77)
    q = (
        ensure_min_partitions(docs)
        .select(F.col("doc_id"), h(F.col("text")).alias("_dg"))
        .filter(F.col("_dg").isNotNull())
        .select("doc_id", F.explode("_dg").alias("g"))
    )
    plan = q._jdf.queryExecution().explainString(
        q.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    arrow_nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert len(arrow_nodes) == 1, plan
