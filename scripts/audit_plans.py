"""Physical-plan audit: dump ``explain('formatted')`` for every entry
query and flag scale smells.

Usage::

    python scripts/audit_plans.py              # summary table
    python scripts/audit_plans.py NAME         # full formatted plan

Smells checked per plan:

- parquet scans with no ``PushedFilters`` while the query filters rows
  (pushdown lost);
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` (quadratic joins —
  expected ONLY in the documented brute-force baselines);
- more than one row-at-a-time ``BatchEvalPython`` (non-Arrow Python UDF
  — everything Python should be ``ArrowEvalPython`` / ``MapInPandas``);
- ``Exchange`` count (shuffles) for eyeballing round-over-round drift.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: entries whose nested-loop joins are documented and bounded: either the
#: deliberate O(n²)/O(n·q) oracle baselines over fixed subsets, or
#: crossJoins that broadcast a 1-ROW aggregate (constant fan-out, not
#: quadratic). `--assert` fails on a nested loop appearing anywhere else.
NESTED_LOOP_OK = {
    "dq_exact_similarity",       # brute-force topk + O(n²) pair baselines
                                 # (former dq_topk_bruteforce /
                                 # dq_embedding_pairs_exact, fixed subsets)
    "dq_mmd",                    # 1-row n/gamma/mmd2 stat broadcasts x2 configs
    "dq_zorder",                 # 1-row global-range broadcast per layout
    "dq_ngram_jaccard",          # exact-path baseline, fixed 100 docs
    "dq_neardup_recall",         # harness ground truths (bounded subsets)
    "dq_curation_floor",         # exact ground truth over fixed <=500 docs
    "dq_sem_recall",             # exact baseline over fixed 500 vectors
    "dq_contamination_bloom",    # 1-row bloom-bitmap broadcast join
    "dq_nb_scores",              # C-row class-spine broadcast crossJoin
    "dq_drift_screen",           # 1-row bounds broadcasts (ks/w1/screen
                                 # parts, former dq_wasserstein's shape)
    "dq_hbos",                   # 1-row bounds broadcast before binning
    "dq_winsorize",              # 1-row bounds broadcast
    "dq_join_diagnosis",         # 1-row totals broadcast
    "dq_fuzzy_pairs",            # 1-row threshold broadcast
    "dq_normalize",              # 1-row global-stats broadcast
    "dq_impute",                 # 1-row global-stat broadcast (ungrouped)
    "dq_outliers",               # 1-row bounds broadcast
    "dq_mahalanobis",            # 1-row covariance broadcast
    "dq_tfidf",                  # 1-row doc-count broadcast
    "dq_unigram_nll",            # 1-row vocab-total broadcast
    "dq_bigram_nll",             # 1-row vocab-total broadcast
    "dq_vocab_richness",         # 1-row totals broadcast
    "dq_zipf",                   # 1-row totals broadcast
    "dq_diversity",              # 1-row totals broadcast
    "dq_metrics_report",         # driver-built result table
    "dq_corpus_kl",              # 1-row group-total broadcast
    "dq_matched_sample",         # 1-row limiting-stratum scale broadcast
    "dq_emb_drift",              # two 1-row mean vectors joined
    "dq_ab_test",                # two 1-row variant aggregates joined
    "dq_keyness",                # 1-row corpus-total broadcast
    "dq_group_completeness",     # 1-row global-ratio broadcast
    "dq_group_freshness",        # 1-row global-freshness broadcast
    "dq_histogram",              # 1-row min/max bounds broadcast
    "dq_numeric_drift",          # two 1-row stats frames joined
    "dq_heavy",                  # 1-row undercount-bound broadcast
    "dq_c2st",                   # NB class-spine + 1-row broadcasts
    "dq_label_quality",          # kappa 1-row agreement frames +
                                 # calibration bin-total broadcast
    "dq_segment_health",         # constituents' 1-row global broadcasts
    "dq_corpus_card",            # 1-row card-section aggregates
    "dq_privacy",                # 1-row suppression totals x 1-row
                                 # surviving-class stats broadcast
}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if a != "--assert"]
    strict = "--assert" in sys.argv[1:]
    only = args[0] if args else None
    violations: list[str] = []

    for name, fn in entry_mod.queries().items():
        if only and name != only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {type(e).__name__}: {e}"[:120])
            continue
        if only:
            print(plan)
            continue
        def ops(pattern: str) -> int:
            # formatted explain lists each operator in the tree AND in the
            # details section — count distinct operator ids
            return len(set(re.findall(rf"\((\d+)\) (?:{pattern})", plan)))

        n_exchange = ops("Exchange")
        n_scan = ops("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        nested = ops("BroadcastNestedLoopJoin|CartesianProduct")
        py_row = ops("BatchEvalPython")
        py_arrow = ops("ArrowEvalPython|MapInPandas")
        wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        flags = []
        if nested:
            flags.append(f"NESTED_LOOP x{nested}")
            if name not in NESTED_LOOP_OK:
                violations.append(f"{name}: unexpected nested-loop join")
        if py_row:
            flags.append(f"ROW_PYTHON_UDF x{py_row}")
            violations.append(f"{name}: row-at-a-time Python UDF")
        print(
            f"{name:32s} shuffles={n_exchange:2d} scans={n_scan} "
            f"pushed={pushed} arrow_udf={py_arrow} codegen={wsc:2d} "
            f"{' '.join(flags)}"
        )
    spark.stop()
    if strict and violations:
        print("PLAN GATE FAILED:")
        for v in violations:
            print(f"  {v}")
        sys.exit(1)


if __name__ == "__main__":
    main()
