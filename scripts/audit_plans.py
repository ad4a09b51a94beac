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


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1] if len(sys.argv) > 1 else None

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
        if py_row:
            flags.append(f"ROW_PYTHON_UDF x{py_row}")
        print(
            f"{name:32s} shuffles={n_exchange:2d} scans={n_scan} "
            f"pushed={pushed} arrow_udf={py_arrow} codegen={wsc:2d} "
            f"{' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
