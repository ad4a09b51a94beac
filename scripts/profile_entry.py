"""Per-entry optimization profiler (round-15 tooling).

Runs named entries exactly as bench.py does (same session confs, same
noop-sink methodology), but additionally:

- times N passes per entry (default 3) and prints each pass + min;
- counts the Spark jobs/stages/tasks each pass schedules (the fixed
  per-job overhead is the dominant cost at fixture scale, so the job
  count is the first thing to shrink — guide §1.2 "the distributed
  algorithm");
- optionally dumps ``.explain('formatted')`` to a file for the
  plans/r15 before/after snapshots.

Usage::

    python scripts/profile_entry.py dq_pagerank dq_curation_floor
    PROFILE_PASSES=4 python scripts/profile_entry.py dq_winsorize
    PROFILE_EXPLAIN_DIR=plans/r15 PROFILE_EXPLAIN_TAG=before \
        python scripts/profile_entry.py dq_pagerank
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("PROFILE_PASSES", "3"))
    explain_dir = os.environ.get("PROFILE_EXPLAIN_DIR", "")
    explain_tag = os.environ.get("PROFILE_EXPLAIN_TAG", "before")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-entry")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.ui.retainedExecutions", "10")
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        .config("spark.ui.retainedTasks", "500")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warm-up as bench.py
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    def _identity(s):
        return s

    _identity.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(1000).select(pandas_udf(_identity, "long")(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    queries = entry_mod.queries()
    names = [n if n.startswith("dq_") else f"dq_{n}" for n in sys.argv[1:]]
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        sys.exit(2)

    tracker = sc.statusTracker()
    for name in names:
        fn = queries[name]
        best = None
        for i in range(passes):
            # job ids are tracked via a fresh per-pass group
            sc.setJobGroup(f"profile-{name}-{i}", name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            jobs = tracker.getJobIdsForGroup(f"profile-{name}-{i}") or []
            n_stages = 0
            n_tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                f"{name} pass{i}: {t:.3f}s  jobs={len(jobs)} "
                f"stages={n_stages} tasks={n_tasks}",
                flush=True,
            )
            best = t if best is None else min(best, t)
            if explain_dir and i == 0:
                os.makedirs(explain_dir, exist_ok=True)
                path = os.path.join(
                    explain_dir, f"{name}_{explain_tag}.txt"
                )
                with open(path, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")
                    ))
                print(f"  explain -> {path}", flush=True)
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            sc.setJobGroup(None, None)
        print(f"{name} MIN: {best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
