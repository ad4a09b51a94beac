"""Schema-first readers (JSONL/CSV with corrupt capture) and the
partitioned dataset writer."""

import glob

from pyspark.sql import functions as F

from pyspark_data_quality_spark.sinks.dataset import read_dataset, write_dataset
from pyspark_data_quality_spark.sources.readers import (
    corrupt_stats,
    read_csv,
    read_jsonl,
)


def test_read_jsonl_corrupt_capture(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        'NOT JSON AT ALL\n'
        '{"id": 3, "name": "c"}\n'
    )
    df = read_jsonl(spark, str(p), "id bigint, name string")
    rows = df.collect()
    assert len(rows) == 3
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    assert good == {1, 3}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]
    cr = corrupt_stats(df)
    assert cr["n_rows"] == 3 and cr["n_corrupt"] == 1
    assert cr["corrupt_ratio"] == round(1 / 3, 6)


def test_read_csv_schema_and_corrupt(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,score\n1,2.5\n2,not_a_number\n3,9.0\n")
    df = read_csv(spark, str(p), "id bigint, score double")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] == 2.5
    assert rows[2]["score"] is None  # unparseable cell
    assert rows[2]["_corrupt_record"] is not None
    assert corrupt_stats(df)["n_corrupt"] == 1


def test_write_dataset_partitioned_and_bounded(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(100)],
        "id bigint, src string, v double",
    ).repartition(1)
    out = str(tmp_path / "ds")
    write_dataset(
        df, out, partition_by=["src"], max_records_per_file=20,
        sort_within=["id"],
    )
    assert (tmp_path / "ds" / "src=a").is_dir()
    assert (tmp_path / "ds" / "src=b").is_dir()
    files_a = glob.glob(f"{out}/src=a/*.parquet")
    assert len(files_a) >= 3  # 50 rows / 20 per file
    back = read_dataset(spark, out)
    assert back.count() == 100
    assert back.filter(F.col("src") == "a").count() == 50


def test_build_session_reuses_active(spark):
    from pyspark_data_quality_spark.sources.session import (
        RECOMMENDED_CONFS,
        build_session,
    )

    # with a session already active, getOrCreate returns it untouched
    s = build_session("test-app")
    assert s is spark
    # every recommended conf carries a rationale
    for key, (value, why) in RECOMMENDED_CONFS.items():
        assert key.startswith("spark.") and value and len(why) > 20


def test_normalize_event_ts_tz_guard_and_units(spark):
    from pyspark_data_quality_spark.sources.tables import normalize_event_ts

    import pytest

    # bigint branch: explicit unit contract (default ns per nanosAsLong)
    ns = spark.createDataFrame([(1_700_000_000_000_000_000,)], "ts bigint")
    got = normalize_event_ts(ns).selectExpr("cast(ts as long) e").first()["e"]
    assert got == 1_700_000_000
    ms = spark.createDataFrame([(1_700_000_000_000,)], "ts bigint")
    got = (
        normalize_event_ts(ms, bigint_unit="ms")
        .selectExpr("cast(ts as long) e")
        .first()["e"]
    )
    assert got == 1_700_000_000
    with pytest.raises(ValueError, match="bigint_unit"):
        normalize_event_ts(ns, bigint_unit="days")

    # NTZ branch: refuses to cast under a non-UTC session timezone
    ntz = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], "s string"
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        with pytest.raises(ValueError, match="session-timezone-dependent"):
            normalize_event_ts(ntz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert dict(normalize_event_ts(ntz).dtypes)["ts"] == "timestamp"


def test_file_layout_report(spark, tmp_path):
    from pyspark_data_quality_spark.operators.layout import file_layout_report

    path = str(tmp_path / "layout")
    # deliberately fragmented: 4 small files
    spark.range(1000).repartition(4).write.parquet(path)
    rows = file_layout_report(spark, path).collect()
    assert len(rows) == 4
    assert sum(r["n_rows"] for r in rows) == 1000
    assert all(r["bytes"] > 0 and r["is_small"] for r in rows)
    assert all(r["avg_row_bytes"] > 0 for r in rows)
    # raising the threshold above any file size flips the flag
    ok = file_layout_report(spark, path, small_file_bytes=1).collect()
    assert not any(r["is_small"] for r in ok)
    # the two row-count sources agree file-for-file (footer is the local
    # default; scan is the remote/non-parquet fallback)
    footer = file_layout_report(spark, path, row_source="footer").collect()
    scan = file_layout_report(spark, path, row_source="scan").collect()
    assert [tuple(r) for r in footer] == [tuple(r) for r in scan]


def test_compact_dataset(spark, tmp_path):
    from pyspark_data_quality_spark.operators.layout import file_layout_report
    from pyspark_data_quality_spark.sinks.dataset import compact_dataset

    src = str(tmp_path / "fragmented")
    spark.range(2000).repartition(16).write.parquet(src)
    assert len(file_layout_report(spark, src).collect()) == 16

    dst = str(tmp_path / "compacted")
    total = sum(r["bytes"] for r in file_layout_report(spark, src).collect())
    # target half the total -> exactly 2 output files
    n = compact_dataset(spark, src, dst, target_file_bytes=(total + 1) // 2)
    assert n == 2
    out = file_layout_report(spark, dst).collect()
    assert len(out) == 2
    assert sum(r["n_rows"] for r in out) == 2000
    # rows preserved exactly
    assert spark.read.parquet(dst).count() == 2000


def test_compact_dataset_zorder_layout(spark, tmp_path):
    """compact_dataset(zorder_cols=...) = compaction + OPTIMIZE-ZORDER
    in one rewrite: rows/file-count as usual, per-file min/max spans on
    BOTH clustered columns shrink far below full range (the layout the
    z-order scan-skip tests prove end-to-end)."""
    from pyspark_data_quality_spark.sinks.dataset import compact_dataset

    src = str(tmp_path / "frag")
    df = spark.range(20_000).selectExpr(
        "cast(pmod(xxhash64(id), 1000) as double) as a",
        "cast(pmod(xxhash64(id, 7), 1000) as double) as b",
        "id",
    )
    df.repartition(16).write.parquet(src)
    from pyspark_data_quality_spark.operators.layout import (
        file_layout_report,
    )

    total = sum(r["bytes"] for r in file_layout_report(spark, src).collect())
    dst = str(tmp_path / "zcompact")
    n = compact_dataset(
        spark, src, dst,
        target_file_bytes=max(1, total // 16), zorder_cols=["a", "b"],
    )
    assert spark.read.parquet(dst).count() == 20_000
    per_file = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    assert len(per_file) == n
    avg_sa = sum(r["sa"] for r in per_file) / len(per_file)
    avg_sb = sum(r["sb"] for r in per_file) / len(per_file)
    # unclustered files span ~the full 0..999 range on both columns;
    # z-ordered files cover compact tiles on BOTH
    assert avg_sa < 700 and avg_sb < 700, (avg_sa, avg_sb)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        compact_dataset(
            spark, src, str(tmp_path / "x"),
            sort_within=["a"], zorder_cols=["a", "b"],
        )


def test_orc_round_trip(spark, tmp_path):
    """write_dataset/read_dataset/compact_dataset are format-generic:
    the ORC datasource (built into Spark) round-trips values and
    partitioning exactly like parquet."""
    from pyspark_data_quality_spark.sinks.dataset import (
        read_dataset,
        write_dataset,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(100)],
        "id bigint, src string, v double",
    )
    path = str(tmp_path / "orc_ds")
    write_dataset(df, path, partition_by=["src"], format="orc")
    back = read_dataset(spark, path, format="orc")
    assert back.count() == 100
    assert {r["src"] for r in back.select("src").distinct().collect()} == {
        "s0", "s1", "s2"
    }
    # values survive the round trip
    assert (
        back.agg(F.sum("v").alias("s")).first()["s"]
        == df.agg(F.sum("v").alias("s")).first()["s"]
    )
    # partition pruning works on the ORC layout too
    pruned = back.filter(F.col("src") == "s1")
    assert pruned.count() == 33


def test_write_bucketed_table_colocated_join(spark, tmp_path):
    """Bucketed writes must actually buy the shuffle-free join: two
    tables bucketed by the same key and count sort-merge-join with NO
    Exchange on either side; a bucketed-vs-plain join keeps its
    Exchange (sanity that the assertion bites)."""
    import pytest as _pytest

    from pyspark_data_quality_spark.sinks.dataset import write_bucketed_table

    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("y")
    )
    write_bucketed_table(
        a, "t_bkt_a", bucket_by=["k"], num_buckets=8, sort_by=["k"],
        path=str(tmp_path / "a"),
    )
    write_bucketed_table(
        b, "t_bkt_b", bucket_by=["k"], num_buckets=8, sort_by=["k"],
        path=str(tmp_path / "b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bkt_a").join(spark.table("t_bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        assert j.count() == 5000

        j2 = spark.table("t_bkt_a").join(b, "k")
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2  # plain side still re-hashes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")

    with _pytest.raises(ValueError, match="bucket_by"):
        write_bucketed_table(a, "t_bad", bucket_by=[], num_buckets=8)
    with _pytest.raises(ValueError, match="num_buckets"):
        write_bucketed_table(a, "t_bad", bucket_by=["k"], num_buckets=0)


def test_partitioned_dataset_prunes_at_plan_level(spark, tmp_path):
    """Hive-style partitioning must actually prune: a filter on the
    partition column appears as PartitionFilters in the scan (directory
    skipping), and a filter on a data column reaches PushedFilters
    (row-group skipping) — the two pruning levels SCALE.md claims."""
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(100)],
        "id bigint, src string, v double",
    )
    out = str(tmp_path / "pruned")
    write_dataset(df, out, partition_by=["src"], mode="overwrite")

    scan = read_dataset(spark, out).filter(
        (F.col("src") == "a") & (F.col("v") > 10.0)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories BEFORE the scan
    assert "PartitionFilters" in plan and "src" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # data filter is pushed to the parquet reader
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "GreaterThan(v" in pushed
    assert scan.count() == 45  # src='a' = odd ids; v>10 keeps 11..99 odd


def test_compact_dataset_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a hive-partitioned dataset must keep the partition
    layout: the reader recovers partition columns as data columns, and
    an unpartitioned rewrite would silently lose pruning on every
    subsequent dt-filtered scan."""
    from pyspark_data_quality_spark.sinks.dataset import (
        compact_dataset,
        write_dataset,
    )

    df = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(300)],
        ["id", "dt", "v"],
    )
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_dataset(df, src, partition_by=["dt"])
    compact_dataset(spark, src, dst, target_file_bytes=1 << 30)
    import os

    part_dirs = sorted(
        d for d in os.listdir(dst) if d.startswith("dt=")
    )
    assert part_dirs == ["dt=d0", "dt=d1", "dt=d2"]
    back = spark.read.parquet(dst)
    assert back.count() == 300
    assert back.filter(F.col("dt") == "d1").count() == 100
