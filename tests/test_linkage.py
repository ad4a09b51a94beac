"""Record-linkage tests (operators/linkage.py): field comparators by
hand, blocking candidate generation, weighted scoring, self-linkage
column isolation, and the no-UDF plan contract."""

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.operators.linkage import (
    field_similarity,
    record_linkage,
)


def test_field_similarity_methods(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting", "Acme Inc.", "inc acme!", 10.0, 12.5)],
        "s1 string, s2 string, t1 string, t2 string, n1 double, n2 double",
    )
    row = df.select(
        field_similarity(F.col("s1"), F.col("s2"), "levenshtein").alias("lev"),
        field_similarity(F.col("t1"), F.col("t2"), "token_jaccard").alias("jac"),
        field_similarity(F.col("s1"), F.col("s1"), "exact").alias("ex"),
        field_similarity(F.col("s1"), F.col("s2"), "exact").alias("ne"),
        field_similarity(F.col("n1"), F.col("n2"), "numeric", scale=10.0).alias("num"),
    ).collect()[0]
    assert row["lev"] == pytest.approx(1 - 3 / 7)   # classic kitten/sitting
    assert row["jac"] == 1.0                        # same token set reordered
    assert row["ex"] == 1.0 and row["ne"] == 0.0
    assert row["num"] == pytest.approx(0.75)

    # NULLs are non-evidence (0), both-empty strings identical (1)
    edge = spark.createDataFrame([(None, "x", "", "")], "a string, b string, e1 string, e2 string")
    r = edge.select(
        field_similarity(F.col("a"), F.col("b"), "levenshtein").alias("n"),
        field_similarity(F.col("e1"), F.col("e2"), "levenshtein").alias("e"),
        field_similarity(F.col("e1"), F.col("e2"), "token_jaccard").alias("j"),
    ).collect()[0]
    assert r["n"] == 0.0 and r["e"] == 1.0 and r["j"] == 1.0

    with pytest.raises(ValueError, match="scale"):
        field_similarity(F.col("a"), F.col("b"), "numeric")
    with pytest.raises(ValueError, match="unknown method"):
        field_similarity(F.col("a"), F.col("b"), "soundex")


def test_record_linkage_blocking_and_scoring(spark):
    a = spark.createDataFrame(
        [(1, "east", "john smith", 100.0),
         (2, "east", "mary jones", 50.0),
         (3, "west", "john smith", 100.0)],
        "id int, region string, name string, bal double",
    )
    b = spark.createDataFrame(
        [(10, "east", "jon smith", 101.0),     # near-match of a1
         (11, "east", "completely other", 999.0),
         (12, "north", "john smith", 100.0)],  # right fields, wrong block
        "rid int, region string, name string, bal double",
    )
    comps = [
        {"a": "name", "b": "name", "method": "levenshtein", "weight": 2.0},
        {"a": "bal", "b": "bal", "method": "numeric", "scale": 100.0},
    ]
    allp = record_linkage(
        a, b, "id", "rid",
        blocking=[("region", "region")], comparators=comps,
        threshold=0.9, keep_all=True,
    )
    rows = {(r["id"], r["rid"]): r for r in allp.collect()}
    # blocking: only east-east candidates (2x2); the wrong-block perfect
    # match never becomes a candidate
    assert set(rows) == {(1, 10), (1, 11), (2, 10), (2, 11)}
    r110 = rows[(1, 10)]
    assert r110["sim_name"] == pytest.approx(1 - 1 / 10)
    assert r110["sim_bal"] == pytest.approx(0.99)
    assert r110["score"] == pytest.approx((2 * 0.9 + 0.99) / 3)
    assert r110["is_match"]
    matches = record_linkage(
        a, b, "id", "rid",
        blocking=[("region", "region")], comparators=comps, threshold=0.9,
    ).collect()
    assert [(r["id"], r["rid"]) for r in matches] == [(1, 10)]

    # no UDF anywhere in the plan; broadcast=True removes the shuffle join
    plan = allp._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    bc = record_linkage(
        a, b, "id", "rid",
        blocking=[("region", "region")], comparators=comps, broadcast=True,
        keep_all=True,
    )
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()


def test_record_linkage_self_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "k", "abc"), (2, "k", "abd"), (3, "k", None)],
        "id int, blk string, v string",
    )
    comps = [{"a": "v", "b": "v", "method": "levenshtein"}]
    # self-linkage: shared schema must not collide; NULL field scores 0
    out = record_linkage(
        df, df.withColumnRenamed("id", "rid"), "id", "rid",
        blocking=[("blk", "blk")], comparators=comps, keep_all=True,
    )
    got = {(r["id"], r["rid"]): r["sim_v"] for r in out.collect()}
    assert got[(1, 2)] == pytest.approx(1 - 1 / 3)
    assert got[(1, 3)] == 0.0 and got[(3, 3)] == 0.0
    assert got[(1, 1)] == 1.0

    # same source column under two comparators: second name gets the
    # fully qualified <b>_<method> suffix instead of colliding
    two = record_linkage(
        df, df.withColumnRenamed("id", "rid"), "id", "rid",
        blocking=[("blk", "blk")], keep_all=True,
        comparators=[
            {"a": "v", "b": "v", "method": "levenshtein"},
            {"a": "v", "b": "v", "method": "token_jaccard"},
        ],
    )
    assert "sim_v" in two.columns and "sim_v_v_token_jaccard" in two.columns

    with pytest.raises(ValueError, match="blocking"):
        record_linkage(df, df, "id", "rid", blocking=[], comparators=comps)
    # identical id names would emit duplicate output columns: refused
    with pytest.raises(ValueError, match="a_id and b_id"):
        record_linkage(
            df, df, "id", "id", blocking=[("blk", "blk")], comparators=comps
        )
    # an exact duplicate (same column AND method) would silently
    # double-weight that field in the score: refused on the repeat
    # itself, not via the derived-name fallback (which would have
    # minted sim_v / sim_v_exact and let it through)
    with pytest.raises(ValueError, match="appears twice"):
        record_linkage(
            df, df.withColumnRenamed("id", "rid"), "id", "rid",
            blocking=[("blk", "blk")],
            comparators=[
                {"a": "v", "b": "v", "method": "exact"},
                {"a": "v", "b": "v", "method": "exact"},
            ],
        )
    # same a-column + method against two DIFFERENT b-columns is a
    # legitimate Fellegi-Sunter config (a.name vs b.first/b.last) —
    # the duplicate check keys on the full (a, b, method) triple
    # (r10 advice), so this must NOT be rejected
    diff_b = record_linkage(
        df.withColumnRenamed("v", "name"),
        df.select(
            F.col("id").alias("rid"), "blk",
            F.col("v").alias("first"), F.col("v").alias("last"),
        ),
        "id", "rid", blocking=[("blk", "blk")], keep_all=True,
        comparators=[
            {"a": "name", "b": "first", "method": "levenshtein"},
            {"a": "name", "b": "last", "method": "levenshtein"},
        ],
    )
    assert "sim_name" in diff_b.columns
    # the disambiguated name is FULLY QUALIFIED (r11 advice): a bare
    # sim_name_levenshtein would leave which b-column it scores
    # order-dependent
    assert "sim_name_last_levenshtein" in diff_b.columns
    assert "sim_name_levenshtein" not in diff_b.columns
    assert diff_b.count() > 0

    # THREE comparators sharing (a, method): every disambiguated name
    # carries its b-column instead of tripping the defensive
    # collision check with a misleading rename-your-column error
    three = record_linkage(
        df.withColumnRenamed("v", "name"),
        df.select(
            F.col("id").alias("rid"), "blk",
            F.col("v").alias("first"), F.col("v").alias("mid"),
            F.col("v").alias("last"),
        ),
        "id", "rid", blocking=[("blk", "blk")], keep_all=True,
        comparators=[
            {"a": "name", "b": "first", "method": "levenshtein"},
            {"a": "name", "b": "mid", "method": "levenshtein"},
            {"a": "name", "b": "last", "method": "levenshtein"},
        ],
    )
    assert "sim_name_mid_levenshtein" in three.columns
    assert "sim_name_last_levenshtein" in three.columns
    assert three.count() > 0

    with pytest.raises(ValueError, match="not in side 'b'"):
        record_linkage(
            df, df.drop("v").withColumnRenamed("id", "rid"), "id", "rid",
            blocking=[("blk", "blk")], comparators=comps,
        )
    with pytest.raises(ValueError, match="weights"):
        record_linkage(
            df, df.withColumnRenamed("id", "rid"), "id", "rid",
            blocking=[("blk", "blk")],
            comparators=[{"a": "v", "b": "v", "method": "exact", "weight": 0}],
        )
