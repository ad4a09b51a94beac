"""Query registry backing ``__spark_entry__.py``.

Each entry pairs a Spark implementation (built on the engine's operators)
with a DuckDB-equivalent ANSI-SQL oracle over the same parquet tables.
Rules for oracle-hash stability:

- every computed column is aliased identically on both sides;
- float aggregates are ``round(x, 6)`` on both sides (double ulp drift
  between Spark's and DuckDB's aggregation orders would break the hash);
- timestamps are cast to DATE (or epoch seconds) where a query exposes
  them, avoiding engine-specific timestamp rendering.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.enums import Dimension
from .manager import DQManager
from .operators import (
    CompletenessColRatioRule,
    CompletenessRawRatioRule,
    FreshnessRule,
    PredicateRule,
    RangeRule,
    RegexMatchRule,
    SetMembershipRule,
    UniqueRule,
)
from .sources.tables import load_table

ENTRY_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: Dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        ENTRY_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: the full DQ report as one deterministic table.
# Exercises: fused single-pass analysis (SURVEY §4), per-column completeness
# (F1-F3), whole-row completeness (F4-F6, threshold bug fixed), uniqueness
# distinct-ratio (F9 as intended), scoped conditions (F11).
# ---------------------------------------------------------------------------

_LINEITEM_COLS = ["l_quantity", "l_extendedprice", "l_returnflag"]


def _flagship_rules():
    return [
        CompletenessColRatioRule(
            columns=_LINEITEM_COLS, threshold=0.99, name="li_completeness"
        ),
        CompletenessRawRatioRule(
            columns=["l_orderkey", "l_partkey", "l_suppkey"],
            threshold=0.99,
            name="li_row_completeness",
        ),
        UniqueRule(
            columns=["l_orderkey", "l_linenumber"],
            threshold=1.0,
            exact=True,
            name="li_pk_unique",
        ),
        UniqueRule(
            columns=["l_orderkey"],
            threshold=0.9,
            exact=True,
            condition="l_returnflag = 'N'",
            name="li_orderkey_unique_scoped",
        ),
    ]


def flagship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic projection of the metrics DataFrame (drops run ids and
    timestamps so the oracle can reproduce it verbatim)."""
    li = load_table(spark, "lineitem", sf_dir)
    mgr = DQManager(spark, dataset="lineitem")
    mgr.set_data(li)
    for r in _flagship_rules():
        mgr.add_rule(r)
    metrics = mgr.run().get_metric_results()
    return metrics.select(
        F.col("metric_name"),
        F.col("column"),
        F.col("dimension"),
        F.col("severity_level"),
        F.round(F.col("value_double"), 6).alias("value"),
        F.round(F.col("threshold"), 6).alias("threshold"),
        F.split(F.col("value_string"), ":").getItem(0).alias("status"),
    )


query("dq_metrics_report")(flagship_report)
ORACLE_SQL["dq_metrics_report"] = """
WITH li AS (SELECT * FROM lineitem),
stats AS (
  SELECT
    round(avg(CASE WHEN l_quantity IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS r_quantity,
    round(avg(CASE WHEN l_extendedprice IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS r_extendedprice,
    round(avg(CASE WHEN l_returnflag IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS r_returnflag,
    round(avg(CASE WHEN l_orderkey IS NOT NULL AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS r_row,
    round(least(count(DISTINCT (l_orderkey, l_linenumber)) * 1.0 / count(*), 1.0), 6) AS r_pk,
    round(least(
      (count(DISTINCT CASE WHEN l_returnflag = 'N' THEN l_orderkey END) * 1.0)
      / nullif(count(CASE WHEN l_returnflag = 'N' THEN 1 END), 0), 1.0), 6) AS r_ok_scoped
  FROM li
)
SELECT 'completeness_col_ratio' AS metric_name, 'l_quantity' AS "column",
       'completeness' AS dimension, 'medium' AS severity_level,
       CAST(r_quantity AS DOUBLE) AS value, CAST(0.99 AS DOUBLE) AS threshold,
       CASE WHEN r_quantity >= 0.99 THEN 'SUCCESS' ELSE 'FAILURE' END AS status FROM stats
UNION ALL
SELECT 'completeness_col_ratio', 'l_extendedprice', 'completeness', 'medium',
       CAST(r_extendedprice AS DOUBLE), CAST(0.99 AS DOUBLE),
       CASE WHEN r_extendedprice >= 0.99 THEN 'SUCCESS' ELSE 'FAILURE' END FROM stats
UNION ALL
SELECT 'completeness_col_ratio', 'l_returnflag', 'completeness', 'medium',
       CAST(r_returnflag AS DOUBLE), CAST(0.99 AS DOUBLE),
       CASE WHEN r_returnflag >= 0.99 THEN 'SUCCESS' ELSE 'FAILURE' END FROM stats
UNION ALL
SELECT 'completeness_raw_ratio', '', 'completeness', 'medium',
       CAST(r_row AS DOUBLE), CAST(0.99 AS DOUBLE),
       CASE WHEN r_row >= 0.99 THEN 'SUCCESS' ELSE 'FAILURE' END FROM stats
UNION ALL
SELECT 'unique_ratio', 'l_orderkey,l_linenumber', 'uniqueness', 'medium',
       CAST(r_pk AS DOUBLE), CAST(1.0 AS DOUBLE),
       CASE WHEN r_pk >= 1.0 THEN 'SUCCESS' ELSE 'FAILURE' END FROM stats
UNION ALL
SELECT 'unique_ratio', 'l_orderkey', 'uniqueness', 'medium',
       CAST(r_ok_scoped AS DOUBLE), CAST(0.9 AS DOUBLE),
       CASE WHEN r_ok_scoped >= 0.9 THEN 'SUCCESS' ELSE 'FAILURE' END FROM stats
"""


# ---------------------------------------------------------------------------
# Valid / invalid split (F1/F2/F4/F5/F12/F13): rows classified by predicate
# rules, failure reasons as a deterministic comma-joined string.
# ---------------------------------------------------------------------------

def _split_rules():
    return [
        CompletenessColRatioRule(columns=["l_quantity", "l_shipdate"], name="nn"),
        # accuracy: discount within [0, 0.08] — deliberately tight so some
        # real rows fail and the invalid path is exercised on clean data.
        RangeRule(
            column="l_discount", min_value=0.0, max_value=0.08,
            threshold=0.8, name="disc_range",
        ),
    ]


@query(
    "dq_valid_rows",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice, 2) AS price, l_returnflag,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_shipdate IS NOT NULL
      AND l_discount >= 0 AND l_discount <= 0.08
    """,
)
def dq_valid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    mgr = DQManager(spark).set_data(li)
    for r in _split_rules():
        mgr.add_rule(r)
    valid = mgr.run().get_valid_df()
    return valid.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round("l_extendedprice", 2).alias("price"),
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "dq_invalid_rows",
    """
    SELECT l_orderkey, l_linenumber, round(l_discount, 2) AS discount,
           concat_ws(',',
             CASE WHEN NOT coalesce(l_discount >= 0 AND l_discount <= 0.08, FALSE)
                  THEN 'disc_range' END,
             CASE WHEN NOT (l_quantity IS NOT NULL AND l_shipdate IS NOT NULL)
                  THEN 'nn' END
           ) AS failed_rules
    FROM lineitem
    WHERE NOT (l_quantity IS NOT NULL AND l_shipdate IS NOT NULL)
       OR NOT coalesce(l_discount >= 0 AND l_discount <= 0.08, FALSE)
    """,
)
def dq_invalid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    mgr = DQManager(spark).set_data(li)
    for r in _split_rules():
        mgr.add_rule(r)
    invalid = mgr.run().get_invalid_df()
    return invalid.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_discount", 2).alias("discount"),
        F.concat_ws(",", F.array_sort("failed_rules")).alias("failed_rules"),
    )


# ---------------------------------------------------------------------------
# Uniqueness surfaces (F7 dedup, F8 duplicate groups).
# ---------------------------------------------------------------------------

@query(
    "dq_dup_groups",
    """
    SELECT l_orderkey, l_linenumber, count(*) AS count
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
    """,
)
def dq_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    rule = UniqueRule(columns=["l_orderkey", "l_linenumber"], name="pk")
    return rule.group_diagnostics(li)


@query(
    "dq_dedup_survivors",
    """
    SELECT l_orderkey, l_linenumber,
           min(l_quantity) AS quantity,
           round(min(l_extendedprice), 2) AS price
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    """,
)
def dq_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: one survivor per key. `dropDuplicates` picks an
    arbitrary row (reference `unique_chek.py:82` inherits that); for an
    oracle-comparable result we take per-key minima — same shuffle shape
    (hash partial-agg on the key) as dropDuplicates at scale."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.min("l_quantity").alias("quantity"),
            F.round(F.min("l_extendedprice"), 2).alias("price"),
        )
    )


# ---------------------------------------------------------------------------
# Scoped completeness on orders (F11 condition pushdown).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Validity / accuracy / consistency / freshness report (roadmap dimensions
# the reference declared but never built — core/_enums.py:11-25).
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "FURNITURE", "BUILDING", "MACHINERY", "HOUSEHOLD"]
_FRESHNESS_NOW = __import__("datetime").datetime(2026, 1, 1)


def _metrics_projection(metrics: DataFrame) -> DataFrame:
    return metrics.select(
        F.col("metric_name"),
        F.col("column"),
        F.col("dimension"),
        F.round(F.col("value_double"), 6).alias("value"),
        F.round(F.col("threshold"), 6).alias("threshold"),
        F.split(F.col("value_string"), ":").getItem(0).alias("status"),
    )


@query(
    "dq_validity_report",
    """
    WITH c AS (
      SELECT
        CAST(round(avg(CASE WHEN c_mktsegment IN ('AUTOMOBILE','FURNITURE','BUILDING','MACHINERY','HOUSEHOLD')
                       THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS seg_ratio,
        CAST(round(avg(CASE WHEN regexp_full_match(c_name, 'Customer#[0-9]{9}')
                       THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS name_ratio,
        CAST(round(avg(CASE WHEN c_acctbal >= 0.0 AND c_acctbal <= 10000.0
                       THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS bal_ratio
      FROM customer
    ), p AS (
      SELECT
        CAST(round(avg(CASE WHEN coalesce(p_size > 0 AND p_retailprice >= 500.0, FALSE)
                       THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS part_ratio
      FROM part
    )
    SELECT 'validity_set' AS metric_name, 'c_mktsegment' AS "column", 'validity' AS dimension,
           seg_ratio AS value, CAST(1.0 AS DOUBLE) AS threshold,
           CASE WHEN seg_ratio >= 1.0 THEN 'SUCCESS' ELSE 'FAILURE' END AS status FROM c
    UNION ALL
    SELECT 'validity_regex', 'c_name', 'validity', name_ratio, CAST(1.0 AS DOUBLE),
           CASE WHEN name_ratio >= 1.0 THEN 'SUCCESS' ELSE 'FAILURE' END FROM c
    UNION ALL
    SELECT 'validity_range', 'c_acctbal', 'validity', bal_ratio, CAST(0.9 AS DOUBLE),
           CASE WHEN bal_ratio >= 0.9 THEN 'SUCCESS' ELSE 'FAILURE' END FROM c
    UNION ALL
    SELECT 'predicate_ratio', 'p_size,p_retailprice', 'accuracy', part_ratio, CAST(0.95 AS DOUBLE),
           CASE WHEN part_ratio >= 0.95 THEN 'SUCCESS' ELSE 'FAILURE' END FROM p
    """,
)
def dq_validity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, "customer", sf_dir)
    part = load_table(spark, "part", sf_dir)
    cust_rules = [
        SetMembershipRule(column="c_mktsegment", allowed=_SEGMENTS, threshold=1.0),
        RegexMatchRule(column="c_name", pattern="Customer#[0-9]{9}", threshold=1.0),
        RangeRule(column="c_acctbal", min_value=0.0, max_value=10000.0, threshold=0.9),
    ]
    part_rules = [
        PredicateRule(
            predicate="p_size > 0 AND p_retailprice >= 500.0",
            columns=["p_size", "p_retailprice"],
            threshold=0.95,
            dimension=Dimension.ACCURACY,
        ),
    ]
    m1 = DQManager(spark).set_data(customer)
    for r in cust_rules:
        m1.add_rule(r)
    m2 = DQManager(spark).set_data(part)
    for r in part_rules:
        m2.add_rule(r)
    out = _metrics_projection(m1.run().get_metric_results()).unionByName(
        _metrics_projection(m2.run().get_metric_results())
    )
    return out


@query(
    "dq_freshness",
    """
    SELECT 'o_orderdate' AS "column", 'freshness' AS dimension,
           CAST(round((epoch(TIMESTAMP '2026-01-01 00:00:00') - epoch(max(o_orderdate))) / 86400.0, 6) AS DOUBLE) AS age_days,
           CASE WHEN (epoch(TIMESTAMP '2026-01-01 00:00:00') - epoch(max(o_orderdate))) / 86400.0 <= 10000.0
                THEN 'SUCCESS' ELSE 'FAILURE' END AS status
    FROM orders
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    rule = FreshnessRule(
        column="o_orderdate", max_age=10000.0, now=_FRESHNESS_NOW, dataset="orders"
    )
    res = DQManager(spark).set_data(orders).add_rule(rule).run()
    return res.get_metric_results().select(
        F.col("column"),
        F.col("dimension"),
        F.round(F.col("value_double"), 6).alias("age_days"),
        F.split(F.col("value_string"), ":").getItem(0).alias("status"),
    )


@query(
    "dq_scoped_completeness",
    """
    SELECT 'o_totalprice' AS "column",
           CAST(round(avg(CASE WHEN o_totalprice IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS value,
           count(*) AS in_scope_rows
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def dq_scoped_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    scope = F.col("o_orderstatus") == "F"
    return orders.agg(
        F.round(
            F.avg(F.when(scope, F.col("o_totalprice").isNotNull().cast("double"))), 6
        ).alias("value"),
        F.count(F.when(scope, F.lit(1))).alias("in_scope_rows"),
    ).select(F.lit("o_totalprice").alias("column"), "value", "in_scope_rows")
