"""k-anonymity / l-diversity / suppression semantics (operators/privacy.py)."""

import pytest

from pyspark_data_quality_spark.core.errors import RuleConfigurationError
from pyspark_data_quality_spark.operators.privacy import (
    equivalence_classes,
    kanonymity_report,
    l_diversity_report,
    riskiest_classes,
    suppress_below_k,
)


@pytest.fixture(scope="module")
def people(spark):
    # QI = (zip, age_band); classes: (10, 'a') x4, (10, 'b') x2,
    # (20, 'a') x1, (NULL, 'a') x2  -> sizes {4, 2, 1, 2}
    rows = [
        (1, 10, "a", "flu"),
        (2, 10, "a", "flu"),
        (3, 10, "a", "cold"),
        (4, 10, "a", None),
        (5, 10, "b", "flu"),
        (6, 10, "b", "hiv"),
        (7, 20, "a", "flu"),
        (8, None, "a", "flu"),
        (9, None, "a", "flu"),
    ]
    return spark.createDataFrame(
        rows, "id int, zip int, band string, dx string"
    )


def test_equivalence_classes_null_is_a_value(spark, people):
    got = {
        (r["zip"], r["band"]): r["class_size"]
        for r in equivalence_classes(people, ["zip", "band"]).collect()
    }
    assert got == {(10, "a"): 4, (10, "b"): 2, (20, "a"): 1, (None, "a"): 2}


def test_kanonymity_ladder(spark, people):
    rep = {
        r["k"]: r
        for r in kanonymity_report(
            people, ["zip", "band"], thresholds=(2, 3, 5)
        ).collect()
    }
    assert set(rep) == {2, 3, 5}
    for r in rep.values():
        assert r["n_rows"] == 9 and r["n_classes"] == 4
        assert r["min_size"] == 1
    # k=2: only the singleton class (1 row) is below
    assert rep[2]["rows_below_k"] == 1 and rep[2]["classes_below_k"] == 1
    # k=3: singleton + both 2-row classes
    assert rep[3]["rows_below_k"] == 5 and rep[3]["classes_below_k"] == 3
    # k=5: everything
    assert rep[5]["rows_below_k"] == 9 and rep[5]["classes_below_k"] == 4
    assert rep[5]["pct_rows_below_k"] == 1.0
    assert rep[2]["pct_rows_below_k"] == round(1 / 9, 6)


def test_kanonymity_empty_input(spark, people):
    rep = kanonymity_report(
        people.where("id < 0"), ["zip"], thresholds=(2,)
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_rows"] == 0 and r["n_classes"] == 0
    assert r["min_size"] is None
    assert r["rows_below_k"] == 0 and r["pct_rows_below_k"] is None


def test_l_diversity_counts_distinct_nonnull(spark, people):
    rep = {
        r["l"]: r
        for r in l_diversity_report(
            people, ["zip", "band"], "dx", thresholds=(2, 3)
        ).collect()
    }
    # diversities: (10,a) -> {flu, cold} = 2; (10,b) -> {flu, hiv} = 2;
    # (20,a) -> {flu} = 1; (NULL,a) -> {flu} = 1
    for r in rep.values():
        assert r["n_rows"] == 9 and r["n_classes"] == 4
        assert r["min_size"] == 1  # min diversity
    assert rep[2]["classes_below_l"] == 2 and rep[2]["rows_below_l"] == 3
    assert rep[3]["classes_below_l"] == 4 and rep[3]["rows_below_l"] == 9


def test_l_diversity_all_null_class_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", None)], "id int, qi string, s string"
    )
    r = l_diversity_report(df, ["qi"], "s", thresholds=(2,)).collect()[0]
    assert r["min_size"] == 0
    assert r["classes_below_l"] == 1 and r["rows_below_l"] == 2


def test_riskiest_classes_order_and_bound(spark, people):
    got = riskiest_classes(people, ["zip", "band"], top=2).collect()
    assert len(got) == 2
    assert (got[0]["zip"], got[0]["band"], got[0]["class_size"]) == (
        20, "a", 1,
    )
    # tie between the two 2-row classes: NULL zip sorts first
    assert got[1]["zip"] is None and got[1]["class_size"] == 2


def test_suppress_below_k(spark, people):
    out = suppress_below_k(people, ["zip", "band"], k=2).collect()
    by_id = {r["id"]: r for r in out}
    # only the singleton class (id 7) is suppressed
    assert by_id[7]["zip"] is None and by_id[7]["band"] is None
    assert by_id[7]["suppressed"] == 1
    assert by_id[7]["dx"] == "flu"  # non-QI columns untouched
    for i in (1, 2, 3, 4, 5, 6, 8, 9):
        assert by_id[i]["suppressed"] == 0
    # original NULL-QI rows are NOT flagged (their class has 2 members)
    assert by_id[8]["band"] == "a"
    # surviving rows are k-anonymous by construction
    survivors = [r for r in out if r["suppressed"] == 0]
    sizes: dict = {}
    for r in survivors:
        sizes[(r["zip"], r["band"])] = sizes.get((r["zip"], r["band"]), 0) + 1
    assert min(sizes.values()) >= 2


def test_suppress_below_k_flag_optional_and_schema_kept(spark, people):
    out = suppress_below_k(people, ["zip"], k=100, flag_col=None)
    assert out.columns == people.columns
    assert out.schema == people.schema  # types preserved through the when()
    assert all(r["zip"] is None for r in out.collect())


def test_config_validation(spark, people):
    with pytest.raises(RuleConfigurationError):
        kanonymity_report(people, [], thresholds=(2,))
    with pytest.raises(RuleConfigurationError):
        kanonymity_report(people, ["zip"], thresholds=(1,))
    with pytest.raises(RuleConfigurationError):
        l_diversity_report(people, ["zip", "dx"], "dx")
    with pytest.raises(RuleConfigurationError):
        suppress_below_k(people, ["zip"], k=2, flag_col="dx")
    with pytest.raises(RuleConfigurationError):
        riskiest_classes(people, ["zip"], top=0)


def test_single_aggregation_plan(spark, people):
    """The ladder must stay ONE aggregate: no per-threshold jobs."""
    plan = kanonymity_report(
        people, ["zip", "band"], thresholds=(2, 5, 10, 20, 50)
    )._jdf.queryExecution().optimizedPlan().toString()
    # exactly two Aggregates (per-class + global), however many thresholds
    assert plan.count("Aggregate") == 2
