"""Schema contract checks: expected-vs-actual schema drift report.

The reference validated schemas only implicitly (``_pre_check`` raising on
a missing rule column); real pipelines assert a full contract — every
expected column present with the expected type, nothing unexpected
appearing. This is driver-side metadata work (no Spark job reads data):
the report is a ``createDataFrame`` over the comparison of
``df.schema`` with the declared contract.

Type names use Spark's ``simpleString`` vocabulary (``bigint``,
``double``, ``string``, ``timestamp`` …) — engine-neutral enough that the
DuckDB oracle reproduces the report from ``DESCRIBE`` with a type-name
mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: status values, in report order
OK = "ok"
TYPE_MISMATCH = "type_mismatch"
MISSING = "missing"
UNEXPECTED = "unexpected"

_REPORT_SCHEMA = (
    "column string, expected_type string, actual_type string, status string"
)


def schema_report(
    df: DataFrame,
    expected: dict[str, str],
    *,
    allow_unexpected: bool = False,
) -> DataFrame:
    """Compare ``df``'s schema against ``expected`` (column -> simpleString
    type, e.g. ``{"id": "bigint", "ts": "timestamp"}``).

    Returns one row per expected OR actual column:
    ``(column, expected_type, actual_type, status)`` with status
    ``ok`` / ``type_mismatch`` / ``missing`` (expected, absent) /
    ``unexpected`` (present, undeclared — suppressed when
    ``allow_unexpected``). Sorted by column name.
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows: list[tuple[str, str | None, str | None, str]] = []
    for name, etype in expected.items():
        atype = actual.get(name)
        if atype is None:
            rows.append((name, etype, None, MISSING))
        elif atype == etype:
            rows.append((name, etype, atype, OK))
        else:
            rows.append((name, etype, atype, TYPE_MISMATCH))
    if not allow_unexpected:
        for name, atype in actual.items():
            if name not in expected:
                rows.append((name, None, atype, UNEXPECTED))
    rows.sort(key=lambda r: r[0])
    return spark.createDataFrame(rows, _REPORT_SCHEMA)


def schema_ok(df: DataFrame, expected: dict[str, str], **kw) -> bool:
    """True iff every report row is ``ok`` (driver-side, no data read)."""
    report = schema_report(df, expected, **kw)
    return all(r["status"] == OK for r in report.collect())


def candidate_keys(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    max_width: int = 2,
    exact: bool = False,
    rsd: float = 0.01,
    max_combos: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Candidate-key discovery: for every column combination up to
    ``max_width``, how close is it to uniquely identifying a row? The
    profiling primitive behind "what IS the key of this table?" —
    schema archaeology on inherited data, dedup-key selection, join-key
    vetting.

    One row per combo with ``key_cols`` (comma-joined, in ``cols``
    order), ``width``, ``n_rows``, ``n_null_rows`` (rows where ANY
    member is NULL — disqualifying for a key), ``n_distinct`` (over
    NULL-free rows, SQL multi-column DISTINCT semantics),
    ``uniqueness`` (n_distinct / NULL-free rows) and ``is_key``
    (NULL-free and fully unique).

    Scale shape: ONE aggregation job for all combos. Default
    ``exact=False`` counts via ``approx_count_distinct`` (HLL) — every
    combo's sketch lives in the same partial-agg pass, no row
    duplication, shuffle carries one sketch row per partition;
    ``rsd`` trades sketch size vs error, and ``is_key`` is then a
    >= (1 - 2*rsd) screen (approximate evidence, exact-verify the
    survivors). ``exact=True`` uses real COUNT(DISTINCT ...): Catalyst
    expands the input ONCE PER COMBO before the shuffle — at 100 TB
    that multiplier is the whole bill, which is why the combo count is
    capped loudly (``max_combos``) and approx is the default.

    Reference parity: the reference's UniqueCheck
    (src/pyspark_data_quality/checks/unique_check.py) audits ONE
    declared column list; this extension searches the combination
    space.
    """
    import itertools

    from pyspark.sql import functions as F

    use = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in use if c not in df.columns]
    if missing:
        raise ValueError(f"candidate_keys: columns {missing} not in df")
    if not use:
        raise ValueError("candidate_keys: no columns to profile")
    if max_width < 1:
        raise ValueError("candidate_keys: max_width must be >= 1")
    combos = [
        c
        for w in range(1, min(max_width, len(use)) + 1)
        for c in itertools.combinations(use, w)
    ]
    if len(combos) > max_combos:
        raise ValueError(
            f"candidate_keys: {len(combos)} combinations exceed "
            f"max_combos={max_combos} — narrow cols/max_width, or raise "
            "the cap knowingly (exact mode expands the input once per "
            "combo)"
        )

    def _cnt(combo):
        cs = [F.col(c) for c in combo]
        if exact:
            return F.count_distinct(*cs)
        return F.approx_count_distinct(F.struct(*cs), rsd)

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, combo in enumerate(combos):
        any_null = None
        for c in combo:
            n = F.col(c).isNull()
            any_null = n if any_null is None else (any_null | n)
        aggs.append(
            F.sum(any_null.cast("long")).alias(f"_nn{i}")
        )
        if exact:
            aggs.append(_cnt(combo).alias(f"_nd{i}"))
        else:
            # approx over NULL-free rows only, mirroring exact
            # COUNT(DISTINCT ...) semantics (struct() would otherwise
            # happily count NULL-bearing tuples)
            aggs.append(
                F.approx_count_distinct(
                    F.when(~any_null, F.struct(*[F.col(c) for c in combo])),
                    rsd,
                ).alias(f"_nd{i}")
            )
    row = df.agg(*aggs)

    floor_ratio = 1.0 if exact else 1.0 - 2 * rsd
    combo_rows = F.array(*[
        F.struct(
            F.lit(",".join(combo)).alias("key_cols"),
            F.lit(len(combo)).alias("width"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"_nn{i}").alias("n_null_rows"),
            F.col(f"_nd{i}").alias("n_distinct"),
        )
        for i, combo in enumerate(combos)
    ])
    out = (
        row.select(F.explode(combo_rows).alias("_c"))
        .select("_c.*")
        .withColumn(
            "uniqueness",
            F.round(
                F.try_divide(
                    F.col("n_distinct"),
                    F.col("n_rows") - F.col("n_null_rows"),
                ),
                round_to,
            ),
        )
        .withColumn(
            "is_key",
            (F.col("n_null_rows") == 0)
            & (
                F.col("n_distinct")
                >= F.lit(floor_ratio) * F.col("n_rows")
            ),
        )
    )
    return out.orderBy("width", "key_cols")
