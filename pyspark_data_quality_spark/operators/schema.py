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
