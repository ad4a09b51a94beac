"""Z-order (Morton space-filling curve) layout clustering — the
multi-column data-skipping lever for 100 TB tables.

Sorting a table by ONE column gives parquet min/max pruning on that
column and destroys it for every other; real query mixes filter on two
or three (``WHERE host = ... AND date BETWEEN ...``). Interleaving the
bits of per-column EQUI-DEPTH bucket ids puts rows that are close in
ALL dimensions into the same files, so every filtered column prunes
row groups — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER
BY`` (public), rebuilt here as plain Spark expressions:

1. per-column bucket boundaries — by default equi-depth via
   ``approxQuantile`` (ONE driver action bounded by ``2**bits`` values
   per column, the parameter-bounded-collect contract of docs/SCALE.md
   invariant #1; equi-depth so skewed columns still spread across the
   full bucket range), or ``boundaries='width'`` (exact deterministic
   equi-width cuts from one min/max agg), or ``boundaries=dict``
   (external stats-catalog cuts — NO action at plan time, the per-write
   zero-overhead path);
2. bucket assignment + bit interleave as pure integer expressions
   (``size(filter(boundaries, b -> b < x))`` then shift/or folds —
   strictly-below, so the minimum lands in bucket 0; see
   ``_bucket_expr``) — whole-stage codegen, no UDF, no shuffle;
3. ``repartitionByRange`` on the z-value (ONE range shuffle — the same
   cost a plain sorted write pays) + ``sortWithinPartitions`` so each
   output file covers a compact z-range.

The z-value is a LAYOUT key, not data: write it dropped (default) and
the parquet footers carry tight per-file min/max on the ORIGINAL
columns, which is what scan pruning reads. NULLs sort into bucket 0
(parquet stats track null counts separately, so NULL-filter pruning is
unaffected).

Scale shape: cost = one bounded quantile job + one range shuffle of the
data — identical asymptotics to ``df.sort(col).write``; there is no
row-count-dependent driver state. First to break at 100 TB: nothing
specific to this operator — the range shuffle is the write itself.
``tests/test_zorder.py`` proves the claim at runtime: a 2-D box filter
over the z-ordered layout reads a fraction of the rows the same filter
reads from a single-column-sorted layout (executed-plan scan metrics,
not prose).

Reference parity: the reference engine has no storage-layout surface
(src/pyspark_data_quality is a rule framework over already-loaded
frames); this is part of the training-data extension surface, composing
with sinks/dataset.py write_dataset and operators/layout.py
file_layout_report (which shows the per-file min/max tightness this
operator creates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_by", "zorder_value"]

_NUMERICish = ("int", "bigint", "smallint", "tinyint", "float", "double",
               "decimal", "date", "timestamp", "timestamp_ntz")


def _as_double(col: str, dtype: str) -> Column:
    """Numeric view of a clustering column. DATE and TIMESTAMP_NTZ do
    not cast to DOUBLE directly (AnalysisException on Spark 4): DATE
    goes through unix_date (days since epoch), NTZ through a TIMESTAMP
    cast (identity under the UTC session TZ) — TIMESTAMP itself casts
    to epoch seconds as a double."""
    c = F.col(col)
    if dtype == "date":
        return F.unix_date(c).cast("double")
    if dtype.startswith("timestamp_ntz"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _bucket_expr(col: str, dtype: str, boundaries: list[float], bits: int) -> Column:
    """Equi-depth bucket id in [0, 2**bits) as a pure expression: the
    count of boundaries STRICTLY below x (strict, so the minimum value
    lands in bucket 0 and a constant column contributes 0 everywhere).
    O(2**bits) comparisons per row inside codegen — bits is small
    (default 8) by design; NULL -> bucket 0. An empty boundary list
    (all-NULL column: approxQuantile has nothing to cut) short-circuits
    to constant bucket 0 — a zero-arg F.array() would otherwise build a
    NULL-typed array and fail analysis."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in boundaries])
    x = _as_double(col, dtype)
    n = F.size(F.filter(arr, lambda b: b < x))
    return F.when(x.isNull(), F.lit(0)).otherwise(
        F.least(n, F.lit((1 << bits) - 1))
    )


def zorder_value(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    relative_error: float = 0.001,
    boundaries=None,
) -> Column:
    """The Morton interleave of the columns' bucket ids, as a single
    long Column. Boundary cost depends on ``boundaries``: the default
    equi-depth runs ONE ``approxQuantile`` action (bounded by
    ``len(cols) * 2**bits``), ``'width'`` one exact min/max agg, and a
    dict NO action at all.

    Exposed separately from :func:`zorder_by` so the same z-value can
    key a ``repartitionByRange`` bucketing scheme, a sampling stratifier,
    or a manual sort. Numeric/date/timestamp columns only: equi-depth
    boundaries come from quantiles, which strings don't have — hash a
    string column to a long first if you must (you lose range pruning
    on it, which is the point of z-ordering, so usually: don't).

    ``boundaries`` picks where the per-column cut points come from:

    - ``None`` (default): equi-DEPTH via ``approxQuantile`` — skew
      -robust, but the sketch boundaries wobble run to run;
    - ``'width'``: exact equi-WIDTH cuts ``min + (max-min) * i/2**bits``
      from ONE exact min/max aggregate — fully DETERMINISTIC (and
      engine-replayable: the dq_zorder oracle rebuilds them in SQL),
      the right choice when the columns are known-unskewed or when a
      reproducible layout matters more than bucket balance;
    - ``dict[col, list[float]]``: externally supplied cut points (a
      stats catalog, yesterday's run) — NO Spark action at plan time,
      the 100 TB writer path where even one quantile job per write is
      unwelcome.
    """
    if not cols:
        raise ValueError("zorder_value: cols must be non-empty")
    if not 1 <= bits <= 16:
        raise ValueError("zorder_value: bits must be in [1, 16]")
    if len(cols) * bits > 63:
        raise ValueError(
            f"zorder_value: {len(cols)} cols x {bits} bits exceeds the "
            "63-bit z-value budget; lower bits"
        )
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"zorder_value: column {c!r} not in df")
        if not dtypes[c].startswith(_NUMERICish):
            raise ValueError(
                f"zorder_value: column {c!r} has type {dtypes[c]}; "
                "z-ordering needs numeric/date/timestamp columns "
                "(quantile boundaries) — hash or bucket strings upstream"
            )
    if isinstance(boundaries, dict):
        missing = [c for c in cols if c not in boundaries]
        if missing:
            raise ValueError(
                f"zorder_value: boundaries dict missing column(s) {missing}"
            )
        cap = (1 << bits) - 1
        for c in cols:
            if len(boundaries[c]) > cap:
                # _bucket_expr clamps to 2**bits-1, so surplus cuts
                # would silently pile most rows into the top bucket —
                # a stats catalog built at a different bits setting
                # must fail loudly, not degenerate the layout
                raise ValueError(
                    f"zorder_value: {len(boundaries[c])} cut points for "
                    f"{c!r} exceed 2**bits-1 = {cap}; rebuild the "
                    f"boundaries for bits={bits} (or raise bits)"
                )
        all_bnds = [[float(b) for b in boundaries[c]] for c in cols]
    elif boundaries == "width":
        # exact equi-width cuts from ONE min/max aggregate. i/2**bits is
        # an exact dyadic rational and the mn + (mx-mn)*q form is a
        # single multiply+add, so any engine recomputing from the same
        # min/max gets bit-identical cut points (the dq_zorder oracle
        # relies on this). finite(): one NaN/Inf value would otherwise
        # poison max() (NaN sorts above everything), turn every cut
        # non-finite, and silently collapse the column to bucket 0
        # (SCALE.md invariant 8).
        from ..functions.expr import finite

        num = df.select(*[_as_double(c, dtypes[c]).alias(c) for c in cols])
        row = num.agg(
            *[F.min(finite(F.col(c))).alias(f"_mn_{c}") for c in cols],
            *[F.max(finite(F.col(c))).alias(f"_mx_{c}") for c in cols],
        ).collect()[0]
        all_bnds = []
        for c in cols:
            mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
            if mn is None or mx is None or mn == mx:
                all_bnds.append([])
                continue
            all_bnds.append(
                [mn + (mx - mn) * (i / (1 << bits))
                 for i in range(1, 1 << bits)]
            )
    elif boundaries is None:
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        num = df.select(*[_as_double(c, dtypes[c]).alias(c) for c in cols])
        all_bnds = num.approxQuantile(cols, probs, relative_error)
    else:
        raise ValueError(
            f"zorder_value: boundaries must be None, 'width', or a "
            f"dict, got {boundaries!r}"
        )
    z = F.lit(0).cast("long")
    for j, (c, bnds) in enumerate(zip(cols, all_bnds)):
        # constant column (or all-NULL): approxQuantile returns equal
        # (or no) boundaries; dedupe so the filter count stays correct
        bnds = sorted(set(bnds))
        bkt = _bucket_expr(c, dtypes[c], bnds, bits).cast("long")
        for b in range(bits):
            # bit b of column j lands at position b*len(cols)+j
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bkt, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + j,
                ).cast("long")
            )
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    num_partitions: int | None = None,
    relative_error: float = 0.001,
    keep_zorder_col: bool = False,
    zorder_col: str = "_zorder",
    boundaries=None,
) -> DataFrame:
    """``df`` re-clustered along the Morton curve of ``cols`` — write the
    result (``write_dataset`` / ``.write``) and each output file covers
    a compact region of the multi-column space, so parquet min/max
    pruning works for filters on ANY of ``cols``.

    ``num_partitions`` sets the output file count (defaults to the
    session shuffle parallelism — size it so files land near your
    target, e.g. total_bytes / 1 GB). The z-value column is dropped by
    default; ``keep_zorder_col=True`` retains it for inspection or
    downstream range bucketing.
    """
    if zorder_col in df.columns:
        raise ValueError(
            f"zorder_by: column {zorder_col!r} already exists; pass a "
            "different zorder_col"
        )
    z = zorder_value(
        df, cols, bits=bits, relative_error=relative_error,
        boundaries=boundaries,
    )
    out = df.withColumn(zorder_col, z)
    parts = [F.col(zorder_col)]
    out = (
        out.repartitionByRange(num_partitions, *parts)
        if num_partitions is not None
        else out.repartitionByRange(*parts)
    ).sortWithinPartitions(zorder_col)
    return out if keep_zorder_col else out.drop(zorder_col)
