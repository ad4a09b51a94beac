"""Survivorship merge (golden-record consolidation): collapse each
duplicate group to ONE merged record under per-column policies.

The step AFTER dedup finds the groups: entity resolution, CRM-style
record consolidation, or merging near-duplicate documents' metadata.
Dedup's ``exact_dedup`` keeps one WHOLE row; this keeps one row whose
COLUMNS are merged across the group — "earliest id wins for the key,
most frequent value wins for the category, take the max of the count".

Policies (all deterministic — golden records must be reproducible):

- ``survivor``        value of the min-``id_col`` row
- ``first_non_null``  value of the min-``id_col`` row WHERE non-null
- ``min`` / ``max`` / ``sum``  the plain aggregate
- ``most_common``     modal NON-NULL value; ties break to the smaller
  value (an explicit total order — engine ``mode()`` leaves ties
  unspecified). NULLs never compete for the mode: a group where NULL
  is the most frequent raw value still elects the best real value,
  and only an all-NULL group merges to NULL (standard survivorship).

Shape: one groupBy covers every policy except ``most_common``, which
needs a (group, value) count per column — each such column adds one
bounded pre-aggregation (vocabulary-sized, map-side combined) and a
rank window over the VALUE spine, joined back. No collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.joins import join_null_safe

_PLAIN = ("survivor", "first_non_null", "min", "max", "sum")


def merge_duplicates(
    df: DataFrame,
    group_col: str,
    id_col: str,
    policies: dict[str, str],
    *,
    min_group_size: int = 1,
) -> DataFrame:
    """One merged record per ``group_col`` value: ``(group_col, id_col
    = min id, n_records, <merged columns>)``. ``min_group_size=2``
    restricts the output to actual duplicate groups."""
    if not policies:
        raise ValueError("merge_duplicates: policies must be non-empty")
    for c, p in policies.items():
        if c not in df.columns:
            raise ValueError(f"merge_duplicates: unknown column {c!r}")
        if p not in _PLAIN + ("most_common",):
            raise ValueError(
                f"merge_duplicates: policy for {c!r} must be one of "
                f"{_PLAIN + ('most_common',)}, got {p!r}"
            )

    aggs = [
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_records"),
    ]
    for c, p in policies.items():
        if p == "survivor":
            aggs.append(F.min_by(c, id_col).alias(c))
        elif p == "first_non_null":
            # min_by ignores rows whose ordering key is NULL, so nulled
            # values simply don't compete
            aggs.append(
                F.min_by(
                    c, F.when(F.col(c).isNotNull(), F.col(id_col))
                ).alias(c)
            )
        elif p in ("min", "max", "sum"):
            aggs.append(getattr(F, p)(c).alias(c))
    merged = df.groupBy(group_col).agg(*aggs)

    for c, p in policies.items():
        if p != "most_common":
            continue
        counts = (
            # NULL is absence, not a candidate: filter before counting so
            # a NULL-modal group still elects its best real value (the
            # left join below yields NULL only for all-NULL groups)
            df.filter(F.col(c).isNotNull())
            .groupBy(group_col, c)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy(group_col).orderBy(
            F.col("_c").desc(), F.col(c).asc()
        )
        top = (
            counts.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(group_col, c)
        )
        # null-safe: a NULL group key still receives its elected mode
        merged = join_null_safe(merged, top, [group_col], "left")

    if min_group_size > 1:
        merged = merged.filter(F.col("n_records") >= min_group_size)
    return merged
