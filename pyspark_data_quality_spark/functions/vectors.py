"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no
Python UDF, no Arrow hop — so similarity math stays inside whole-stage
codegen and scales linearly with rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_dim(df: DataFrame, vec_col: str, dim: int | None = None) -> int | None:
    """Resolve the embedding dimensionality WITHOUT a Spark job when the
    caller supplies ``dim`` (the scale path — plan construction must not
    fire actions). Fallback: probe one non-null row (one small Spark job,
    documented); returns None on an empty/all-null column so callers can
    short-circuit to an empty result instead of crashing on ``len(None)``.
    """
    if dim is not None:
        return int(dim)
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return None if row is None else len(row[0])


def hyperplane_bucket_keys(vec: Column, tables: list[list[list[float]]]) -> Column:
    """Random-hyperplane LSH bucket keys: ``array<struct<t:int, k:bigint>>``,
    one entry per table; key bit i = sign of dot(vec, plane_i).

    The hyperplanes are ONE nested array literal (constant-folded by
    Catalyst) traversed with zip_with/aggregate lambdas — a single folded
    expression regardless of tables x planes, instead of one aggregate tree
    per plane (72 trees at 6x12 made codegen the bottleneck, not the math).
    """
    tbls = F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(w)) for w in plane]) for plane in planes]
            )
            for planes in tables
        ]
    )
    return F.zip_with(
        tbls,
        F.sequence(F.lit(0), F.lit(len(tables) - 1)),
        lambda planes, t: F.struct(
            t.cast("int").alias("t"),
            F.aggregate(
                planes,
                F.lit(0).cast("long"),
                # MSB-first bit packing: acc*2 + sign-bit. num_planes <= 62
                # so the long never overflows.
                lambda acc, plane: acc * 2
                + F.when(
                    F.aggregate(
                        F.zip_with(vec, plane, lambda x, w: x * w),
                        F.lit(0.0).cast("double"),
                        lambda a, v: a + v,
                    )
                    > 0,
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            ).alias("k"),
        ),
    )


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (avoid div-0)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n)).otherwise(a)
