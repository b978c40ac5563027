"""Vector/embedding column expressions (beyond-reference).

Embeddings are ``array<float>`` columns; all arithmetic uses Spark
higher-order functions (``zip_with`` / ``aggregate``) so dot products
and norms run inside codegen — no Python in the per-row path. For
very wide vectors a Pandas-UDF/numpy path would win on SIMD; at
d=64 the JVM expression path avoids Arrow transfer entirely and is
the right default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def unit(a: Column) -> Column:
    """Vector scaled to unit length (zero vector stays zero).

    Pre-normalizing each side once turns per-pair cosine into a bare
    dot product — at n×m pair scale this removes two norm scans +
    sqrt per pair (≈3× less arithmetic on the quadratic stage)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n)).otherwise(
        F.transform(a, lambda x: x.cast("double"))
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into
    a long. ``planes`` are fixed (seeded) driver-side constants, so
    the bucket computation is a deterministic narrow map — the basis
    of the shuffle-free ANN candidate join."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec, plane) >= 0, F.lit(2 ** i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
