"""Data-layout expressions: z-order interleaving for write-time
clustering (beyond-reference; the lakehouse data-skipping story).

Parquet row-group pruning works off per-file min/max statistics: a
filter can skip a file only if the file's value RANGE for that column
is narrow. Sorting by one column makes its ranges tight but leaves
every other column's range full-width. Z-ordering interleaves the
bits of several columns' bucket ids so that rows close in the
composite curve are close in EVERY dimension — each file covers a
small hyper-rectangle, and filters on any of the z-ordered columns
skip most files.

Everything here is plain JVM expressions (shifts/masks over longs) —
whole-stage-codegen friendly, no UDFs, one tiny min/max aggregate
broadcast for normalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims x 16 bits = 32-bit z-values, 65536
#: buckets per column — far finer than any practical file count.
_ZBITS = 16


def _spread_bits(col: Column, ndims: int, offset: int) -> Column:
    """Spread ``_ZBITS`` low bits of ``col`` so consecutive bits land
    ``ndims`` apart, starting at ``offset`` (textbook Morton
    encoding, unrolled to a shift/mask sum the codegen inlines)."""
    out = F.lit(0).cast("long")
    for b in range(_ZBITS):
        bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
        out = out + F.shiftleft(bit, b * ndims + offset)
    return out


def zvalue(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append ``__z``: the Morton (z-order) value of ``cols``.

    Each column is normalized to a 2^16-bucket id over its observed
    [min, max] span — ONE tiny global aggregate, broadcast back, so
    the big side stays a narrow map. Uniform bucketing is the
    documented trade: heavy skew in a dimension concentrates rows in
    few buckets and weakens skipping on that dimension (a
    quantile-based normalizer can replace the min/max one without
    touching the interleave).
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zvalue supports 1-4 columns")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    n = len(cols)
    max_bucket = (1 << _ZBITS) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = hi - lo
        frac = F.when(span > 0, (F.col(c).cast("double") - lo) / span).otherwise(
            F.lit(0.0)
        )
        bucket = F.least(
            F.floor(frac * (1 << _ZBITS)).cast("long"), F.lit(max_bucket)
        )
        # NULLs sort first: bucket 0, same as the minimum
        bucket = F.coalesce(bucket, F.lit(0))
        z = z + _spread_bits(bucket, n, i)
    return with_stats.withColumn("__z", z).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
