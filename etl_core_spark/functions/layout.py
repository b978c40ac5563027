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


def _spread_bits(col: Column, ndims: int, offset: int, bits: int = _ZBITS) -> Column:
    """Spread ``bits`` low bits of ``col`` so consecutive bits land
    ``ndims`` apart, starting at ``offset`` (textbook Morton
    encoding, unrolled to a shift/mask sum the codegen inlines)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
        out = out + F.shiftleft(bit, b * ndims + offset)
    return out


#: quantile mode: bits per dimension (256 boundaries); the per-row
#: assignment folds over the boundary array, so this bounds the
#: per-row work at 2^_QBITS comparisons
_QBITS = 8


def zvalue(df: DataFrame, cols: list[str], method: str = "range") -> DataFrame:
    """Append ``__z``: the Morton (z-order) value of ``cols``.

    ``method="range"``: each column is normalized to a 2^16-bucket id
    over its observed [min, max] span — ONE tiny global aggregate,
    broadcast back, so the big side stays a narrow map. Uniform
    bucketing is the documented trade: heavy skew in a dimension
    concentrates rows in few buckets and weakens skipping there.

    ``method="quantile"``: normalization by the column's approximate
    CDF instead — 2^8 percentile_approx boundaries per column (one
    aggregate pass, KB-sized broadcast), per-row bucket = count of
    boundaries <= value via a fold over the boundary array (O(256)
    JVM comparisons per row, no UDF). Buckets are equi-POPULATED
    regardless of distribution, so a zipf-skewed column still spreads
    across the curve. 8 bits per dimension is plenty: it bounds file
    counts at 2^(8·dims) distinct cells, far above any real layout.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zvalue supports 1-4 columns")
    if method not in ("range", "quantile"):
        raise ValueError("zvalue method must be 'range' or 'quantile'")
    n = len(cols)
    if method == "quantile":
        nb = 1 << _QBITS
        probs = [i / nb for i in range(1, nb)]
        stats = df.agg(
            *[
                F.percentile_approx(F.col(c).cast("double"), probs, 10000).alias(
                    f"__qs_{c}"
                )
                for c in cols
            ]
        )
        with_stats = df.crossJoin(F.broadcast(stats))
        z = F.lit(0).cast("long")
        for i, c in enumerate(cols):
            v = F.col(c).cast("double")
            bucket = F.aggregate(
                F.col(f"__qs_{c}"),
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
            )
            bucket = F.coalesce(bucket, F.lit(0))  # NULL value -> first cell
            # buckets are 8-bit here: spreading the default 16 would
            # generate 8 always-zero terms per dimension (and put the
            # top dead term on the sign bit at 4 dims)
            z = z + _spread_bits(bucket, n, i, _QBITS)
        return with_stats.withColumn("__z", z).drop(
            *[f"__qs_{c}" for c in cols]
        )

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    # total interleaved bits must stay under the long SIGN bit: with
    # 4 dims x 16 bits the top bit of dim 4 would land at position 63,
    # making the upper half of that dimension NEGATIVE and breaking
    # z-curve monotonicity — so cap bits-per-dim at floor(63 / ndims)
    zbits = min(_ZBITS, 63 // n)
    max_bucket = (1 << zbits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = hi - lo
        frac = F.when(span > 0, (F.col(c).cast("double") - lo) / span).otherwise(
            F.lit(0.0)
        )
        bucket = F.least(
            F.floor(frac * (1 << zbits)).cast("long"), F.lit(max_bucket)
        )
        # NULLs sort first: bucket 0, same as the minimum
        bucket = F.coalesce(bucket, F.lit(0))
        z = z + _spread_bits(bucket, n, i, zbits)
    return with_stats.withColumn("__z", z).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
