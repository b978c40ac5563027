"""Table profiling (beyond-reference): one-pass column statistics.

``profile`` answers "what is in this table" — row/null counts, NDV,
numeric range and mean, string length range — as a melted DataFrame
(one row per column), the shape a data-quality dashboard or a schema
drift monitor consumes.

Scale shape: ALL plain statistics for ALL columns come from ONE
aggregate pass (map-side combinable; the melt to rows is a
``stack`` projection over the single result row, not a per-column
scan). NDV is the special case:

- ``approx_ndv=True`` (default): ``approx_count_distinct`` rides in
  the SAME single pass — no extra scan, no shuffle amplification.
  This is the only sane default at 100 TB.
- ``approx_ndv=False``: exact ``count(DISTINCT c)`` for K columns
  makes Catalyst Expand the input K-fold before the shuffle (the
  same explosion operators/aggregation.py documents for nunique) —
  it runs as a second, separate aggregate so the cheap statistics
  never pay for it. Used by the oracle row, where exactness is the
  point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_ndv: bool = True,
) -> DataFrame:
    """Melted per-column statistics: ``(column, n_rows, n_nulls, ndv,
    min_num, max_num, mean, min_str, max_str)``. Numeric-only stats
    are NULL for string columns and vice versa; ``mean`` is rounded
    to 6 dp for cross-engine comparability."""
    cols = list(columns) if columns else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise OperatorConfigError(f"profile: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        if isinstance(dt, _NUMERIC):
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("double").alias(f"__max_{c}"),
                F.round(F.avg(F.col(c)), 6).alias(f"__mean_{c}"),
            ]
        elif isinstance(dt, T.StringType):
            aggs += [
                F.min(F.col(c)).alias(f"__smin_{c}"),
                F.max(F.col(c)).alias(f"__smax_{c}"),
            ]
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            # temporal range surfaces in the string slots, formatted
            # engine-neutrally (a raw cast's text form is dialect soup)
            fmt = "yyyy-MM-dd HH:mm:ss"
            aggs += [
                F.date_format(F.min(F.col(c)), fmt).alias(f"__smin_{c}"),
                F.date_format(F.max(F.col(c)), fmt).alias(f"__smax_{c}"),
            ]
        if approx_ndv:
            aggs.append(F.approx_count_distinct(c).alias(f"__ndv_{c}"))
    stats = df.agg(*aggs)

    if not approx_ndv:
        # exact NDV Expands the input K-fold — keep it out of the
        # cheap pass (see module docstring)
        ndv = df.agg(
            *[F.countDistinct(c).alias(f"__ndv_{c}") for c in cols]
        )
        stats = stats.crossJoin(F.broadcast(ndv))

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in cols:
        dt = df.schema[c].dataType
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(
            dt, (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType)
        )
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__ndv_{c}").cast("long").alias("ndv"),
                (F.col(f"__min_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else null_d).alias("max_num"),
                (F.col(f"__mean_{c}") if is_num else null_d).alias("mean"),
                (F.col(f"__smin_{c}") if is_str else null_s).alias("min_str"),
                (F.col(f"__smax_{c}") if is_str else null_s).alias("max_str"),
            )
        )
    melted = stats.select(F.explode(F.array(*rows)).alias("__p"))
    return melted.select("__p.*")


@register_operator("profile")
class ProfileOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        pass  # all config optional

    def apply(self, inputs: PortMap) -> PortMap:
        return {
            "out": profile(
                self.single_input(inputs),
                list(self.config.get("columns") or []) or None,
                bool(self.config.get("approx_ndv", True)),
            )
        }
