"""Skew-mitigation join helpers.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.py) handles most skew at runtime. Salting is
the explicit fallback for the pathological case AQE can't fix: a
single hot key whose matching *build side* row must meet millions of
probe rows — e.g. joining clickstream events to a dimension where 40%
of events share one key.

`salted_join`: the skewed (large) side gets a random salt in
[0, salt), the small side is exploded ×salt; the join key becomes
(key, salt) so the hot key's rows spread over `salt` reducers.
Semantics preserved for inner/left joins (each large-side row still
matches exactly the rows it matched before).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over `salt`
    buckets. `on` must name the key column in BOTH frames. The small
    side is replicated ×salt (explode), so keep it genuinely small
    or let AQE handle it instead.

    Thin compatibility wrapper over the registered ``salted_join``
    operator (operators/skew.py), which replaced this module's
    original ``F.rand(seed=...)`` salt with a DATA-DERIVED xxhash64
    salt: seeded rand is only per-partition-deterministic, so a retry
    or repartition re-dealt the hot key's rows — the operator's salt
    is a pure function of the row and survives both."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    from etl_core_spark.operators.skew import salted_join as _op

    return _op(large, small, [on], how, salt)


def skewness_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts + share of total — the diagnostic to decide
    between AQE, salting, and broadcast.

    The total rides the plan as a broadcast one-row aggregate (the
    engine's lazy contract): an eager ``df.count()`` here scanned the
    full relation at plan-BUILD time and again for the groupBy. The
    total is summed from the per-key aggregate itself, so the two
    subtrees share an IDENTICAL shuffle and ReuseExchange collapses
    them — ONE corpus scan for the whole diagnostic."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = per_key.agg(F.sum("n_rows").alias("__total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("__total"), 6))
        .drop("__total")
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
