"""Time-series / profiling operators (beyond-reference).

- ``zscore_outliers``: flag rows whose value deviates more than k
  standard deviations from their group mean. Two-pass shape: a tiny
  per-group stats aggregate broadcast back onto the stream — no
  window function, no per-group sort, so the big side stays a narrow
  map (the classic scalable outlier pass; a Window over the group
  would sort 100 TB for no reason).
- ``densify_buckets``: fill gaps in a per-key bucketed series — the
  missing (key, bucket) combinations materialize with a fill value.
  Built from ``sequence``/``explode`` over each key's observed
  [min, max] span + a left anti-ish join; the bucket span table is
  tiny (one row per key) and the explode is bounded by span/step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.0,
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """Annotate rows with (mean, std, zscore, is_outlier) computed
    per group (or globally when ``group_cols`` is empty). std is the
    sample standard deviation (ddof=1, matching the aggregation
    operator and DuckDB's ``stddev``); groups with std 0/NULL (single
    row or constant) get zscore 0 and are never outliers.

    ``broadcast_stats``: the stats relation is one row per group —
    tiny for low-cardinality groups but O(|groups|) for per-user /
    per-domain calls, so the broadcast hint is stats-gated like
    ``funnel``'s (``None`` default: hint only when the optimizer
    estimate fits 8 MB; ``True`` forces; ``False`` never — the join
    then shuffles both sides on the group keys)."""
    group_cols = list(group_cols or [])
    stats_aggs = [
        F.avg(value_col).alias("__mean"),
        F.stddev_samp(value_col).alias("__std"),
    ]
    if group_cols:
        stats = df.groupBy(*group_cols).agg(*stats_aggs)
        # eqNullSafe per key: groupBy KEEPS null-key groups (their
        # stats exist), but a plain equi-join would silently DROP
        # every null-key row on the way back — an annotate operator
        # must never change the row count (same bug class as
        # exact_dedup's survivor join)
        stats_r = stats.select(
            *[F.col(c).alias(f"__g_{c}") for c in group_cols], "__mean", "__std"
        )
        cond = None
        for c in group_cols:
            eq = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = eq if cond is None else (cond & eq)
        joined = df.join(
            _maybe_broadcast(stats_r, broadcast_stats), on=cond
        ).drop(*[f"__g_{c}" for c in group_cols])
    else:
        # global stats: exactly one row — always broadcastable
        stats = df.agg(*stats_aggs)
        joined = df.crossJoin(F.broadcast(stats))
    z = F.when(
        F.col("__std").isNotNull() & (F.col("__std") > 0),
        (F.col(value_col) - F.col("__mean")) / F.col("__std"),
    ).otherwise(F.lit(0.0))
    return (
        joined.withColumn("zscore", F.round(z, 6))
        # a NULL value has no zscore (kept NULL — honest), but the
        # FLAG must be a real boolean: a NULL is_outlier row vanishes
        # from BOTH branches of a filter(is_outlier)/filter(~is_outlier)
        # split, breaking the row-preserving annotate contract
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
        .withColumn("mean", F.round("__mean", 6))
        .withColumn("std", F.round("__std", 6))
        .drop("__mean", "__std")
    )


def densify_buckets(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step: Column | str,
    agg_cols: dict[str, str] | None = None,
    fill: float = 0.0,
) -> DataFrame:
    """Aggregate to (key, bucket) and fill the missing buckets in
    each key's observed [min(bucket), max(bucket)] span with ``fill``.

    ``step`` is the bucket stride — an INTERVAL expression string for
    timestamp buckets (e.g. ``"INTERVAL 1 HOUR"``) or a Column/long
    for numeric buckets. ``agg_cols`` maps output name → "sum:col" /
    "count:*" specs applied during bucketing.

    Plan shape: one aggregation to buckets; one tiny per-key span
    aggregate exploded via ``sequence`` (bounded by span/step rows
    per key); a FULL OUTER join between the dense spine and the
    sparse buckets — observed buckets that do not land on the
    min+k*step grid (irregular data) keep their rows and aggregates
    instead of being silently dropped by a spine-sided left join.
    The spine is proportional to the OUTPUT, never the input."""
    agg_cols = agg_cols or {"n": "count:*"}
    aggs = []
    for out_name, spec in agg_cols.items():
        op, _, col = spec.partition(":")
        if op == "count":
            aggs.append(F.count(F.lit(1)).alias(out_name))
        elif op == "sum":
            aggs.append(F.round(F.sum(col), 6).alias(out_name))
        else:
            raise OperatorConfigError(f"unknown densify agg {spec!r}")
    sparse = df.groupBy(*key_cols, bucket_col).agg(*aggs)

    step_expr = F.expr(step) if isinstance(step, str) else step
    spans = sparse.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step_expr)).alias(
            bucket_col
        ),
    )
    # NULL-SAFE full outer join: groupBy keeps NULL-key groups and the
    # spine generates their buckets, but plain key equality never
    # matches NULL = NULL — each observed NULL-key bucket would come
    # out TWICE (real aggregate + fill row). Same eqNullSafe treatment
    # as zscore's join-back above.
    join_cols = [*key_cols, bucket_col]
    spine_r = spine.select(
        *[F.col(c).alias(f"__sp_{c}") for c in join_cols]
    )
    cond = None
    for c in join_cols:
        eq = F.col(f"__sp_{c}").eqNullSafe(F.col(c))
        cond = eq if cond is None else (cond & eq)
    out = spine_r.join(sparse, on=cond, how="full").select(
        *[
            F.coalesce(F.col(c), F.col(f"__sp_{c}")).alias(c)
            for c in join_cols
        ],
        *[F.col(n) for n in agg_cols],
    )
    for out_name in agg_cols:
        # fill in the column's OWN dtype (a count stays long; 0.0
        # would silently widen it to double and break schema parity)
        dtype = sparse.schema[out_name].dataType
        out = out.withColumn(
            out_name, F.coalesce(F.col(out_name), F.lit(fill).cast(dtype))
        )
    return out


def _maybe_broadcast(df: DataFrame, force: bool | None, cap_bytes: int = 8 << 20):
    """Stats-gated broadcast hint — delegates to the engine-wide
    policy (session.maybe_broadcast) so all gates stay in sync."""
    from etl_core_spark.session import maybe_broadcast

    return maybe_broadcast(df, force, cap_bytes)


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    broadcast_stages: bool | None = None,
) -> DataFrame:
    """Ordered-sequence (funnel) analysis: for each user, how many of
    ``steps`` completed in order, each step strictly after the one
    before it. Output: one row per user who reached step 1, with
    ``stage`` (1..len(steps)) = deepest step reached.

    Scale shape — cascaded conditional-min aggregates, NOT a per-user
    ``collect_list``: a power user with millions of events would blow
    per-task memory if the engine gathered their whole history into
    one array. Instead stage k is ``min(ts) WHERE type = step_k AND
    ts > t_{k-1}``: a map-side-combinable aggregate over the events
    relation joined to the one-row-per-user stage-(k-1) table.
    ``broadcast_stages``: the stage table is small for product-scale
    funnels but is O(|users|) — at web scale it can be hundreds of
    millions of rows, so the broadcast hint is stats-gated (``None``
    default: hint only when the estimate fits 8 MB; ``True`` forces —
    the events side then never shuffles; ``False`` never). len(steps)
    passes over the (already type-pruned) events; state per user is
    one timestamp.
    """
    if not steps:
        raise OperatorConfigError("funnel requires at least one step")
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__type"),
    ).where(F.col(type_col).isin(list(steps)))

    reached = (
        ev.where(F.col("__type") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("__type") == step)
            .join(
                _maybe_broadcast(
                    reached.select("__u", f"__t{k - 1}"), broadcast_stages
                ),
                on="__u",
            )
            .where(F.col("__ts") > F.col(f"__t{k - 1}"))
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"__t{k}"))
        )
        reached = reached.join(nxt, on="__u", how="left")
    stage = F.lit(1)
    for k in range(2, len(steps) + 1):
        stage = F.when(F.col(f"__t{k}").isNotNull(), F.lit(k)).otherwise(stage)
    # deepest non-null __tk wins; __tk is only non-null if __t{k-1} was
    return reached.select(
        F.col("__u").alias(user_col), stage.cast("int").alias("stage")
    )


@register_operator("funnel")
class FunnelOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        for key in ("user_col", "ts_col", "type_col", "steps"):
            if not self.config.get(key):
                raise OperatorConfigError(f"funnel requires {key!r}")

    def apply(self, inputs: PortMap) -> PortMap:
        c = self.config
        return {
            "out": funnel(
                self.single_input(inputs), c["user_col"], c["ts_col"],
                c["type_col"], list(c["steps"]),
                c.get("broadcast_stages"),
            )
        }


@register_operator("zscore_outliers")
class ZscoreOutliersOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        if not self.config.get("value_col"):
            raise OperatorConfigError("zscore_outliers requires 'value_col'")
        self.threshold = float(self.config.get("threshold", 3.0))

    def apply(self, inputs: PortMap) -> PortMap:
        return {
            "out": zscore_outliers(
                self.single_input(inputs),
                self.config["value_col"],
                list(self.config.get("group_cols") or []),
                self.threshold,
                self.config.get("broadcast_stats"),
            )
        }


@register_operator("densify_buckets")
class DensifyBucketsOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        for key in ("key_cols", "bucket_col", "step"):
            if not self.config.get(key):
                raise OperatorConfigError(f"densify_buckets requires {key!r}")

    def apply(self, inputs: PortMap) -> PortMap:
        return {
            "out": densify_buckets(
                self.single_input(inputs),
                list(self.config["key_cols"]),
                self.config["bucket_col"],
                self.config["step"],
                self.config.get("agg_cols"),
                float(self.config.get("fill", 0.0)),
            )
        }


_ROLLING_AGGS = ("sum", "count", "mean", "min", "max")


def rolling_aggregate(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_seconds: int,
    partition_cols: list[str] | None = None,
    aggs: tuple[str, ...] = ("sum", "count"),
    value_decimals: int = 2,
    out_prefix: str = "rolling_",
) -> DataFrame:
    """Per-row trailing time-window aggregates (moving sum / count /
    mean / min / max over the last ``window_seconds``, bounds
    inclusive — SQL ``RANGE BETWEEN x PRECEDING AND CURRENT ROW``
    semantics, so equal timestamps are peers and share a frame).

    Cross-engine float discipline: sums and means go through
    fixed-point cents (``round(value·10^d)`` as BIGINT — exact,
    order-independent addition) and come back to double via ONE
    division, because engines disagree on windowed double-sum
    accumulation order (Spark incremental, DuckDB segment tree).
    ``min``/``max`` are order-free and stay double. Rows whose time
    is NULL get NULL rolling columns (engines disagree on NULL
    ORDER-BY peer groups; a contract beats a quirk).

    Scale shape: ONE keyed shuffle (the window partition), no joins,
    no second scan. Empty ``partition_cols`` means a single global
    ordered partition — one reducer; only for small inputs
    (validated loudly at the operator surface).
    """
    from pyspark.sql import Window

    bad = [a for a in aggs if a not in _ROLLING_AGGS]
    if bad:
        raise OperatorConfigError(
            f"unknown rolling aggs {bad!r}; have {_ROLLING_AGGS}"
        )
    scale = 10 ** int(value_decimals)
    base = df.withColumn(
        "__ts", F.col(time_col).cast("timestamp").cast("long")
    )
    ok = base.where(F.col("__ts").isNotNull())
    nul = base.where(F.col("__ts").isNull())
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy("__ts")
        .rangeBetween(-int(window_seconds), 0)
    )
    cents = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast(
        "long"
    )
    sum_cents = F.sum(cents).over(w)
    cnt = F.count(F.col(value_col)).over(w)
    out_exprs = {
        "sum": lambda: sum_cents.cast("double") / F.lit(float(scale)),
        "count": lambda: cnt,
        "mean": lambda: sum_cents.cast("double") / (cnt * F.lit(scale)),
        "min": lambda: F.min(F.col(value_col).cast("double")).over(w),
        "max": lambda: F.max(F.col(value_col).cast("double")).over(w),
    }
    for a in aggs:
        ok = ok.withColumn(out_prefix + a, out_exprs[a]())
        nul = nul.withColumn(
            out_prefix + a,
            F.lit(None).cast("long" if a == "count" else "double"),
        )
    return ok.unionByName(nul).drop("__ts")


@register_operator("rolling_aggregate")
class RollingAggregateOperator(Operator):
    """Config: ``time_col``, ``value_col``, ``window_seconds``
    (required); ``partition_cols``, ``aggs``, ``value_decimals``,
    ``out_prefix``."""

    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        for key in ("time_col", "value_col", "window_seconds"):
            if not self.config.get(key):
                raise OperatorConfigError(f"rolling_aggregate requires {key!r}")
        if not self.config.get("partition_cols") and not self.config.get(
            "allow_global_window"
        ):
            raise OperatorConfigError(
                "rolling_aggregate without partition_cols runs on ONE "
                "reducer; pass allow_global_window=true to accept that "
                "on a small input"
            )

    def apply(self, inputs: PortMap) -> PortMap:
        c = self.config
        return {
            "out": rolling_aggregate(
                self.single_input(inputs),
                c["time_col"],
                c["value_col"],
                int(c["window_seconds"]),
                list(c.get("partition_cols") or []),
                tuple(c.get("aggs") or ("sum", "count")),
                int(c.get("value_decimals", 2)),
                c.get("out_prefix", "rolling_"),
            )
        }
