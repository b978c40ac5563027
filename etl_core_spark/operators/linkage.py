"""Probabilistic record linkage (Fellegi & Sunter 1969).

Beyond-reference (the reference has no linkage at all): classic
blocking + agreement-weight scoring, the standard published method
for entity resolution across noisy feeds — the step between exact
dedup (same key) and similarity dedup (MinHash et al.) when records
have STRUCTURED fields with per-field reliabilities.

Method: candidate pairs come from an equi-join on ``block_cols``
(blocking IS the scale story — the quadratic pair space never
materializes, only within-block pairs do). Each configured field
comparison yields an agreement bit; the pair's score is the sum of
per-field log-likelihood weights

    agree:    w_a = ln(m / u)
    disagree: w_d = ln((1 - m) / (1 - u))

where ``m`` = P(field agrees | pair is a true match) and ``u`` =
P(field agrees | pair is a non-match), both config-supplied (in
production they come from EM or clerical review — data-derived
estimates would tie every score to an iterative fit, the cusum
config-target rule). Scores above ``upper`` classify ``match``,
above ``lower`` ``possible`` (the clerical-review band), else the
pair is dropped — emitting non-matches would be output linear in the
candidate-pair count for no downstream use.

Determinism pins: the weights are folded DRIVER-SIDE with
``math.log`` and injected as double literals (`repr`), so Spark and
any SQL oracle fold the identical constants; the score sum is
left-associative in comparison-list order; ``levenshtein`` is the
classic DP edit distance in both Spark and DuckDB; equality
comparisons are null-safe (NULL vs NULL agrees) via
``IS NOT DISTINCT FROM`` semantics; the score is floor-quantized.

Scale shape: ONE equi-join on the block key (hash-join shaped, never
cartesian) + built-in JVM expressions per pair — zero Python in the
pair loop. ``max_block_size`` guards skew: a hot block (e.g. a NULL
or default-valued blocking key) makes the within-block pair count
quadratic; policy ``error`` probes block sizes with ONE bounded
aggregate and raises naming the block, ``skip`` drops oversized
blocks (documented recall trade, the standard practice).
"""

from __future__ import annotations

import functools
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator

_KINDS = ("equal", "levenshtein", "abs_diff")


def _weights(comparisons: list[dict]) -> list[tuple[float, float]]:
    """Per-field (agree, disagree) log-weights, folded driver-side."""
    out = []
    for i, c in enumerate(comparisons):
        try:
            m = float(c["m"])
            u = float(c["u"])
        except KeyError as exc:
            raise OperatorConfigError(
                f"record_linkage comparison #{i} needs m and u"
            ) from exc
        if not 0.0 < u < m < 1.0:
            raise OperatorConfigError(
                f"record_linkage comparison #{i}: need 0 < u < m < 1 "
                f"(got m={m}, u={u})"
            )
        kind = c.get("kind", "equal")
        if kind not in _KINDS:
            raise OperatorConfigError(
                f"record_linkage comparison #{i}: kind must be one of "
                f"{_KINDS}, got {kind!r}"
            )
        if kind in ("levenshtein", "abs_diff"):
            thr = c.get("threshold")
            if not isinstance(thr, (int, float)) or isinstance(thr, bool):
                raise OperatorConfigError(
                    f"record_linkage comparison #{i}: kind {kind!r} needs a "
                    f"numeric 'threshold', got {thr!r}"
                )
        out.append((math.log(m / u), math.log((1.0 - m) / (1.0 - u))))
    return out


def _agree(col: str, kind: str, threshold, left: str, right: str):
    a, b = F.col(f"{left}.{col}"), F.col(f"{right}.{col}")
    if kind == "equal":
        return a.eqNullSafe(b)
    if kind == "levenshtein":
        # banded DP: with the threshold passed down, Spark computes
        # O(k*n) cells and returns -1 when the distance exceeds k —
        # same predicate as `levenshtein(a,b) <= k`, ~an order of
        # magnitude cheaper on the all-pairs hot path
        return F.coalesce(
            F.levenshtein(a, b, int(threshold)) >= F.lit(0), F.lit(False)
        )
    if kind == "abs_diff":
        return F.coalesce(
            F.abs(a.cast("double") - b.cast("double"))
            <= F.lit(float(threshold)),
            F.lit(False),
        )
    raise OperatorConfigError(
        f"record_linkage comparison kind must be one of {_KINDS}, got {kind!r}"
    )


def _global_rank(df: DataFrame, sort_cols: list[str]) -> DataFrame:
    """Contiguous 1-based global rank by ``sort_cols`` (which must be
    a TOTAL order), computed the distributed way: a range shuffle
    orders partitions, a partition-LOCAL row_number ranks within each
    (never a single-partition global window), and per-partition
    offsets — a #partitions-sized aggregate — add up via one tiny
    broadcast join. The rank itself is partitioning-independent
    because the order is total.

    Honest cost note: Catalyst inserts a second, pid-keyed hash
    exchange to satisfy the window's partitioning (it cannot prove
    the range layout already groups __pid), and the size aggregate
    re-scans a two-column pruned projection — a constant ~2x on the
    shuffle bytes, not a scale shape problem. If that constant ever
    matters, the upgrade path is bucketing the sort key by a
    percentile-sketch cut table (one narrow pre-pass, one shuffle);
    the rank stays identical because ANY ordered bucketing yields the
    same total order."""
    from pyspark.sql import Window

    ranked = df.repartitionByRange(*sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*[F.col(c) for c in sort_cols])
    )
    ranked = ranked.withColumn("__lrn", local)
    sizes = ranked.groupBy("__pid").count()
    # partitionBy(__pid & 0): the input here is #partitions rows
    # (bounded by cluster config, not data), so single-partition
    # execution is the CORRECT shape — the constant-valued partition
    # key states that intent and keeps WindowExec from logging the
    # all-data-to-one-partition warning that applies to data-sized
    # windows (a bare literal would be folded out of the spec)
    offs = sizes.select(
        "__pid",
        F.coalesce(
            F.sum("count").over(
                Window.partitionBy(
                    F.col("__pid").bitwiseAND(F.lit(0))
                ).orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(offs), "__pid")
        .withColumn("__rn", F.col("__off") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__off")
    )


def _global_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    exclusive: bool = False,
) -> DataFrame:
    """Distributed running sums of ``sum_cols`` in the global
    ``order_cols`` order (which must be TOTAL, e.g. distinct values):
    the ``_global_rank`` machinery generalized from row_number to
    prefix sums — a range shuffle orders partitions, partition-LOCAL
    running sums, and per-partition totals add up via one tiny
    broadcast join (never a single-partition global window).
    ``exclusive=True`` excludes the current row (the window idiom
    ``rowsBetween(unboundedPreceding, -1)``). Adds ``__ps_<col>``
    (0 when nothing precedes); the result is exact because the local
    sums and offsets are plain integer arithmetic, so any ordered
    partitioning yields identical values."""
    from pyspark.sql import Window

    part = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    local = part.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w), F.lit(0)).alias(f"__ls{i}")
            for i, c in enumerate(sum_cols)
        ],
    )
    totals = part.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t{i}") for i, c in enumerate(sum_cols)]
    )
    # #partitions-sized: the pid-ordered window here is bounded by the
    # partition count, not the data (same note as _global_rank); the
    # constant-valued partition key states that and silences the
    # WindowExec single-partition warning that applies to data-sized
    # windows (a bare literal would be folded out of the spec)
    offw = Window.partitionBy(
        F.col("__pid").bitwiseAND(F.lit(0))
    ).orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__t{i}").over(offw), F.lit(0)).alias(f"__o{i}")
            for i in range(len(sum_cols))
        ],
    )
    out = local.join(F.broadcast(offs), "__pid")
    for i, c in enumerate(sum_cols):
        out = out.withColumn(f"__ps_{c}", F.col(f"__o{i}") + F.col(f"__ls{i}"))
    return out.drop(
        "__pid",
        *[f"__ls{i}" for i in range(len(sum_cols))],
        *[f"__o{i}" for i in range(len(sum_cols))],
    )


def record_linkage(
    df_a: DataFrame,
    id_col: str,
    block_cols: list[str] | None,
    comparisons: list[dict],
    lower: float,
    upper: float,
    df_b: DataFrame | None = None,
    max_block_size: int | None = 10000,
    oversize_policy: str = "error",
    quantize: int = 6,
    method: str = "block",
    sort_cols: list[str] | None = None,
    window: int | None = None,
) -> DataFrame:
    """Score candidate pairs; see module docstring for the method.

    Candidate generation, ``method``:

    - ``"block"`` (default): equi-join on ``block_cols``;
      ``df_b=None`` is self-linkage (dedup mode) with ``id_a <
      id_b``, with ``df_b`` pairs cross the two inputs.
    - ``"sorted"``: sorted-neighborhood (Hernández & Stolfo 1995) —
      records within ``window`` positions of each other in the
      global ``sort_cols`` order pair up (``id_col`` is appended as
      the tie-break, making the order total). The standard answer
      when no clean blocking key exists but a fuzzy sort key does:
      candidates are n*(window-1), linear. Self-mode only; ``id_a``
      is the LOWER-RANKED record. Scale shape: one range shuffle +
      partition-local ranks + a #partitions-sized offset broadcast
      (never a single-partition global window), then a banded
      equi-join on floor(rank/window) — each qualifying pair lands
      in exactly one of the two probed bands.

    Comparisons: list of ``{"col", "kind" ("equal" | "levenshtein" |
    "abs_diff"), "threshold" (for the latter two), "m", "u"}``.
    Output: ``id_a``, ``id_b``, one ``agree_<col>`` boolean per
    comparison, floor-quantized ``score``, and ``match_class``
    ('match' when score >= upper, else 'possible'); pairs under
    ``lower`` are dropped.
    """
    if not id_col:
        raise OperatorConfigError("record_linkage requires id_col")
    if method not in ("block", "sorted"):
        raise OperatorConfigError(
            "record_linkage method must be 'block' or 'sorted'"
        )
    if not comparisons:
        raise OperatorConfigError("record_linkage requires comparisons")
    if not float(lower) <= float(upper):
        raise OperatorConfigError("record_linkage needs lower <= upper")
    if oversize_policy not in ("error", "skip"):
        raise OperatorConfigError(
            "record_linkage oversize_policy must be 'error' or 'skip'"
        )
    ws = _weights(comparisons)
    q = float(10 ** int(quantize))

    if method == "sorted":
        if df_b is not None:
            raise OperatorConfigError(
                "record_linkage method='sorted' is self-linkage only "
                "(union the inputs upstream for multi-source SNM)"
            )
        if not sort_cols:
            raise OperatorConfigError(
                "record_linkage method='sorted' requires sort_cols"
            )
        if window is None or int(window) < 2:
            raise OperatorConfigError(
                "record_linkage method='sorted' requires window >= 2"
            )
        w = int(window)
        ranked = _global_rank(df_a, list(sort_cols) + [id_col])
        ranked = ranked.withColumn(
            "__bkt", F.floor(F.col("__rn") / F.lit(w))
        )
        probe = ranked.withColumn(
            "__bkt", F.explode(F.array(F.col("__bkt"), F.col("__bkt") + 1))
        )
        a = probe.alias("__la")
        b = ranked.alias("__rb")
        pairs = a.join(
            b, F.col("__la.__bkt") == F.col("__rb.__bkt"), "inner"
        ).where(
            (F.col("__rb.__rn") - F.col("__la.__rn") >= 1)
            & (F.col("__rb.__rn") - F.col("__la.__rn") < F.lit(w))
        )
        return _score_pairs(pairs, id_col, comparisons, ws, lower, upper, q)

    if not block_cols:
        raise OperatorConfigError(
            "record_linkage requires block_cols — unblocked linkage is "
            "the all-pairs cartesian; block on a stable attribute"
        )
    self_mode = df_b is None

    left = df_a
    right = df_a if self_mode else df_b

    if max_block_size is not None:
        cap = int(max_block_size)
        for name, side in (("left", left), ("right", right)):
            sizes = side.where(
                functools.reduce(
                    lambda x, y: x & y,
                    [F.col(c).isNotNull() for c in block_cols],
                )
            ).groupBy(*block_cols).count()
            if oversize_policy == "error":
                row = sizes.agg(F.max("count").alias("mx")).collect()[0]
                if row["mx"] is not None and row["mx"] > cap:
                    raise OperatorConfigError(
                        f"record_linkage: a {name} block holds {row['mx']} "
                        f"records (> max_block_size={cap}) — within-block "
                        "pairs are quadratic; refine block_cols, or pass "
                        "oversize_policy='skip' to drop hot blocks "
                        "(documented recall trade)"
                    )
            else:
                keep = sizes.where(F.col("count") <= cap).drop("count")
                if name == "left":
                    left = left.join(keep, block_cols, "left_semi")
                    if self_mode:
                        right = left
                        break
                else:
                    right = right.join(keep, block_cols, "left_semi")
            if self_mode:
                break

    a = left.alias("__la")
    b = right.alias("__rb")
    cond = [
        F.col(f"__la.{c}").eqNullSafe(F.col(f"__rb.{c}")) for c in block_cols
    ]
    # NULL block keys pair NULL-with-NULL under eqNullSafe; exclude
    # them — a NULL blocking key is "unknown", not a block.
    pairs = a.join(b, cond, "inner").where(
        functools.reduce(
            lambda x, y: x & y,
            [F.col(f"__la.{c}").isNotNull() for c in block_cols],
        )
    )
    if self_mode:
        pairs = pairs.where(F.col(f"__la.{id_col}") < F.col(f"__rb.{id_col}"))
    return _score_pairs(pairs, id_col, comparisons, ws, lower, upper, q)


def _score_pairs(pairs, id_col, comparisons, ws, lower, upper, q):
    """Fellegi-Sunter scoring over __la/__rb-aliased candidate pairs
    (shared by both candidate generators)."""
    agree_cols = []
    score = None
    for comp, (wa, wd) in zip(comparisons, ws):
        flag = _agree(
            comp["col"], comp.get("kind", "equal"), comp.get("threshold"),
            "__la", "__rb",
        )
        agree_cols.append(flag.alias(f"agree_{comp['col']}"))
        term = F.when(flag, F.lit(wa)).otherwise(F.lit(wd))
        score = term if score is None else score + term

    out = pairs.select(
        F.col(f"__la.{id_col}").alias("id_a"),
        F.col(f"__rb.{id_col}").alias("id_b"),
        *agree_cols,
        score.alias("__score"),
    ).where(F.col("__score") >= F.lit(float(lower)))
    return out.select(
        "id_a",
        "id_b",
        *[f"agree_{c['col']}" for c in comparisons],
        (F.floor(F.col("__score") * F.lit(q)) / F.lit(q)).alias("score"),
        F.when(F.col("__score") >= F.lit(float(upper)), "match")
        .otherwise("possible")
        .alias("match_class"),
    )


@register_operator("record_linkage")
class RecordLinkageOperator(Operator):
    """Config: ``id_col``, ``block_cols``, ``comparisons``, ``lower``,
    ``upper`` (required); ``max_block_size`` (None skips the guard),
    ``oversize_policy`` ('error' | 'skip'), ``quantize``. Ports:
    ``in`` (and optional ``in_b`` for two-dataset linkage)."""

    in_ports = ("in", "in_b")
    out_ports = ("out",)

    def validate_config(self) -> None:
        method = self.config.get("method", "block")
        if method not in ("block", "sorted"):
            raise OperatorConfigError(
                "record_linkage method must be 'block' or 'sorted'"
            )
        needs = ["id_col", "comparisons"] + (
            ["block_cols"] if method == "block" else ["sort_cols", "window"]
        )
        for key in needs:
            if not self.config.get(key):
                raise OperatorConfigError(f"record_linkage requires {key!r}")
        for key in ("lower", "upper"):
            if key not in self.config:
                raise OperatorConfigError(f"record_linkage requires {key!r}")
        _weights(list(self.config["comparisons"]))
        if self.config.get("oversize_policy", "error") not in ("error", "skip"):
            raise OperatorConfigError(
                "record_linkage oversize_policy must be 'error' or 'skip'"
            )

    def apply(self, inputs: PortMap) -> PortMap:
        if "in" not in inputs or not set(inputs) <= {"in", "in_b"}:
            raise OperatorConfigError(
                "record_linkage takes port 'in' (optionally 'in_b'), "
                f"got {sorted(inputs)}"
            )
        c = self.config
        mbs = c.get("max_block_size", 10000)
        bc = c.get("block_cols")
        sc = c.get("sort_cols")
        win = c.get("window")
        return {
            "out": record_linkage(
                inputs["in"],
                c["id_col"],
                list(bc) if bc else None,
                list(c["comparisons"]),
                float(c["lower"]),
                float(c["upper"]),
                inputs.get("in_b"),
                int(mbs) if mbs is not None else None,
                c.get("oversize_policy", "error"),
                int(c.get("quantize", 6)),
                c.get("method", "block"),
                list(sc) if sc else None,
                int(win) if win is not None else None,
            )
        }
