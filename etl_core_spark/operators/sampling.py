"""Deterministic sampling / dataset splitting (beyond-reference).

Training-data pipelines need samples and train/val/test splits that
are (a) stable across reruns and engines, (b) independent of
partitioning, and (c) cheap. Random sampling (`df.sample`) is none of
those. The standard production trick is hash-bucket assignment: a row
belongs to a split according to md5(key) — reproducible anywhere md5
exists (so the DuckDB oracle checks it bit-for-bit), and a narrow map
at any scale.

The first 8 md5 hex chars give a uniform 32-bit integer; a row is
sampled when that value < rate·2³², and split k of n when
value mod n == k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator

_HASH_SPACE = 16 ** 8  # first 8 md5 hex chars


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform integer in [0, 16^8) derived from md5(salt || key)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "") -> DataFrame:
    """Keep ≈rate of rows, deterministically by key."""
    if not 0.0 <= rate <= 1.0:
        raise OperatorConfigError("rate must be in [0, 1]")
    threshold = int(rate * _HASH_SPACE)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def hash_split(
    df: DataFrame, key_col: str, weights: dict[str, float], salt: str = ""
) -> dict[str, DataFrame]:
    """Partition into named splits by hash range, e.g.
    {"train": .9, "val": .05, "test": .05}. Every row lands in
    exactly one split; assignment is key-stable under reruns,
    repartitioning, and engine changes."""
    total = sum(weights.values())
    if not weights or abs(total - 1.0) > 1e-9:
        raise OperatorConfigError("split weights must sum to 1.0")
    bucket = hash_bucket(F.col(key_col), salt)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        hi = lo + w
        lower = int(lo * _HASH_SPACE)
        upper = _HASH_SPACE if i == len(items) - 1 else int(hi * _HASH_SPACE)
        out[name] = df.filter((bucket >= lower) & (bucket < upper))
        lo = hi
    return out


@register_operator("hash_split")
class HashSplitOperator(Operator):
    """Config: ``key_col``, ``weights`` ({port: fraction}), optional
    ``salt``. Out ports = the weight names."""

    in_ports = ("in",)

    def validate_config(self) -> None:
        if not self.config.get("key_col"):
            raise OperatorConfigError("hash_split requires 'key_col'")
        weights = self.config.get("weights")
        if not isinstance(weights, dict) or not weights:
            raise OperatorConfigError("hash_split requires 'weights' dict")
        self.weights = {k: float(v) for k, v in weights.items()}
        if abs(sum(self.weights.values()) - 1.0) > 1e-9:
            raise OperatorConfigError("weights must sum to 1.0")
        self.out_ports = tuple(self.weights)

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        return hash_split(
            df, self.config["key_col"], self.weights, self.config.get("salt", "")
        )


@register_operator("hash_sample")
class HashSampleOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        if not self.config.get("key_col"):
            raise OperatorConfigError("hash_sample requires 'key_col'")
        self.rate = float(self.config.get("rate", 0.1))

    def apply(self, inputs: PortMap) -> PortMap:
        return {
            "out": hash_sample(
                self.single_input(inputs),
                self.config["key_col"],
                self.rate,
                self.config.get("salt", ""),
            )
        }
