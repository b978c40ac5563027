"""Merge operator: bag-union of many inputs into one output.

Parity with the reference merge component
(``src/etl_core/components/data_operations/merge/merge.py:21-85``,
``merge_receiver.py:17-55``): forwards payloads from many upstream
edges to one port, no dedup, no schema reconciliation. The Spark
version is ``unionByName`` (order-insensitive column alignment) with
``allowMissingColumns`` so inputs with differing columns union with
nulls — strictly safer than the reference's unreconciled interleave.

Scale note: union is a zero-shuffle operator; partitions of the
inputs are concatenated, so this never becomes a bottleneck.
"""

from __future__ import annotations

from functools import reduce

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator


@register_operator("merge")
class MergeOperator(Operator):
    out_ports = ("out",)

    def validate_config(self) -> None:
        self.allow_missing = bool(self.config.get("allow_missing_columns", True))

    def apply(self, inputs: PortMap) -> PortMap:
        if not inputs:
            raise OperatorConfigError("merge requires at least one input")
        dfs = [inputs[k] for k in sorted(inputs)]
        out = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=self.allow_missing), dfs
        )
        return {"out": out}
