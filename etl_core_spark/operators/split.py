"""Split operator: duplicate one input to N output ports.

Parity with the reference split component
(``src/etl_core/components/data_operations/split/split.py:23-72``,
``split_receiver.py:21-62``), which deep-copies row payloads per
branch. DataFrames are immutable, so splitting is free: every out
port shares the same lazy plan, and Catalyst may still collapse
common subtrees when both branches are consumed in one action.
"""

from __future__ import annotations

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator


@register_operator("split")
class SplitOperator(Operator):
    in_ports = ("in",)

    def validate_config(self) -> None:
        branches = self.config.get("branches") or ["out_1", "out_2"]
        if not isinstance(branches, (list, tuple)) or not branches:
            raise OperatorConfigError("split requires a non-empty 'branches' list")
        if len(set(branches)) != len(branches):
            # duplicates silently collapse into one out-port while
            # out_ports advertises two — a consumer wired to the
            # "second" branch would dangle
            raise OperatorConfigError(f"duplicate split branches: {branches}")
        self.branches = list(branches)
        self.out_ports = tuple(self.branches)

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        return {b: df for b in self.branches}
