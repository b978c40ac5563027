"""Schema mapping: field mapping rules + multi-step join plans.

Parity with the reference schema_mapping component
(``src/etl_core/components/data_operations/schema_mapping/
schema_mapping_component.py:35-311``, join rules ``join_rules.py:14-92``,
pandas implementation ``schema_mapping_receiver.py``):

- **Mapping rules** ``rules_by_dest: {dst_port: {dst_path:
  {src_port, src_path}}}`` copy a source leaf to a destination path,
  possibly restructuring nesting. Here dotted destination paths build
  real nested structs (``F.struct``), not dotted-flat columns.
- **Join plans**: ordered steps; each step joins two ports (in-ports
  or outputs of earlier steps) on equi-keys with
  how ∈ {inner,left,right,outer}; later steps may consume earlier
  step outputs (a pipelined join tree). Composite keys are accepted
  (free upgrade; the reference is single-key — join_rules.py:17-34).
- **Column collisions** follow the reference's *bulk* semantics
  (``pd.merge`` — receiver:161-196): identical same-named join keys
  collapse into one column; other same-named columns get ``_x`` /
  ``_y`` suffixes. The row-mode no-null-padding outer join is a
  documented deviation (SURVEY.md §7.4) — SQL null-padding is used.

Scale notes: each step is a plain ``df.join`` so Catalyst/AQE pick
broadcast vs sort-merge per step from runtime sizes; a
``broadcast: true`` flag per step forces the hint for dimension
tables the optimizer can't size (e.g. behind a UDF).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator

JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    # beyond-reference extras
    "semi": "left_semi",
    "anti": "left_anti",
    "cross": "cross",
}


@dataclasses.dataclass
class JoinStep:
    left_port: str
    right_port: str
    left_on: list[str]
    right_on: list[str]
    how: str = "inner"
    output_port: str = "out"
    broadcast: bool = False

    def __post_init__(self) -> None:
        if self.how not in JOIN_TYPES:
            raise OperatorConfigError(
                f"unknown join type {self.how!r}; known: {sorted(JOIN_TYPES)}"
            )
        if isinstance(self.left_on, str):
            self.left_on = [self.left_on]
        if isinstance(self.right_on, str):
            self.right_on = [self.right_on]
        if self.how != "cross" and len(self.left_on) != len(self.right_on):
            raise OperatorConfigError("left_on/right_on length mismatch")


def _suffix_collisions(
    left: DataFrame, right: DataFrame, left_on: list[str], right_on: list[str]
) -> tuple[DataFrame, DataFrame, list[str], list[str], bool]:
    """Emulate pandas-merge naming: same-named key columns collapse,
    other same-named columns get _x/_y suffixes."""
    shared = set(left.columns) & set(right.columns)
    # keys escape collision renaming ONLY when the key lists match in
    # full (the pandas `on=` collapse case). A PARTIAL overlap
    # (left_on=['k','a'], right_on=['k','b']) must suffix 'k' like any
    # collision — keeping both sides' bare 'k' makes every later
    # reference to it AMBIGUOUS_REFERENCE (pandas suffixes here too).
    collapse = bool(left_on) and left_on == right_on
    collide = shared - (set(left_on) if collapse else set())
    l_renames = {c: f"{c}_x" for c in collide}
    r_renames = {c: f"{c}_y" for c in collide}
    new_left = left
    for old, new in l_renames.items():
        new_left = new_left.withColumnRenamed(old, new)
    new_right = right
    for old, new in r_renames.items():
        new_right = new_right.withColumnRenamed(old, new)
    lo = [l_renames.get(c, c) for c in left_on]
    ro = [r_renames.get(c, c) for c in right_on]
    return new_left, new_right, lo, ro, collapse


def execute_join_step(step: JoinStep, left: DataFrame, right: DataFrame) -> DataFrame:
    how = JOIN_TYPES[step.how]
    if step.how == "cross":
        return left.crossJoin(F.broadcast(right) if step.broadcast else right)

    if how in ("left_semi", "left_anti"):
        # output is the left side only — no collision renaming
        r_proj = right.select(*step.right_on).alias("__r")
        l = left.alias("__l")
        cond = _join_cond_named(l, "__l", r_proj, "__r", step.left_on, step.right_on)
        r_side = F.broadcast(r_proj) if step.broadcast else r_proj
        return l.join(r_side, cond, how)

    left2, right2, lo, ro, collapse = _suffix_collisions(
        left, right, step.left_on, step.right_on
    )
    r_side = F.broadcast(right2) if step.broadcast else right2
    if collapse and lo == ro:
        # same-named keys: use the name-list join so the key column
        # appears once (pandas-merge behaviour for identical key names);
        # for full_outer Spark coalesces the key across sides.
        return left2.join(r_side, on=lo, how=how)
    cond = _join_cond(left2, right2, lo, ro)
    return left2.join(r_side, cond, how)


def _join_cond_named(
    left: DataFrame, lalias: str, right: DataFrame, ralias: str,
    lo: list[str], ro: list[str],
) -> Column:
    cond = F.col(f"{lalias}.{lo[0]}") == F.col(f"{ralias}.{ro[0]}")
    for l, r in zip(lo[1:], ro[1:]):
        cond = cond & (F.col(f"{lalias}.{l}") == F.col(f"{ralias}.{r}"))
    return cond


def _join_cond(left: DataFrame, right: DataFrame, lo: list[str], ro: list[str]) -> Column:
    cond = left[lo[0]] == right[ro[0]]
    for l, r in zip(lo[1:], ro[1:]):
        cond = cond & (left[l] == right[r])
    return cond


def _build_nested_projection(rules: dict[str, tuple[str, str]], inputs: PortMap) -> DataFrame:
    """rules: {dst_path: (src_port, src_path)} → one select building
    nested structs for dotted destination paths."""
    # group dst paths into a tree
    tree: dict[str, Any] = {}
    for dst_path, (src_port, src_path) in rules.items():
        parts = dst_path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise OperatorConfigError(
                    f"mapping destination conflict at {dst_path!r}"
                )
        if parts[-1] in node:
            # both directions of the conflict must raise: assigning a
            # leaf over an existing subtree (rules 'a.b' then 'a')
            # silently clobbered the whole mapped subtree
            raise OperatorConfigError(
                f"mapping destination conflict at {dst_path!r}"
            )
        node[parts[-1]] = (src_port, src_path)

    ports = {pair[0] for pair in rules.values()}
    if len(ports) != 1:
        raise OperatorConfigError(
            "mapping rules for one destination port must draw from one "
            f"source port (got {sorted(ports)}); use a join step to combine"
        )
    src_df = inputs[next(iter(ports))]

    def build(node: Any) -> Column:
        if isinstance(node, tuple):
            return F.col(node[1])
        return F.struct(*[build(child).alias(name) for name, child in node.items()])

    cols = [build(child).alias(name) for name, child in tree.items()]
    return src_df.select(*cols)


@register_operator("schema_mapping")
class SchemaMappingOperator(Operator):
    """Config keys:

    - ``join_plan``: {"steps": [JoinStep-shaped dicts]} (optional)
    - ``rules_by_dest``: {dst_port: {dst_path: {"src_port", "src_path"}}}
      (optional). When a join plan exists, ``src_port`` may reference a
      step ``output_port``.
    """

    def validate_config(self) -> None:
        plan = self.config.get("join_plan") or {}
        steps = plan.get("steps", []) if isinstance(plan, dict) else plan
        self.steps = [s if isinstance(s, JoinStep) else JoinStep(**s) for s in steps]
        self.rules_by_dest: dict[str, dict[str, dict[str, str]]] = (
            self.config.get("rules_by_dest") or {}
        )
        seen_outputs: set[str] = set()
        for s in self.steps:
            if s.output_port in seen_outputs:
                raise OperatorConfigError(
                    f"duplicate join step output_port {s.output_port!r}"
                )
            seen_outputs.add(s.output_port)
        if not self.steps and not self.rules_by_dest:
            raise OperatorConfigError(
                "schema_mapping requires join_plan and/or rules_by_dest"
            )

    def apply(self, inputs: PortMap) -> PortMap:
        env: dict[str, DataFrame] = dict(inputs)
        for step in self.steps:
            for port in (step.left_port, step.right_port):
                if port not in env:
                    raise OperatorConfigError(
                        f"join step references unknown port {port!r}; "
                        f"available: {sorted(env)}"
                    )
            env[step.output_port] = execute_join_step(
                step, env[step.left_port], env[step.right_port]
            )

        out: PortMap = {}
        if self.rules_by_dest:
            for dst_port, rules in self.rules_by_dest.items():
                flat = {
                    dst_path: (spec["src_port"], spec["src_path"])
                    for dst_path, spec in rules.items()
                }
                out[dst_port] = _build_nested_projection(flat, env)
        else:
            last = self.steps[-1].output_port
            out[last] = env[last]
        return out
