"""Job configuration model.

Mirrors the reference's JSON job format
(``src/etl_core/job_execution/runtimejob.py:37-67`` — named
components, per-component ``routes: {out_port: [EdgeRef]}``, optional
per-port schemas, job-wide retry count). ``strategy_type`` is parsed
for config compatibility but ignored: there is exactly one execution
engine (Spark DataFrames) instead of row/bulk/bigdata triplication.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

from etl_core_spark.schema import Schema


class JobConfigError(ValueError):
    pass


@dataclasses.dataclass
class EdgeRef:
    to: str
    in_port: str = "in"

    @classmethod
    def from_any(cls, v: Any) -> "EdgeRef":
        if isinstance(v, EdgeRef):
            return v
        if isinstance(v, str):
            return cls(to=v)
        return cls(to=v["to"], in_port=v.get("in_port", "in"))


@dataclasses.dataclass
class ComponentConfig:
    name: str
    comp_type: str
    routes: dict[str, list[EdgeRef]] = dataclasses.field(default_factory=dict)
    port_schemas: dict[str, Schema] = dataclasses.field(default_factory=dict)
    params: dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ComponentConfig":
        d = dict(d)
        name = d.pop("name", None)
        comp_type = d.pop("comp_type", None)
        if not name or not comp_type:
            raise JobConfigError("component requires 'name' and 'comp_type'")
        routes_raw = d.pop("routes", {}) or {}
        routes = {
            out_port: [EdgeRef.from_any(e) for e in edges]
            for out_port, edges in routes_raw.items()
        }
        schemas_raw = d.pop("port_schemas", {}) or {}
        port_schemas = {p: Schema.from_dict(s) for p, s in schemas_raw.items()}
        d.pop("strategy_type", None)  # parsed-and-ignored (single engine)
        d.pop("description", None)
        return cls(
            name=name, comp_type=comp_type, routes=routes,
            port_schemas=port_schemas, params=d,
        )


@dataclasses.dataclass
class JobConfig:
    name: str
    components: list[ComponentConfig]
    num_of_retries: int = 0
    metadata: dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self) -> None:
        names = [c.name for c in self.components]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise JobConfigError(f"duplicate component names: {sorted(dupes)}")

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobConfig":
        return cls(
            name=d.get("name", "job"),
            components=[ComponentConfig.from_dict(c) for c in d.get("components", [])],
            num_of_retries=int(d.get("num_of_retries", 0)),
            metadata=d.get("metadata", {}),
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "JobConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def component(self, name: str) -> ComponentConfig:
        for c in self.components:
            if c.name == name:
                return c
        raise JobConfigError(f"unknown component {name!r}")
