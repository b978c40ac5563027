"""Operator protocol and registry.

The reference registers Component subclasses by name
(``src/etl_core/components/component_registry.py:45-65``) and wires
them into a DAG with typed ports. Here an operator is a config-holding
object with one method::

    apply(inputs: Dict[in_port, DataFrame]) -> Dict[out_port, DataFrame]

Operators are lazy plan rewrites — stacking them composes one
Catalyst plan, so the optimizer sees through the whole job DAG
(filter pushdown across a mapping node, column pruning across a join,
etc.), which the reference's per-component asyncio workers structurally
cannot do.
"""

from __future__ import annotations

import abc
from typing import Any, Callable, Dict, Type

from pyspark.sql import DataFrame

PortMap = Dict[str, DataFrame]

_REGISTRY: dict[str, Type["Operator"]] = {}


class OperatorConfigError(ValueError):
    """Invalid operator configuration (build-time, pre-execution)."""


class Operator(abc.ABC):
    """A plan-builder node: Dict[in_port, DF] -> Dict[out_port, DF]."""

    #: declared port names; "many" fan-in/out handled by the builder
    in_ports: tuple[str, ...] = ("in",)
    out_ports: tuple[str, ...] = ("out",)

    def __init__(self, **config: Any) -> None:
        self.config = config
        self.validate_config()

    def validate_config(self) -> None:  # pragma: no cover - override hook
        """Build-time config validation (≈ the reference's pydantic
        validators); raise OperatorConfigError on bad config."""

    @abc.abstractmethod
    def apply(self, inputs: PortMap) -> PortMap:
        ...

    def single_input(self, inputs: PortMap) -> DataFrame:
        if len(inputs) != 1:
            raise OperatorConfigError(
                f"{type(self).__name__} expects exactly one input port, "
                f"got {sorted(inputs)}"
            )
        return next(iter(inputs.values()))


def register_operator(name: str) -> Callable[[Type[Operator]], Type[Operator]]:
    def deco(cls: Type[Operator]) -> Type[Operator]:
        if name in _REGISTRY:
            raise ValueError(f"operator {name!r} already registered")
        # guard against the decorator landing on a bare function when code
        # is inserted between @register_operator and its class (the r7
        # similarity_search accident) — fail at import time, not job time
        if not (isinstance(cls, type) and issubclass(cls, Operator)):
            raise TypeError(
                f"register_operator({name!r}) target must be an Operator "
                f"subclass, got {cls!r}"
            )
        _REGISTRY[name] = cls
        cls.registry_name = name  # type: ignore[attr-defined]
        return cls

    return deco


def get_operator(name: str) -> Type[Operator]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise OperatorConfigError(
            f"unknown operator {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def operator_names() -> list[str]:
    return sorted(_REGISTRY)
