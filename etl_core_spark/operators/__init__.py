"""Plan-builder operator nodes.

Each operator is a pure function from input DataFrames (keyed by
in-port name) to output DataFrames (keyed by out-port name) — the
Spark-native equivalent of the reference's Component/Receiver pairs.
No operator triggers an action; sinks do.
"""

from etl_core_spark.operators.base import Operator, register_operator, get_operator, operator_names

# import for registration side effects
from etl_core_spark.operators import (  # noqa: F401
    filter_op,
    aggregation,
    schema_mapping,
    type_conversion,
    split,
    merge,
    validate,
    sampling,
    asof,
    dedup,
    similarity,
    text_analysis,
    timeseries,
    json_ops,
    sketch,
    profile,
    reshape,
    multimodal,
    skew,
    compare,
    graph,
    selection,
    bpe,
    substring,
    layout,
    linkage,
    density,
    assoc,
)

__all__ = ["Operator", "register_operator", "get_operator", "operator_names"]
