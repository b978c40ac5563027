"""Property-based tests (hypothesis): the rule compiler vs a Python
reference model of pandas mask semantics, and the cast ladders vs the
reference's conversion tables."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_core_spark.functions.casts import FALSE_STRINGS, NULL_STRINGS, TRUE_STRINGS
from etl_core_spark.functions.rules import ComparisonRule, LogicalRule, compile_rule
from etl_core_spark.operators.base import get_operator

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

scalar = st.one_of(st.none(), st.integers(-100, 100))
leaf = st.builds(
    ComparisonRule,
    column=st.just("v"),
    operator=st.sampled_from(["==", "!=", ">", "<", ">=", "<="]),
    value=st.integers(-100, 100),
)
rule_tree = st.recursive(
    leaf,
    lambda children: st.one_of(
        st.builds(LogicalRule, operator=st.just("NOT"), rules=st.lists(children, min_size=1, max_size=1)),
        st.builds(LogicalRule, operator=st.sampled_from(["AND", "OR"]), rules=st.lists(children, min_size=1, max_size=3)),
    ),
    max_leaves=4,
)


def eval_model(rule, value):
    """Python model of the reference's pandas mask semantics:
    comparisons on null are False, except != which is True."""
    if isinstance(rule, LogicalRule):
        subs = [eval_model(r, value) for r in rule.rules]
        if rule.operator == "NOT":
            return not subs[0]
        if rule.operator == "AND":
            return all(subs)
        return any(subs)
    if value is None:
        return rule.operator == "!="
    ops = {
        "==": value == rule.value,
        "!=": value != rule.value,
        ">": value > rule.value,
        "<": value < rule.value,
        ">=": value >= rule.value,
        "<=": value <= rule.value,
    }
    return ops[rule.operator]


@pytest.fixture(scope="module")
def rule_df(spark):
    values = list(range(-100, 101)) + [None]
    return spark.createDataFrame([(v,) for v in values], "v int").cache(), values


@given(rule=rule_tree)
@settings(**_SETTINGS)
def test_rule_compiler_matches_pandas_model(rule_df, rule):
    df, values = rule_df
    out = df.filter(__import__("pyspark.sql.functions", fromlist=["coalesce", "lit"]).coalesce(
        compile_rule(rule), __import__("pyspark.sql.functions", fromlist=["lit"]).lit(False)
    ))
    got = sorted((r["v"] for r in out.collect()), key=lambda x: (x is None, x))
    want = sorted((v for v in values if eval_model(rule, v)), key=lambda x: (x is None, x))
    assert got == want


def model_str_to_bool(s):
    if s is None:
        return None
    t = s.strip().lower()
    if t in NULL_STRINGS:
        return None
    if t in TRUE_STRINGS:
        return True
    if t in FALSE_STRINGS:
        return False
    return None


def model_str_to_int(s):
    if s is None:
        return None
    t = s.strip().lower()
    if t in NULL_STRINGS:
        return None
    try:
        d = float(t)
    except ValueError:
        return None
    if math.isnan(d) or math.isinf(d) or d != math.floor(d):
        return None
    # int64 range guard (as doubles): out-of-range is unrepresentable in
    # LongType, so the engine yields NULL rather than saturating.
    if d < -(2**63) or d >= 2**63:
        return None
    return int(d)


str_values = st.one_of(
    st.none(),
    st.sampled_from(list(TRUE_STRINGS) + list(FALSE_STRINGS) + list(NULL_STRINGS)),
    st.text(alphabet="0123456789.-eXyz ", max_size=8),
    st.integers(-10**6, 10**6).map(str),
)


@given(values=st.lists(str_values, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_cast_ladders_match_reference_tables(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    op_bool = get_operator("type_conversion")(
        rules=[{"column_path": "v", "target": "boolean", "on_error": "null"}]
    )
    got_bool = [r["v"] for r in op_bool.apply({"in": df})["out"].collect()]
    assert got_bool == [model_str_to_bool(v) for v in values]

    op_int = get_operator("type_conversion")(
        rules=[{"column_path": "v", "target": "integer", "on_error": "null"}]
    )
    got_int = [r["v"] for r in op_int.apply({"in": df})["out"].collect()]
    assert got_int == [model_str_to_int(v) for v in values]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 999),                      # id
            st.one_of(st.none(), st.integers(0, 4)),  # key a (nullable)
            st.one_of(st.none(), st.sampled_from("xy")),  # key b (nullable)
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],  # unique ids
    )
)
def test_exact_dedup_matches_python_model_with_nulls(spark, rows):
    """Differential property: exact_dedup's min-id survivor against a
    plain-Python groupby that treats NULL as a real key value — the
    semantics the eqNullSafe join must implement."""
    from etl_core_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(rows, "id long, a long, b string")
    got = sorted(r["id"] for r in exact_dedup(df, ["a", "b"], id_col="id").collect())

    survivors: dict = {}
    for rid, a, b in rows:
        k = (a, b)
        if k not in survivors or rid < survivors[k]:
            survivors[k] = rid
    assert got == sorted(survivors.values())
