import pytest

from etl_core_spark.functions.rules import (
    ComparisonRule,
    LogicalRule,
    RuleError,
    compile_rule,
    rule_from_dict,
    rule_to_sql,
)
from etl_core_spark.operators.base import get_operator
from tests.conftest import assert_df_equal


def test_rule_parsing_and_validation():
    r = rule_from_dict(
        {
            "operator": "AND",
            "rules": [
                {"column": "a", "operator": ">", "value": 1},
                {"operator": "NOT", "rules": [{"column": "b", "operator": "==", "value": "x"}]},
            ],
        }
    )
    assert isinstance(r, LogicalRule)
    assert isinstance(r.rules[1], LogicalRule)
    with pytest.raises(RuleError):
        ComparisonRule(column="a", operator="~", value=1)
    with pytest.raises(RuleError):
        LogicalRule(operator="NOT", rules=[])


def test_filter_pass_fail_ports(spark, tables, duck):
    rule = {
        "operator": "AND",
        "rules": [
            {"column": "o_totalprice", "operator": ">", "value": 150000.0},
            {"column": "o_orderstatus", "operator": "!=", "value": "F"},
        ],
    }
    op = get_operator("filter")(rule=rule)
    out = op.apply({"in": tables["orders"]})
    sql = rule_to_sql(rule_from_dict(rule))
    want_pass = duck.execute(f"SELECT count(*) FROM orders WHERE {sql}").fetchone()[0]
    total = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert out["pass"].count() == want_pass
    # every row lands on exactly one port
    assert out["fail"].count() == total - want_pass


def test_contains_case_insensitive_null_safe(spark):
    df = spark.createDataFrame(
        [("Alpha Beta",), ("GAMMA",), (None,)], ["s"]
    )
    op = get_operator("filter")(rule={"column": "s", "operator": "contains", "value": "alpha"})
    out = op.apply({"in": df})
    assert [r["s"] for r in out["pass"].collect()] == ["Alpha Beta"]
    # nulls go to fail, not dropped
    assert out["fail"].count() == 2


def test_eq_list_is_membership(spark, tables, duck):
    op = get_operator("filter")(
        rule={"column": "o_orderpriority", "operator": "==", "value": ["1-URGENT", "2-HIGH"]}
    )
    out = op.apply({"in": tables["orders"]})
    want = duck.execute(
        "SELECT count(*) FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')"
    ).fetchone()[0]
    assert out["pass"].count() == want


def test_ne_null_semantics(spark):
    df = spark.createDataFrame([("a",), (None,)], ["s"])
    op = get_operator("filter")(rule={"column": "s", "operator": "!=", "value": "b"})
    out = op.apply({"in": df})
    # pandas semantics: NaN != 'b' is True → null row passes
    assert out["pass"].count() == 2
    assert out["fail"].count() == 0


def test_not_on_null_comparison(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    rule = {"operator": "NOT", "rules": [{"column": "v", "operator": ">", "value": 1}]}
    op = get_operator("filter")(rule=rule)
    out = op.apply({"in": df})
    # v>1 on null is False; NOT False = True → null passes
    assert out["pass"].count() == 1
    assert out["pass"].collect()[0]["v"] is None
