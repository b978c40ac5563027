"""Differential property test: the join operator vs the ACTUAL
pandas.merge the reference uses in bulk mode
(schema_mapping_receiver.py:161-196). Random small frames, all four
join types, including collision naming and duplicate keys."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_core_spark.operators.schema_mapping import JoinStep, execute_join_step

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(0, 5)
frames = st.tuples(
    st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=8),
    st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=8),
    st.sampled_from(["inner", "left", "right", "outer"]),
)


def normalize(rows):
    return sorted(
        (tuple(None if pd.isna(v) else int(v) if isinstance(v, float) and v == int(v) else v for v in r))
        for r in rows
    )


@given(data=frames)
@settings(**_SETTINGS)
def test_join_matches_pandas_merge(spark, data):
    left_rows, right_rows, how = data
    lpdf = pd.DataFrame(left_rows, columns=["id", "name"]).astype("Int64")
    rpdf = pd.DataFrame(right_rows, columns=["id", "name"]).astype("Int64")

    want = pd.merge(lpdf, rpdf, how="outer" if how == "outer" else how,
                    left_on="id", right_on="id")

    left = spark.createDataFrame(
        [(int(a), int(b)) for a, b in left_rows] or [], "id long, name long"
    ) if left_rows else spark.createDataFrame([], "id long, name long")
    right = spark.createDataFrame(
        [(int(a), int(b)) for a, b in right_rows] or [], "id long, name long"
    ) if right_rows else spark.createDataFrame([], "id long, name long")

    step = JoinStep(left_port="l", right_port="r", left_on="id", right_on="id", how=how)
    got = execute_join_step(step, left, right)

    assert sorted(got.columns) == sorted(want.columns.tolist())
    got_rows = normalize(
        tuple(r[c] for c in sorted(got.columns)) for r in got.collect()
    )
    want_rows = normalize(
        tuple(None if pd.isna(v) else int(v) for v in row)
        for row in want[sorted(want.columns)].itertuples(index=False)
    )
    assert got_rows == want_rows
