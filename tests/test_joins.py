import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from tests.conftest import assert_df_equal


def mapping(**cfg):
    return get_operator("schema_mapping")(**cfg)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(2, "x"), (3, "y"), (4, "z")], "id long, name string"
    )
    return left, right


@pytest.mark.parametrize(
    "how,want_ids",
    [
        ("inner", {2, 3}),
        ("left", {1, 2, 3}),
        ("right", {2, 3, 4}),
        ("outer", {1, 2, 3, 4}),
    ],
)
def test_join_types_with_collision_suffixes(sides, how, want_ids):
    left, right = sides
    op = mapping(
        join_plan={
            "steps": [
                {
                    "left_port": "left", "right_port": "right",
                    "left_on": "id", "right_on": "id", "how": how,
                    "output_port": "joined",
                }
            ]
        }
    )
    out = op.apply({"left": left, "right": right})["joined"]
    # pandas-merge naming: shared key collapses, colliding 'name'
    # becomes name_x/name_y
    assert set(out.columns) == {"id", "name_x", "name_y"}
    assert {r["id"] for r in out.collect()} == want_ids
    if how == "outer":
        byid = {r["id"]: r for r in out.collect()}
        assert byid[1]["name_y"] is None  # SQL null-padding
        assert byid[4]["name_x"] is None


def test_multi_step_join_plan(tables, duck):
    op = mapping(
        join_plan={
            "steps": [
                {
                    "left_port": "customer", "right_port": "nation",
                    "left_on": "c_nationkey", "right_on": "n_nationkey",
                    "how": "inner", "output_port": "cn",
                },
                {
                    "left_port": "cn", "right_port": "region",
                    "left_on": "n_regionkey", "right_on": "r_regionkey",
                    "how": "inner", "output_port": "cnr",
                },
            ]
        }
    )
    out = op.apply(
        {"customer": tables["customer"], "nation": tables["nation"], "region": tables["region"]}
    )["cnr"].select("c_custkey", "n_name", "r_name")
    want = duck.execute(
        """
        SELECT c_custkey, n_name, r_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        """
    ).fetchall()
    assert_df_equal(out, want)


def test_composite_keys(spark):
    left = spark.createDataFrame([(1, "a", 10), (1, "b", 20)], "k1 long, k2 string, v long")
    right = spark.createDataFrame([(1, "a", 99)], "k1 long, k2 string, w long")
    op = mapping(
        join_plan={
            "steps": [
                {
                    "left_port": "l", "right_port": "r",
                    "left_on": ["k1", "k2"], "right_on": ["k1", "k2"],
                    "how": "inner", "output_port": "out",
                }
            ]
        }
    )
    out = op.apply({"l": left, "r": right})["out"].collect()
    assert len(out) == 1 and out[0]["v"] == 10 and out[0]["w"] == 99


def test_semi_anti_extensions(sides):
    left, right = sides
    for how, want in (("semi", {2, 3}), ("anti", {1})):
        op = mapping(
            join_plan={
                "steps": [
                    {
                        "left_port": "l", "right_port": "r",
                        "left_on": "id", "right_on": "id",
                        "how": how, "output_port": "out",
                    }
                ]
            }
        )
        out = op.apply({"l": left, "r": right})["out"]
        assert {r["id"] for r in out.collect()} == want
        assert set(out.columns) == {"id", "name"}  # left columns only


def test_mapping_rules_renesting(spark):
    df = spark.createDataFrame([(1, "x", "Berlin")], "id long, name string, city string")
    op = mapping(
        rules_by_dest={
            "out": {
                "user_id": {"src_port": "in", "src_path": "id"},
                "profile.name": {"src_port": "in", "src_path": "name"},
                "profile.address.city": {"src_port": "in", "src_path": "city"},
            }
        }
    )
    out = op.apply({"in": df})["out"]
    row = out.collect()[0]
    assert row["user_id"] == 1
    assert row["profile"]["name"] == "x"
    assert row["profile"]["address"]["city"] == "Berlin"


def test_join_validation():
    with pytest.raises(OperatorConfigError):
        mapping(join_plan={"steps": [{"left_port": "a", "right_port": "b", "left_on": "x", "right_on": "y", "how": "sideways"}]})
    with pytest.raises(OperatorConfigError):
        mapping()
