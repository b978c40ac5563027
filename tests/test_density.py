"""Grid-celled DBSCAN: hand-checkable cluster/border/noise verdicts,
partitioning invariance, the degenerate-cell guard, validation."""

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.density import dbscan


def _blobs(spark):
    rows = []
    i = 0
    for bx, by in ((0, 0), (100, 100)):
        for dx in range(5):
            for dy in range(4):
                rows.append((i, bx + dx * 2, by + dy * 2))
                i += 1
    for k in range(6):  # sparse noise, far from both blobs
        rows.append((i, 40 + k * 7, 300 + k * 11))
        i += 1
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_dbscan_two_blobs_and_noise(spark):
    out = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in get_operator("dbscan")(
            x_col="x", y_col="y", eps=5, min_pts=4
        ).apply({"in": _blobs(spark)})["out"].collect()
    }
    # blob one -> cluster 0 (min member id), blob two -> cluster 20
    assert all(out[i][0] == 0 for i in range(20))
    assert all(out[i][0] == 20 for i in range(20, 40))
    assert all(out[i] == (None, False) for i in range(40, 46))
    assert all(out[i][1] for i in range(40))  # every blob point is core


def test_dbscan_border_point_takes_smallest_adjacent_cluster(spark):
    # line at spacing 2, eps=5, min_pts=4: the interior points {2,3,4}
    # see >= 4 neighbors (self included) and form the core; the two
    # endpoints see only 3 and become border points of cluster 2
    rows = [(1, 0, 0), (2, 2, 0), (3, 4, 0), (4, 6, 0), (9, 10, 0)]
    out = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in dbscan(
            spark.createDataFrame(rows, "id long, x long, y long"),
            "x", "y", eps=5, min_pts=4,
        ).collect()
    }
    assert out[2] == (2, True) and out[3] == (2, True) and out[4] == (2, True)
    assert out[1] == (2, False)  # borders take the smallest core cluster
    assert out[9] == (2, False)


def test_dbscan_partitioning_invariant(spark):
    df = _blobs(spark)
    op = get_operator("dbscan")(x_col="x", y_col="y", eps=5, min_pts=4)
    a = sorted(map(tuple, op.apply({"in": df.coalesce(1)})["out"].collect()))
    b = sorted(
        map(tuple, op.apply({"in": df.repartition(16)})["out"].collect())
    )
    assert a == b


def test_dbscan_degenerate_cell_guard(spark):
    stacked = spark.createDataFrame(
        [(i, 0, 0) for i in range(30)], "id long, x long, y long"
    )
    with pytest.raises(OperatorConfigError, match="max_cell_size"):
        dbscan(stacked, "x", "y", eps=5, min_pts=4, max_cell_size=10)
    # raising the bound deliberately lets the stacked cell through
    out = dbscan(stacked, "x", "y", eps=5, min_pts=4, max_cell_size=50)
    assert all(r["cluster"] == 0 and r["is_core"] for r in out.collect())


def test_dbscan_validation(spark):
    with pytest.raises(OperatorConfigError, match="eps"):
        get_operator("dbscan")(x_col="x", y_col="y", eps=0, min_pts=4)
    with pytest.raises(OperatorConfigError, match="min_pts"):
        get_operator("dbscan")(x_col="x", y_col="y", eps=5, min_pts=0)
    with pytest.raises(OperatorConfigError, match="x_col"):
        get_operator("dbscan")(x_col="", y_col="y", eps=5, min_pts=4)
