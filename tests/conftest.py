import pytest

from etl_core_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="etl_core_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from etl_core_spark.tables import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for n in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM '{SF_DIR}/{n}.parquet'"
        )
    return con


def assert_df_equal(spark_df, duck_rows, sort_cols=None, approx=None):
    """Order-insensitive comparison of a Spark DataFrame against
    DuckDB result rows (list of tuples)."""
    got = [tuple(r) for r in spark_df.collect()]
    want = [tuple(r) for r in duck_rows]
    keyfn = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got_sorted = sorted(got, key=keyfn)
    want_sorted = sorted(want, key=keyfn)
    assert len(got_sorted) == len(want_sorted), (
        f"row count mismatch: spark={len(got_sorted)} oracle={len(want_sorted)}"
    )
    for g, w in zip(got_sorted, want_sorted):
        assert len(g) == len(w), f"width mismatch: {g} vs {w}"
        for gv, wv in zip(g, w):
            if approx is not None and isinstance(gv, float) and isinstance(wv, float):
                assert gv == pytest.approx(wv, abs=approx), f"{g} vs {w}"
            else:
                assert gv == wv, f"{g} vs {w}"
