"""Canonical loaders for the benchmark/test tables.

``/root/testdata/sf*/events.parquet`` stores its ``ts`` column as
parquet TIMESTAMP(NANOS), which Spark's parquet reader rejects
(PARQUET_TYPE_ILLEGAL). The documented escape hatch is
``spark.sql.legacy.parquet.nanosAsLong`` — ts arrives as nanos since
epoch and is rebuilt to a microsecond TIMESTAMP_NTZ here (matching
the NTZ type Spark infers for the ms-precision tables). The cast
stays in the distributed scan; no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the ltz→ntz cast below renders wall time in the SESSION
        # timezone; pin UTC so the rebuild is correct under any
        # caller-provided session (the stored nanos are UTC instants)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(ts / 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
