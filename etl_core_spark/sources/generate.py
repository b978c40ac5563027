"""Generator / test-stub sources.

Parity with the reference's hidden stub components
(``src/etl_core/components/stubcomponents.py:24-120``): `multi_source`
N-row generator, `failtest` always-fail, `stub_fail_once` fails the
first attempt then succeeds (exercises the retry loop). The generator
is ``spark.range`` — distributed, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


@register_operator("generate_rows")
class GenerateRows(SourceOperator):
    """N rows: (id long, value double deterministic, label string)."""

    def validate_config(self) -> None:
        self.n = int(self.config.get("n", 100))
        if self.n < 0:
            raise OperatorConfigError("n must be >= 0")

    def read(self) -> DataFrame:
        spark = self._session()
        df = spark.range(self.n)
        return df.select(
            F.col("id"),
            (F.sin(F.col("id").cast("double")) * 100).alias("value"),
            F.concat(F.lit("row_"), F.col("id")).alias("label"),
        )


@register_operator("fail_source")
class FailSource(SourceOperator):
    """Always raises at read time (the reference's `failtest`)."""

    def read(self) -> DataFrame:
        raise RuntimeError(self.config.get("message", "fail_source: injected failure"))


_FAIL_ONCE_STATE: dict[str, bool] = {}


@register_operator("fail_once_sink")
class FailOnceSink(SinkOperator):
    """Fails the first write per `key`, succeeds afterwards — drives
    the runner's retry loop (reference `stub_fail_once`)."""

    def validate_config(self) -> None:
        self.key = str(self.config.get("key", "default"))

    def write(self, df: DataFrame) -> None:
        if not _FAIL_ONCE_STATE.get(self.key):
            _FAIL_ONCE_STATE[self.key] = True
            raise RuntimeError(f"fail_once_sink[{self.key}]: first attempt fails")
        df.count()  # consume
