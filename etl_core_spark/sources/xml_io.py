"""XML source/sink.

Parity with the reference XML components
(``src/etl_core/components/file_components/xml/read_xml.py:15-51`` →
``receivers/files/xml/xml_helper.py``): documents with a ``root_tag``
wrapping repeated ``record_tag`` elements; attributes surface as
``@attr`` fields, text content as ``#text``, repeated child tags as
arrays (helper:74-110 conventions).

Primary path: Spark's built-in XML data source (Spark ≥4.0,
``format("xml")`` with ``rowTag``) — distributed, pushdown-capable.
Fallback (older Spark): driver-side ``ET.iterparse`` streaming into
``createDataFrame`` — same single-node reality as the reference's
incremental parser, flagged at plan-build time.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any

from pyspark.sql import DataFrame

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


def element_to_dict(elem: ET.Element) -> Any:
    """Element → nested dict with @attr / #text conventions and
    repeated-tag → list promotion (reference xml_helper.py:74-110)."""
    d: dict[str, Any] = {f"@{k}": v for k, v in elem.attrib.items()}
    children = list(elem)
    if not children:
        text = (elem.text or "").strip()
        if d:
            if text:
                d["#text"] = text
            return d
        return text if text else None
    for child in children:
        val = element_to_dict(child)
        if child.tag in d:
            prev = d[child.tag]
            if not isinstance(prev, list):
                d[child.tag] = [prev]
            d[child.tag].append(val)
        else:
            d[child.tag] = val
    return d


@register_operator("read_xml")
class ReadXml(SourceOperator):
    def validate_config(self) -> None:
        for key in ("filepath", "record_tag"):
            if key not in self.config:
                raise OperatorConfigError(f"read_xml requires {key!r}")

    def read(self) -> DataFrame:
        spark = self._session()
        path = str(self.config["filepath"])
        try:
            reader = spark.read.format("xml").option("rowTag", self.config["record_tag"])
            schema = self.declared_schema()
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.load(path)
            df.schema  # force analysis to surface missing-format errors
            return df
        except Exception:
            return self._fallback_read(spark, path)

    def _fallback_read(self, spark, path: str) -> DataFrame:
        records = []
        for _, elem in ET.iterparse(path, events=("end",)):
            if elem.tag == self.config["record_tag"]:
                rec = element_to_dict(elem)
                records.append(rec if isinstance(rec, dict) else {"#text": rec})
                elem.clear()
        schema = self.declared_schema()
        if schema is not None:
            return spark.createDataFrame(records, schema)
        return spark.createDataFrame(records)


@register_operator("write_xml")
class WriteXml(SinkOperator):
    def validate_config(self) -> None:
        for key in ("filepath", "root_tag", "record_tag"):
            if key not in self.config:
                raise OperatorConfigError(f"write_xml requires {key!r}")

    def write(self, df: DataFrame) -> None:
        out = df.coalesce(1) if self.config.get("single_file", True) else df
        (
            out.write.format("xml")
            .mode(self.config.get("mode", "overwrite"))
            .option("rootTag", self.config["root_tag"])
            .option("rowTag", self.config["record_tag"])
            .save(str(self.config["filepath"]))
        )
