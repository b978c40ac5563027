"""XML source/sink.

Parity with the reference XML components
(``src/etl_core/components/file_components/xml/read_xml.py:15-51`` →
``receivers/files/xml/xml_helper.py``): documents with a ``root_tag``
wrapping repeated ``record_tag`` elements; attributes surface as
``@attr`` fields, text content as ``#text``, repeated child tags as
arrays (helper:74-110 conventions).

Read paths:

- Primary: Spark's built-in XML data source (Spark ≥4.0,
  ``format("xml")`` with ``rowTag``) — distributed, pushdown-capable.
- Fallback (data source absent): ``wholeTextFiles`` + per-file
  ``ET.iterparse`` on executors, records re-serialized as JSON lines
  so Spark's distributed JSON inference types them. Parallelism is
  per-FILE — a many-file XML corpus scales across executors; one
  giant single file is one parser (the same limitation the
  reference's incremental parser has, documented here).

Write paths:

- ``mode='overwrite'``: native XML writer (rootTag/rowTag).
- ``mode='append'``: reference-parity in-place append to ONE local
  XML document (``xml_helper.py:300-359`` — seek the closing root
  tag, truncate, write records, re-close). Appending to a single
  document is inherently single-writer; rows stream through
  ``toLocalIterator`` so the DataFrame is never fully materialized
  on the driver.
"""

from __future__ import annotations

import json
import os
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


def dict_to_element(tag: str, value: Any) -> ET.Element:
    """Inverse of ``element_to_dict`` (reference ``_row_to_element``,
    xml_helper.py:262-288): @attr keys → attributes, #text → text,
    lists → repeated child tags, dicts → nested elements."""
    elem = ET.Element(tag)
    if isinstance(value, dict):
        for key, val in value.items():
            if key.startswith("@"):
                if val is not None:
                    elem.set(key[1:], str(val))
            elif key == "#text":
                elem.text = "" if val is None else str(val)
            elif isinstance(val, list):
                for item in val:
                    elem.append(dict_to_element(key, item))
            else:
                elem.append(dict_to_element(key, val))
    elif value is not None:
        elem.text = str(value)
    return elem


def _parse_xml_content(content: str, record_tag: str) -> list[str]:
    """Parse one XML document's text into JSON-line records (executed
    on executors by the fallback read)."""
    import io

    out = []
    for _, elem in ET.iterparse(io.StringIO(content), events=("end",)):
        if elem.tag == record_tag:
            rec = element_to_dict(elem)
            out.append(json.dumps(rec if isinstance(rec, dict) else {"#text": rec}))
            elem.clear()
    return out


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
        except Exception as exc:
            # fall back ONLY on format-absence signatures (the mongo
            # reader's gating policy): a missing path, bad schema, or
            # malformed rowTag on the native path must SURFACE, not be
            # silently retried through a slower, semantically
            # different parser that fails later with an unrelated
            # error (or worse, succeeds differently)
            msg = f"{type(exc).__name__}: {exc}"
            absent = any(
                sig in msg
                for sig in (
                    "DATA_SOURCE_NOT_FOUND",
                    "Failed to find data source",
                    "Failed to find the data source",
                    "ClassNotFoundException",
                )
            )
            if not absent:
                raise
            import logging

            logging.getLogger(__name__).warning(
                "native XML data source unavailable; falling back to "
                "distributed iterparse for %s", path,
            )
            return self._fallback_read(spark, path)

    def _fallback_read(self, spark, path: str) -> DataFrame:
        """Distributed iterparse: one executor task per file, records
        re-serialized as JSON lines for distributed type inference."""
        record_tag = self.config["record_tag"]
        files = spark.sparkContext.wholeTextFiles(path)
        json_lines = files.flatMap(lambda kv: _parse_xml_content(kv[1], record_tag))
        reader = spark.read
        schema = self.declared_schema()
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(json_lines)


def append_records_in_place(
    path: str, root_tag: str, record_tag: str, rows, encoding: str = "utf-8"
) -> None:
    """Append records into one existing XML document in place
    (reference ``xml_helper.py:300-359``): locate the closing root
    tag at the file tail, truncate it, write the new record bytes,
    re-close. Creates the document if absent/empty.

    The row iterator is FULLY serialized to a bytes buffer BEFORE the
    truncate: rows stream off executors (toLocalIterator), and a row
    that fails mid-iteration — a serialization error, an executor
    task failure — must not destroy the only copy of the document
    after its closing tag is already gone. Post-buffering, the
    mutation is one truncate + one write; a hard crash inside that
    narrow window can still leave an unterminated file (in-place
    append is the reference's semantic — write a new document when
    you need atomicity)."""
    closing = f"</{root_tag}>".encode(encoding)
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(f'<?xml version="1.0" encoding="{encoding}"?>\n'.encode(encoding))
            fh.write(f"<{root_tag}>".encode(encoding))
            for row in rows:
                fh.write(ET.tostring(dict_to_element(record_tag, row), encoding=encoding))
            fh.write(closing)
        return
    with open(path, "rb+") as fh:
        fh.seek(0, os.SEEK_END)
        size = fh.tell()
        chunk = 64 * 1024
        pos = size
        remainder = b""
        closing_pos = None
        while pos > 0 and closing_pos is None:
            read_size = min(chunk, pos)
            pos -= read_size
            fh.seek(pos)
            buf = fh.read(read_size) + remainder
            idx = buf.rfind(closing)
            if idx != -1:
                closing_pos = pos + idx
                break
            remainder = buf[: max(0, len(closing) - 1)]
        if closing_pos is None:
            raise OperatorConfigError(
                f"append to {path!r}: closing tag </{root_tag}> not found"
            )
        payload = b"".join(
            ET.tostring(dict_to_element(record_tag, row), encoding=encoding)
            for row in rows
        )  # fully materialized BEFORE the truncate (see docstring)
        fh.seek(closing_pos)
        fh.truncate(closing_pos)
        fh.write(payload + closing)


@register_operator("write_xml")
class WriteXml(SinkOperator):
    def validate_config(self) -> None:
        for key in ("filepath", "root_tag", "record_tag"):
            if key not in self.config:
                raise OperatorConfigError(f"write_xml requires {key!r}")

    def write(self, df: DataFrame) -> None:
        if self.config.get("mode") == "append":
            # reference-parity in-place append to one document; rows
            # stream through toLocalIterator (never fully driver-held)
            append_records_in_place(
                str(self.config["filepath"]),
                self.config["root_tag"],
                self.config["record_tag"],
                (row.asDict(recursive=True) for row in df.toLocalIterator()),
            )
            return
        out = df.coalesce(1) if self.config.get("single_file", True) else df
        (
            out.write.format("xml")
            .mode(self.config.get("mode", "overwrite"))
            .option("rootTag", self.config["root_tag"])
            .option("rowTag", self.config["record_tag"])
            .save(str(self.config["filepath"]))
        )
