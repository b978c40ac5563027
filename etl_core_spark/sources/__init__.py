"""Sources and sinks.

Each format gets a ``read_*`` operator (no in-ports, one out port)
and a ``write_*`` operator (one in-port, terminal action). Reads are
lazy DataFrames so Catalyst pushes filters/projections into the scan;
writes are the job's only actions.
"""

from etl_core_spark.sources import (  # noqa: F401
    csv_io,
    json_io,
    xml_io,
    excel_io,
    parquet_io,
    orc_io,
    text_io,
    binary_io,
    export_io,
    jdbc_io,
    mongodb_io,
    generate,
    bucketed,
)
