"""Small-file I/O through the Hadoop FileSystem API.

Persistent-index metadata (``_index_meta.json``, ``_ivf_meta.json``)
must live NEXT TO the data it describes — on HDFS/S3A that is the
remote store, not the driver's local disk. ``os.path`` probes only
the local FS (the `_table_exists` lesson, streaming/stream.py): a
valid remote index would read as meta-less, the parameter-mismatch
guard would never fire, and a second driver host could never query
the index.
"""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(str(path))
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def fs_exists(spark, path: str) -> bool:
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.exists(jpath))


def fs_read_text(spark, path: str) -> str | None:
    """File contents as UTF-8, or None if the file does not exist."""
    fs, jpath, jvm = _fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # commons-io ships on Spark's classpath
        return str(
            jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        )
    finally:
        stream.close()


def fs_write_text(spark, path: str, text: str) -> None:
    fs, jpath, _ = _fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_has_data_files(spark, path: str) -> bool:
    """True iff ``path`` exists and holds at least one NON-metadata
    file (recursing into partition subdirectories). Metadata =
    basenames starting with ``_`` or ``.`` (``_manifest.json``,
    ``_SUCCESS``, checkpoints), matching Spark's own hidden-file
    convention. Lets callers distinguish "fresh/empty export dir"
    from "dir with data whose READ failed" without classifying reader
    exceptions."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        name = str(it.next().getPath().getName())
        if not name.startswith(("_", ".")):
            return True
    return False
