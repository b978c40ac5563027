"""Sharded training-data export with a manifest (beyond-reference).

Trainers consume corpora as N fixed shards with a manifest (shard
paths + row counts + a fingerprint) so data loaders can seek, stripe
across workers, and verify integrity without listing the store. This
sink writes exactly that:

- shard assignment is DETERMINISTIC by key hash (``hash_bucket``,
  the engine-wide md5 convention) — re-exports of the same corpus
  produce identical shard membership regardless of partitioning, so
  resumed jobs and incremental verifications agree;
- the data lands under ``<dir>/shard=<i>/`` via one
  ``partitionBy`` write (a single shuffle-free pass when upstream is
  already hash-clustered; Spark's dynamic file assignment otherwise);
- ``_manifest.json`` (underscore-prefixed so Spark's file listing
  skips it, the _SUCCESS convention) records per-shard row counts and an
  order-insensitive content fingerprint (xor-free: sum of per-row
  xxhash64 of the key, mod 2^63) — computed in the SAME aggregation
  pass as the counts (one job, bounded n_shards-row collect).

The manifest is written AFTER the data write succeeds, so a reader
that requires the manifest never sees a half-written export (the
staged-upsert visibility principle, one rename cheaper).
"""

from __future__ import annotations

import json


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator

_FORMATS = ("parquet", "json", "orc")

_FP_MOD = 2 ** 61 - 1


def shard_col(key_col: str, salt: str, n_shards: int):
    """The engine-wide deterministic shard assignment expression."""
    from etl_core_spark.operators.sampling import hash_bucket

    return F.pmod(hash_bucket(F.col(key_col), salt), F.lit(int(n_shards))).cast(
        "int"
    )


def shard_stats(df_with_shard: DataFrame, key_col: str, salt: str) -> dict:
    """Per-shard (rows, fingerprint-residue) from a DataFrame that
    already carries ``shard``. Bounded collect: n_shards rows. The
    residue is sum(xxhash64(key) mod 2^61-1); residues COMPOSE by
    modular addition, so incremental callers can fold batch residues
    into a running manifest without rescanning history."""
    stats = (
        df_with_shard.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.pmod(
                    F.xxhash64(F.col(key_col).cast("string"), F.lit(salt)),
                    F.lit(_FP_MOD),
                ).cast("decimal(38,0)")  # long sum of 2^61-sized terms
                # overflows after a handful of rows under ANSI mode
            ).alias("fp_sum"),
        )
        .collect()
    )
    return {
        int(r["shard"]): (int(r["rows"]), int(r["fp_sum"]) % _FP_MOD)
        for r in stats
    }


def build_manifest(
    n_shards: int, fmt: str, key_col: str, salt: str, by_shard: dict
) -> dict:
    """Manifest dict from {shard: (rows, fingerprint)}."""
    shards = []
    for i in range(int(n_shards)):
        rows, fp = by_shard.get(i, (0, 0))
        shards.append(
            {
                "shard": i,
                "path": f"shard={i}",
                "rows": int(rows),
                "fingerprint": int(fp) % _FP_MOD,
            }
        )
    return {
        "format": fmt,
        "n_shards": int(n_shards),
        "key_col": key_col,
        "salt": salt,
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }


def write_manifest(spark, directory: str, manifest: dict) -> None:
    """Manifest last: its presence certifies a complete export.
    Hadoop FileSystem API, not builtin open(): the data just went
    through Spark writers, so the directory may be hdfs://-style —
    a driver-local open() would crash or strand the manifest on
    the driver's disk (the _staged_partition_swap policy)."""
    from etl_core_spark.sources.hadoop_fs import fs_write_text

    fs_write_text(
        spark,
        f"{directory}/_manifest.json",
        json.dumps(manifest, indent=1, sort_keys=True),
    )


def export_shards(
    df: DataFrame,
    directory: str,
    key_col: str,
    n_shards: int = 16,
    fmt: str = "parquet",
    salt: str = "",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic shards plus a
    ``_manifest.json``; returns the manifest dict."""
    n = int(n_shards)
    if n < 1:
        raise OperatorConfigError("export_shards n_shards must be >= 1")
    if fmt not in _FORMATS:
        raise OperatorConfigError(
            f"export_shards format must be one of {_FORMATS}, got {fmt!r}"
        )
    if key_col not in df.columns:
        raise OperatorConfigError(
            f"export_shards key {key_col!r} not in input {df.columns}"
        )
    with_shard = df.withColumn("shard", shard_col(key_col, salt, n))
    # one pass for the data; shard dirs come from partitionBy
    (
        with_shard.write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(directory)
    )
    # one aggregation job for counts + content fingerprint — bounded
    # collect (n_shards rows), never row-sized on the driver. The
    # stats ALWAYS read the written directory back, in both modes:
    # aggregating the input plan instead would re-evaluate it, and a
    # non-deterministic upstream (sample, limit without order, a
    # speculative retry) would then make the manifest disagree with
    # the data and fail its own verify_export — the exact hazard
    # shuffle_rows persists against. The read-back is column-pruned
    # to (shard, key_col) for columnar formats, a fraction of the
    # write's cost; in append mode it is additionally required so the
    # manifest describes the whole directory, not just this batch.
    stats_src = df.sparkSession.read.format(fmt).load(directory)
    by_shard = shard_stats(stats_src, key_col, salt)
    manifest = build_manifest(n, fmt, key_col, salt, by_shard)
    write_manifest(df.sparkSession, directory, manifest)
    return manifest


def read_manifest(spark, directory: str) -> dict:
    from etl_core_spark.sources.hadoop_fs import fs_read_text

    text = fs_read_text(spark, f"{directory}/_manifest.json")
    if text is None:
        raise FileNotFoundError(
            f"{directory}/_manifest.json missing — incomplete export"
        )
    return json.loads(text)


def verify_export(spark, directory: str) -> dict:
    """Recompute every shard's row count + fingerprint from the data
    and diff against the manifest. Returns {shard: 'ok'|'MISMATCH'};
    raises if the manifest is missing (incomplete export)."""
    m = read_manifest(spark, directory)
    df = spark.read.format(m["format"]).load(directory)
    got = shard_stats(df, m["key_col"], m["salt"])
    out = {}
    for s in m["shards"]:
        actual = got.get(s["shard"], (0, 0))
        ok = actual == (s["rows"], s["fingerprint"])
        out[s["shard"]] = "ok" if ok else "MISMATCH"
    return out


@register_operator("export_shards")
class ExportShardsSink(SinkOperator):
    """Config: ``filepath`` (required), ``key_col`` (required),
    ``n_shards``, ``format`` ∈ {parquet, json, orc}, ``salt``,
    ``mode``."""

    def validate_config(self) -> None:
        for key in ("filepath", "key_col"):
            if not self.config.get(key):
                raise OperatorConfigError(f"export_shards requires {key!r}")

    def write(self, df: DataFrame) -> None:
        c = self.config
        self.manifest = export_shards(
            df,
            str(c["filepath"]),
            c["key_col"],
            int(c.get("n_shards", 16)),
            c.get("format", "parquet"),
            c.get("salt", ""),
            c.get("mode", "overwrite"),
        )
