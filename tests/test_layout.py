"""Write-time layout: compaction to a target file size, sorted and
z-ordered clustering, and the pruning statistics they produce."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.functions.layout import _ZBITS, zvalue
from etl_core_spark.operators.base import OperatorConfigError, get_operator


def _py_interleave(buckets: list[int]) -> int:
    n = len(buckets)
    out = 0
    for i, b in enumerate(buckets):
        for k in range(_ZBITS):
            out |= ((b >> k) & 1) << (k * n + i)
    return out


def test_zvalue_matches_python_interleave(spark):
    # values chosen so bucket = value (span 0..65535 over 2^16 buckets
    # maps v -> floor(v / 65535 * 65536) which is v for v < 65535/2…
    # use exact corner values instead)
    df = spark.createDataFrame(
        [(0.0, 0.0), (65535.0, 0.0), (0.0, 65535.0), (65535.0, 65535.0)],
        "x double, y double",
    )
    got = {
        (r["x"], r["y"]): r["__z"] for r in zvalue(df, ["x", "y"]).collect()
    }
    m = (1 << _ZBITS) - 1
    assert got[(0.0, 0.0)] == 0
    assert got[(65535.0, 0.0)] == _py_interleave([m, 0])
    assert got[(0.0, 65535.0)] == _py_interleave([0, m])
    assert got[(65535.0, 65535.0)] == _py_interleave([m, m])


def test_zvalue_4col_stays_nonnegative_and_monotone(spark):
    """With 4 dims x 16 bits the 4th dimension's top bit would land on
    the long sign bit (position 63): rows in that dimension's upper
    half went NEGATIVE and sorted before everything else. Bits per dim
    are capped at floor(63/ndims)=15 for 4 columns — __z must be
    non-negative everywhere and monotone along each dimension."""
    hi = 65535.0
    rows = [(v, v, v, v) for v in [0.0, 1000.0, 30000.0, 40000.0, hi]]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    got = {r["a"]: r["__z"] for r in zvalue(df, ["a", "b", "c", "d"]).collect()}
    assert all(z >= 0 for z in got.values()), got
    ordered = [got[k] for k in sorted(got)]
    assert ordered == sorted(ordered)  # diagonal is monotone on the curve
    # upper-half corner: all dims at max -> all 60 interleaved bits set
    assert got[hi] == (1 << 60) - 1


def test_zvalue_handles_constant_and_null(spark):
    df = spark.createDataFrame(
        [(1.0, None), (1.0, 5.0)], "x double, y double"
    )
    rows = zvalue(df, ["x", "y"]).collect()
    # constant column -> bucket 0 everywhere; NULL -> bucket 0
    zs = sorted(r["__z"] for r in rows)
    assert zs[0] == 0  # (1.0, NULL)
    with pytest.raises(ValueError, match="1-4 columns"):
        zvalue(df, [])


def test_target_file_mb_compacts(spark, tmp_path, tables):
    src = tables["lineitem"].repartition(32)  # the small-files shape
    out = tmp_path / "compacted"
    get_operator("write_parquet")(
        filepath=str(out), target_file_mb=64
    ).apply({"in": src})
    files = [p for p in out.iterdir() if p.name.endswith(".parquet")]
    # sf0.001 lineitem is far below 64 MB -> exactly one data file
    assert len(files) == 1
    back = get_operator("read_parquet")(spark=spark, filepath=str(out)).apply({})["out"]
    assert back.count() == src.count()


def test_sort_by_tightens_file_ranges(spark, tmp_path, tables):
    """Each sorted output file must cover a disjoint range of the sort
    column (repartitionByRange + sortWithinPartitions)."""
    out = tmp_path / "sorted"
    get_operator("write_parquet")(
        filepath=str(out), sort_by=["o_totalprice"], num_files=5
    ).apply({"in": tables["orders"].repartition(8)})
    back = spark.read.parquet(str(out))
    ranges = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint -> min/max pruning works


def test_zorder_clusters_both_columns(spark, tmp_path, tables):
    """Z-ordered files must localize BOTH columns: every file's span
    in each dimension is a fraction of the global span (a single-col
    sort leaves the other column's per-file span ~ the full span)."""
    orders = tables["orders"].repartition(8)
    out = tmp_path / "zordered"
    get_operator("write_parquet")(
        filepath=str(out), zorder_by=["o_custkey", "o_totalprice"], num_files=6
    ).apply({"in": orders})
    back = spark.read.parquet(str(out))
    assert "__z" not in back.columns
    assert back.count() == orders.count()
    per_file = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("tp_span"),
        )
        .collect()
    )
    glob = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("tp"),
    ).collect()[0]
    if len(per_file) > 2:
        avg_ck = sum(r["ck_span"] for r in per_file) / len(per_file)
        avg_tp = sum(r["tp_span"] for r in per_file) / len(per_file)
        # each dimension localized to well under the full span
        assert avg_ck < 0.8 * glob["ck"]
        assert avg_tp < 0.8 * glob["tp"]


def test_sort_and_zorder_exclusive(spark):
    with pytest.raises(OperatorConfigError, match="exclusive"):
        get_operator("write_parquet")(
            filepath="/tmp/x", sort_by=["a"], zorder_by=["b"]
        )


def test_zvalue_quantile_spreads_skewed_data(spark):
    """Under zipf-ish skew, range normalization crams most rows into
    a few buckets; quantile normalization keeps cells equi-populated.
    Measured as the population share of the single hottest z-cell."""
    import math

    rows = [(float(int(math.exp(i / 120.0))), float(i % 997)) for i in range(6000)]
    df = spark.createDataFrame(rows, "x double, y double")

    def spread(method):
        z = zvalue(df, ["x"], method=method)  # 1-dim: z IS the bucket
        counts = [r["count"] for r in z.groupBy("__z").count().collect()]
        return len(counts), max(counts) / sum(counts)

    q_cells, q_hot = spread("quantile")
    r_cells, r_hot = spread("range")
    # exp() tail: range normalization crams most rows into the low
    # buckets; quantile buckets stay equi-populated
    assert q_cells > 100 and q_hot < 0.05
    # (cell COUNTS are not comparable across modes: range uses 16-bit
    # buckets, quantile 8-bit — the population share is the metric)
    assert q_hot < r_hot
    assert r_hot > 0.2  # the skew really is pathological for range mode
    with pytest.raises(ValueError, match="method"):
        zvalue(df, ["x"], method="hilbert")


def test_zorder_quantile_through_sink(spark, tmp_path, tables):
    out = tmp_path / "zq"
    get_operator("write_parquet")(
        filepath=str(out), zorder_by=["o_custkey", "o_totalprice"],
        zorder_method="quantile", num_files=4,
    ).apply({"in": tables["orders"]})
    back = spark.read.parquet(str(out))
    assert back.count() == tables["orders"].count()
    assert "__z" not in back.columns


# ----------------------------------------------------------------------
# upsert_parquet (batch MERGE-INTO over plain parquet)
# ----------------------------------------------------------------------

def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, v double",
    )
    upsert_parquet(base, path, ["id"], "part")  # creates the table
    upd = spark.createDataFrame(
        [(2, "a", 99.0), (4, "a", 40.0)], "id long, part string, v double"
    )
    upsert_parquet(upd, path, ["id"], "part")
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    # id 2 replaced, id 4 appended, untouched partition 'b' intact
    assert got == {(1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)}


def test_upsert_parquet_prunes_untouched_partitions(spark, tmp_path):
    """Only touched partitions rewrite: the files of partition 'b'
    must be byte-identical (same paths, same mtimes) after an upsert
    that only touches partition 'a'."""
    import os

    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    upsert_parquet(base, path, ["id"], "part")

    def snapshot(part):
        d = os.path.join(path, f"part={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    before_b = snapshot("b")
    upd = spark.createDataFrame([(1, "a", 9.0)], "id long, part string, v double")
    upsert_parquet(upd, path, ["id"], "part")
    assert snapshot("b") == before_b  # partition b never rewritten
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 9.0), (2, 2.0)}


def test_upsert_parquet_staged_swap(spark, tmp_path):
    """staged=True: identical merge semantics, but touched partitions
    are swapped in by directory rename — no staging/trash residue, the
    untouched partition's files stay byte-identical, and NULL
    partitions (__HIVE_DEFAULT_PARTITION__) swap correctly too."""
    import os

    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)],
        "id long, part string, v double",
    )
    upsert_parquet(base, path, ["id"], "part", staged=True)  # creates
    def snapshot(part):
        d = os.path.join(path, f"part={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        }
    before_b = snapshot("b")
    upd = spark.createDataFrame(
        [(1, "a", 9.0), (4, None, 4.0)], "id long, part string, v double"
    )
    upsert_parquet(upd, path, ["id"], "part", staged=True)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 9.0), (2, 2.0), (3, 3.0), (4, 4.0)}
    assert snapshot("b") == before_b  # untouched partition: same files
    leftovers = [d for d in os.listdir(path) if d.startswith(".upsert_")]
    assert leftovers == []
    with pytest.raises(OperatorConfigError, match="requires partition"):
        upsert_parquet(upd, path, ["id"], None, staged=True)


def test_upsert_parquet_staged_swap_multi_column(spark, tmp_path):
    """staged=True with TWO partition columns: the swap unit is the
    leaf directory of the concatenated partition path (ds=/lang=) —
    untouched sibling leaves under the same first-level value keep
    byte-identical files, touched leaves are replaced, new leaves
    appear, and no staging/trash residue survives."""
    import os

    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t2")
    base = spark.createDataFrame(
        [
            (1, "d1", "en", 1.0),
            (2, "d1", "de", 2.0),
            (3, "d2", "en", 3.0),
            (4, "d1", None, 4.0),
        ],
        "id long, ds string, lang string, v double",
    )
    upsert_parquet(base, path, ["id"], ["ds", "lang"], staged=True)

    def snapshot(ds, lang):
        d = os.path.join(path, f"ds={ds}", f"lang={lang}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    before_de = snapshot("d1", "de")
    before_d2 = snapshot("d2", "en")
    upd = spark.createDataFrame(
        [
            (1, "d1", "en", 9.0),   # replace in touched leaf
            (5, "d1", None, 5.0),   # NULL leaf swap
            (6, "d3", "fr", 6.0),   # brand-new first-level dir
        ],
        "id long, ds string, lang string, v double",
    )
    upsert_parquet(upd, path, ["id"], ["ds", "lang"], staged=True)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, 9.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0), (6, 6.0)
    }
    # untouched sibling leaf under the SAME touched first-level value,
    # and an untouched leaf elsewhere: files byte-identical
    assert snapshot("d1", "de") == before_de
    assert snapshot("d2", "en") == before_d2
    leftovers = [d for d in os.listdir(path) if d.startswith(".upsert_")]
    assert leftovers == []


def test_upsert_parquet_null_partition_values(spark, tmp_path):
    """An update batch touching the NULL partition must NOT delete
    existing NULL-partition rows with other keys: isin(touched) never
    matches NULL, but dynamic overwrite still rewrites the NULL
    partition (__HIVE_DEFAULT_PARTITION__) — the carry predicate has
    to be null-safe."""
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, "a", 3.0)],
        "id long, part string, v double",
    )
    upsert_parquet(base, path, ["id"], "part")
    # update touches ONLY the NULL partition, only key 1
    upd = spark.createDataFrame([(1, None, 9.0)], "id long, part string, v double")
    upsert_parquet(upd, path, ["id"], "part")
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    # id 2 (NULL partition, unmatched key) must survive the rewrite
    assert got == {(1, 9.0), (2, 2.0), (3, 3.0)}
    # and a mixed batch (NULL + non-NULL partitions) carries both sides
    upd2 = spark.createDataFrame(
        [(2, None, 20.0), (4, "a", 40.0)], "id long, part string, v double"
    )
    upsert_parquet(upd2, path, ["id"], "part")
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 9.0), (2, 20.0), (3, 3.0), (4, 40.0)}


def test_upsert_parquet_schema_evolution(spark, tmp_path):
    """Added/removed batch columns: refused by default; with
    allow_schema_evolution=True the whole table rewrites on the union
    schema (no mergeSchema needed afterwards) with NULL fills on the
    missing side; key/partition columns can never evolve away."""
    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    upsert_parquet(base, path, ["id"], "part")
    widened = spark.createDataFrame(
        [(1, "a", 9.0, "x")], "id long, part string, v double, tag string"
    )
    with pytest.raises(OperatorConfigError, match="schema_evolution"):
        upsert_parquet(widened, path, ["id"], "part")
    upsert_parquet(widened, path, ["id"], "part", allow_schema_evolution=True)
    back = spark.read.parquet(path)  # NO mergeSchema option needed
    assert set(back.columns) == {"id", "part", "v", "tag"}
    got = {(r["id"], r["v"], r["tag"]) for r in back.collect()}
    assert got == {(1, 9.0, "x"), (2, 2.0, None)}
    # removed column: old rows keep values, batch rows get NULL
    narrowed = spark.createDataFrame([(3, "b", None)], "id long, part string, v double")
    upsert_parquet(
        narrowed.drop("v"), path, ["id"], "part", allow_schema_evolution=True
    )
    got = {(r["id"], r["v"], r["tag"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, 9.0, "x"), (2, 2.0, None), (3, None, None)}
    # keys/partition columns must not evolve away
    keyless = spark.createDataFrame([("a", 5.0)], "part string, v double")
    with pytest.raises(OperatorConfigError, match="key/partition"):
        upsert_parquet(keyless, path, ["id"], "part",
                       allow_schema_evolution=True)


def test_upsert_parquet_moved_key_across_partitions(spark, tmp_path):
    """A batch that moves a key to a different partition: the default
    pruned carry documents the stable-partitions contract (the stale
    old-partition row survives); stable_partitions=False scans the
    full table, deletes the vacated row AND the vacated partition
    directory (static full rewrite, not dynamic), leaving exactly one
    row per key; staged mode refuses the combination."""
    import os

    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "p1", 1.0), (2, "p2", 2.0)], "id long, part string, v double"
    )
    upsert_parquet(base, path, ["id"], "part")
    move = spark.createDataFrame([(1, "p2", 9.0)], "id long, part string, v double")
    upsert_parquet(move, path, ["id"], "part", stable_partitions=False)
    got = {(r["id"], r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "p2", 9.0), (2, "p2", 2.0)}  # no duplicate id 1
    assert not os.path.exists(os.path.join(path, "part=p1"))  # vacated dir gone
    with pytest.raises(OperatorConfigError, match="stable_partitions"):
        upsert_parquet(move, path, ["id"], "part", staged=True,
                       stable_partitions=False)


def test_upsert_parquet_staged_schema_evolution(spark, tmp_path):
    """staged + allow_schema_evolution: the full carry puts EVERY
    partition into staging, so the swap replaces them all and the
    table ends uniformly on the union schema with no residue."""
    import os

    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    upsert_parquet(base, path, ["id"], "part", staged=True)
    widened = spark.createDataFrame(
        [(1, "a", 9.0, "x")], "id long, part string, v double, tag string"
    )
    upsert_parquet(widened, path, ["id"], "part", staged=True,
                   allow_schema_evolution=True)
    back = spark.read.parquet(path)
    assert set(back.columns) == {"id", "part", "v", "tag"}
    got = {(r["id"], r["v"], r["tag"]) for r in back.collect()}
    assert got == {(1, 9.0, "x"), (2, 2.0, None)}
    assert [d for d in os.listdir(path) if d.startswith(".upsert_")] == []


def test_upsert_parquet_null_keys_and_operator(spark, tmp_path):
    """NULL keys merge null-safely (replace, not duplicate); the
    registered sink validates its config."""
    import pytest as _pytest

    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(None, 1.0), (1, 2.0)], "id long, v double")
    upsert_parquet(base, path, ["id"])
    upsert_parquet(
        spark.createDataFrame([(None, 9.0)], "id long, v double"), path, ["id"]
    )
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(None, 9.0), (1, 2.0)}
    op = get_operator("upsert_parquet")
    with _pytest.raises(OperatorConfigError, match="keys"):
        op(filepath=path)
    with _pytest.raises(OperatorConfigError, match="requires partition"):
        op(filepath=path, keys=["id"], staged=True).write(base)
    with _pytest.raises(OperatorConfigError, match="stable_partitions"):
        op(filepath=path, keys=["id"], partition_by=["v"], staged=True,
           stable_partitions=False).write(base)


def test_upsert_parquet_multi_column_partitions(spark, tmp_path):
    """Multi-column partitioning: only touched (ds, lang) LEAVES
    rewrite; sibling leaves under a touched top-level dir stay
    byte-identical; NULL leaf tuples carry null-safely."""
    import os

    from etl_core_spark.sources.parquet_io import upsert_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "d1", "en", 1.0), (2, "d1", "de", 2.0),
         (3, "d2", "en", 3.0), (4, "d1", None, 4.0)],
        "id long, ds string, lang string, v double",
    )
    upsert_parquet(base, path, ["id"], ["ds", "lang"])

    def snapshot(ds, lang):
        d = os.path.join(path, f"ds={ds}", f"lang={lang}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    before_d1_de = snapshot("d1", "de")
    before_d2_en = snapshot("d2", "en")
    # touch only (d1, en) and the NULL-lang leaf of d1
    upd = spark.createDataFrame(
        [(1, "d1", "en", 9.0), (5, "d1", None, 5.0)],
        "id long, ds string, lang string, v double",
    )
    upsert_parquet(upd, path, ["id"], ["ds", "lang"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    # 1 replaced, 5 appended; 4 (NULL-lang leaf, unmatched key) carried
    assert got == {(1, 9.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)}
    # sibling leaf (d1, de) under the touched ds=d1 dir: untouched
    assert snapshot("d1", "de") == before_d1_de
    assert snapshot("d2", "en") == before_d2_en


def test_certification_doc_is_fresh():
    """docs/CERTIFICATION.md must match what the generator produces
    from the current registry + CORRECTNESS history — a stale table
    defeats the point (mechanical freshness visibility)."""
    import pathlib
    import subprocess
    import sys

    import glob
    import re

    repo = pathlib.Path(__file__).resolve().parent.parent
    doc = repo / "docs" / "CERTIFICATION.md"
    assert doc.exists(), "run scripts/gen_certification.py"
    before = doc.read_text()
    # the generator writes in place: rerun it, compare, and restore
    # the committed copy on mismatch so the failure is inspectable
    subprocess.run(
        [sys.executable, str(repo / "scripts" / "gen_certification.py")],
        check=True,
        capture_output=True,
    )
    after = doc.read_text()
    if after != before:
        doc.write_text(before)
    if after != before:
        # The driver drops CORRECTNESS_r{N}.json AFTER the session's
        # final commit, so a committed doc can legitimately trail the
        # newest round by exactly one file. Tolerate that one case:
        # regenerate with the history capped at the doc's own newest
        # round and require equality there instead.
        doc_rounds = [int(m) for m in re.findall(r"\| r(\d+) \|", before)]
        hist_rounds = [
            int(re.search(r"r(\d+)", pathlib.Path(p).name).group(1))
            for p in glob.glob(str(repo / "CORRECTNESS_r*.json"))
        ]
        if doc_rounds and hist_rounds and max(hist_rounds) > max(doc_rounds):
            subprocess.run(
                [
                    sys.executable,
                    str(repo / "scripts" / "gen_certification.py"),
                    "--max-round",
                    str(max(doc_rounds)),
                ],
                check=True,
                capture_output=True,
            )
            capped = doc.read_text()
            doc.write_text(before)
            assert capped == before, (
                "docs/CERTIFICATION.md is stale even after tolerating the "
                "post-commit driver round — rerun scripts/gen_certification.py"
            )
            return
    assert after == before, (
        "docs/CERTIFICATION.md is stale — rerun scripts/gen_certification.py"
    )


# ------------------------------------------------- zorder_key operator

def test_zorder_key_operator_matches_zvalue_function(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 5.0), (3, 20.0, 9.0)],
        "id long, x double, y double",
    )
    got = {
        r["id"]: r["zvalue"]
        for r in get_operator("zorder_key")(cols=["x", "y"])
        .apply({"in": df})["out"]
        .collect()
    }
    want = {
        r["id"]: r["__z"] for r in zvalue(df, ["x", "y"]).collect()
    }
    assert got == want


def test_zorder_key_partitions_range_clusters(spark):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    out = get_operator("zorder_key")(cols=["x", "y"], partitions=8).apply(
        {"in": df}
    )["out"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # within every partition the z-values are sorted (the clustered
    # layout the parquet writer needs for tight zone maps)
    parts = out.select("zvalue").rdd.glom().collect()
    for p in parts:
        vals = [r["zvalue"] for r in p]
        assert vals == sorted(vals)


def test_zorder_key_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("zorder_key")(cols=[])
    with pytest.raises(OperatorConfigError):
        get_operator("zorder_key")(cols=["a", "b", "c", "d", "e"])
    with pytest.raises(OperatorConfigError):
        get_operator("zorder_key")(cols=["x"], method="sorted")
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(OperatorConfigError, match="not found"):
        get_operator("zorder_key")(cols=["nope"]).apply({"in": df})
