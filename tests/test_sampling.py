import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.sampling import hash_sample, hash_split


def test_split_partition_complete_and_disjoint(tables):
    docs = tables["documents"]
    splits = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == n  # complete, no row lost or doubled
    train_ids = {r["doc_id"] for r in splits["train"].select("doc_id").collect()}
    val_ids = {r["doc_id"] for r in splits["val"].select("doc_id").collect()}
    assert not (train_ids & val_ids)  # disjoint
    # roughly proportional (hash-uniform; generous tolerance at n=500)
    assert counts["train"] > 0.6 * n


def test_split_deterministic_across_runs(tables):
    docs = tables["documents"]
    a = hash_split(docs, "doc_id", {"x": 0.5, "y": 0.5})
    b = hash_split(docs.repartition(7), "doc_id", {"x": 0.5, "y": 0.5})
    ids_a = {r["doc_id"] for r in a["x"].select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b["x"].select("doc_id").collect()}
    assert ids_a == ids_b  # partitioning-independent


def test_salt_changes_assignment(tables):
    docs = tables["documents"]
    base = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    salted = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, salt="v2").collect()}
    assert base != salted


def test_sample_rate_bounds(tables):
    docs = tables["documents"]
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    with pytest.raises(OperatorConfigError):
        hash_sample(docs, "doc_id", 1.5)


def test_operator_config_validation():
    with pytest.raises(OperatorConfigError, match="sum to 1"):
        get_operator("hash_split")(key_col="id", weights={"a": 0.5, "b": 0.4})
    with pytest.raises(OperatorConfigError):
        get_operator("hash_split")(weights={"a": 1.0})
    op = get_operator("hash_split")(key_col="id", weights={"a": 0.7, "b": 0.3})
    assert op.out_ports == ("a", "b")


# ------------------------------------------------- stratified / cap

def test_stratified_rates_respected_per_stratum(tables):
    from etl_core_spark.operators.sampling import hash_sample, stratified_hash_sample

    docs = tables["documents"]
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == totals["en"]       # rate 1.0 keeps all
    assert "de" not in by_lang                  # rate 0.0 drops all
    for lang in ("fr", "es", "zh"):             # default ~0.5, generous
        assert 0.2 * totals[lang] < by_lang[lang] < 0.8 * totals[lang]
    # a stratum at the default rate selects EXACTLY the plain
    # hash_sample rows — thresholds compose, not resample
    fr_ids = {r["doc_id"] for r in out.where(F.col("lang") == "fr").collect()}
    plain = hash_sample(docs.where(F.col("lang") == "fr"), "doc_id", 0.5)
    assert fr_ids == {r["doc_id"] for r in plain.select("doc_id").collect()}


def test_stratified_null_stratum_uses_default(spark):
    from etl_core_spark.operators.sampling import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(100)], "id long, lang string"
    )
    kept_all = stratified_hash_sample(df, "id", "lang", {"en": 0.0}, default_rate=1.0)
    rows = kept_all.collect()
    assert all(r["lang"] is None for r in rows)
    assert len(rows) == 50


def test_stratified_validation():
    with pytest.raises(OperatorConfigError, match="rates"):
        get_operator("stratified_sample")(key_col="id", strata_col="lang")
    with pytest.raises(OperatorConfigError, match="key_col"):
        get_operator("stratified_sample")(strata_col="lang", rates={"en": 0.5})


def test_cap_per_group_caps_and_is_stable(tables):
    from etl_core_spark.operators.sampling import cap_per_group

    ev = tables["events"]
    capped = cap_per_group(ev, ["event_type"], "event_id", 20)
    sizes = {
        r["event_type"]: r["n"]
        for r in capped.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert sizes and all(n == 20 for n in sizes.values())
    # selection is hash-ordered, hence partitioning-independent
    again = cap_per_group(ev.repartition(13), ["event_type"], "event_id", 20)
    ids_a = {r["event_id"] for r in capped.select("event_id").collect()}
    ids_b = {r["event_id"] for r in again.select("event_id").collect()}
    assert ids_a == ids_b


def test_cap_per_group_small_groups_untouched(spark):
    from etl_core_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(3)], "g string, id long"
    )
    assert cap_per_group(df, ["g"], "id", 10).count() == 6
    with pytest.raises(OperatorConfigError, match="max_rows"):
        cap_per_group(df, ["g"], "id", 0)


def test_cap_per_group_metric_mode(spark):
    from etl_core_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
         ("b", 5, 1.0)],
        "g string, k long, score double",
    )
    top2 = cap_per_group(df, ["g"], "k", 2, order_col="score", descending=True)
    got = {(r["g"], r["k"]) for r in top2.collect()}
    # score ties (k=2, k=4 both 30.0) break on the key: 2 wins
    assert got == {("a", 2), ("a", 4), ("b", 5)}
    bottom1 = cap_per_group(df, ["g"], "k", 1, order_col="score", descending=False)
    assert {(r["g"], r["k"]) for r in bottom1.collect()} == {("a", 1), ("b", 5)}


def test_cap_per_group_metric_mode_window_group_limit(spark, tables):
    from etl_core_spark.operators.sampling import cap_per_group

    out = cap_per_group(
        tables["orders"], ["o_orderpriority"], "o_orderkey", 3,
        order_col="o_totalprice",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # map-side pre-cut before the exchange, final cut after — both
    assert plan.count("WindowGroupLimit") >= 2


def test_pack_sequences_layout_invariants(spark):
    from etl_core_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(200)], "doc_id long, n long"
    )
    out = pack_sequences(df, "doc_id", "n", capacity=1000, shards=4).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        # offsets are exact concatenation arithmetic: sorting by
        # (bin, offset) reconstructs a gapless token stream
        rows.sort(key=lambda r: (r["bin_id"], r["offset_in_bin"]))
        stream = 0
        for r in rows:
            assert r["bin_id"] * 1000 + r["offset_in_bin"] == stream
            stream += r["n_tokens"]
    # deterministic under repartitioning
    again = pack_sequences(
        spark.createDataFrame(
            [(i, 100 + (i * 37) % 400) for i in range(200)], "doc_id long, n long"
        ).repartition(13),
        "doc_id", "n", capacity=1000, shards=4,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_chunk_documents_boundaries(spark):
    from etl_core_spark.operators.text_analysis import chunk_documents
    from etl_core_spark.operators.base import OperatorConfigError
    import pytest as _pytest

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> starts 0,3,6 (ceil(9/3)=3 chunks)
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert rows[(1, 2)] == ("w6 w7 w8 w9", 4)
    # every token covered, overlap of 1 at each seam
    assert rows[(2, 0)] == ("short doc", 2)  # sub-chunk doc: one chunk
    assert not any(d in (3, 4) for d, _ in rows)  # empty/null: no rows
    with _pytest.raises(OperatorConfigError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_chunk_id_unique_for_colon_bearing_ids(spark):
    """chunk_id puts the digits-only chunk_idx BEFORE the delimiter:
    doc 'a:1' chunk 2 and doc 'a' chunk 12 must not collide (the
    id-first format gave both 'a:1:2')."""
    from etl_core_spark.operators.text_analysis import chunk_documents

    long_doc = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [("a:1", long_doc), ("a", long_doc)], "doc_id string, text string"
    )
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=3, overlap=0)
    ids = [r["chunk_id"] for r in out.collect()]
    assert len(ids) == len(set(ids))
    assert "2:a:1" in ids and "12:a" in ids


def test_shuffle_rows_is_a_stable_permutation(spark):
    from etl_core_spark.operators.base import get_operator
    from etl_core_spark.operators.sampling import shuffle_rows

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(97)], "doc_id long, text string"
    )
    out = shuffle_rows(df, "doc_id", salt="e1", n_buckets=8)
    rows = out.collect()
    # exact permutation: every position 0..n-1 exactly once
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(97))
    # stable under physical layout changes
    again = shuffle_rows(df.repartition(13), "doc_id", salt="e1", n_buckets=8)
    assert {(r["doc_id"], r["shuffle_pos"]) for r in again.collect()} == {
        (r["doc_id"], r["shuffle_pos"]) for r in rows
    }
    # a different salt is a different permutation (epoch reshuffle)
    other = shuffle_rows(df, "doc_id", salt="e2", n_buckets=8)
    assert {(r["doc_id"], r["shuffle_pos"]) for r in other.collect()} != {
        (r["doc_id"], r["shuffle_pos"]) for r in rows
    }
    # not the identity / not sorted-by-key order
    byid = {r["doc_id"]: r["shuffle_pos"] for r in rows}
    assert [byid[i] for i in range(97)] != list(range(97))
    # registry path + validation
    op = get_operator("shuffle_rows")
    assert op(key_col="doc_id").config["key_col"] == "doc_id"
    with pytest.raises(OperatorConfigError):
        op()


def test_shuffle_rows_null_key_kept(spark):
    """A NULL key must not vanish (hash_bucket's sentinel contract) —
    it gets a real position like everyone else."""
    from etl_core_spark.operators.sampling import shuffle_rows

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id long, text string"
    )
    rows = shuffle_rows(df, "doc_id", n_buckets=4).collect()
    assert sorted(r["shuffle_pos"] for r in rows) == [0, 1, 2]
    assert any(r["doc_id"] is None for r in rows)


# -------------------------------------------------- systematic_sample

def test_systematic_sample_exact_membership(spark):
    df = spark.range(100).selectExpr("id", "cast(id as double) as v")
    out = get_operator("systematic_sample")(
        sort_cols=["id"], step=10, offset=4, rank_col="rn",
    ).apply({"in": df})["out"].collect()
    got = sorted((r["id"], r["rn"]) for r in out)
    # rank of id i is i+1; (rank-1) % 10 == 4 -> ids 4, 14, ..., 94
    assert got == [(i, i + 1) for i in range(4, 100, 10)]


def test_systematic_sample_partition_invariant(spark):
    df = spark.range(5000).selectExpr(
        "cast(id * 13 % 4999 as long) as key", "id"
    )
    op = get_operator("systematic_sample")(
        sort_cols=["key", "id"], step=97, offset=0,
    )
    a = sorted(r["id"] for r in op.apply(
        {"in": df.coalesce(1)})["out"].collect())
    b = sorted(r["id"] for r in op.apply(
        {"in": df.repartition(32)})["out"].collect())
    assert a == b and len(a) == 52  # ceil(5000/97)


def test_systematic_sample_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("systematic_sample")(sort_cols=[], step=10)
    with pytest.raises(OperatorConfigError):
        get_operator("systematic_sample")(sort_cols=["id"], step=0)
    with pytest.raises(OperatorConfigError):
        get_operator("systematic_sample")(sort_cols=["id"], step=5, offset=5)
    # rank_col colliding with an input column would emit a duplicate
    # column name — rejected loudly instead
    from etl_core_spark.operators.sampling import systematic_sample
    df = spark.range(10).select(F.col("id"), F.lit(1).alias("rk"))
    with pytest.raises(OperatorConfigError, match="already exists"):
        systematic_sample(df, ["id"], 3, rank_col="rk")


# -------------------------------------------------------------- negative_sample


def test_negative_sample_shape_and_determinism(spark):
    df = spark.range(200).selectExpr("id AS doc_id")
    op = get_operator("negative_sample")(id_col="doc_id", k=3, buckets=8)
    rows = op.apply({"in": df})["out"].collect()
    assert len(rows) == 600  # offsets never hit the anchor's bucket
    per_anchor = {}
    for r in rows:
        assert r["anchor"] != r["negative"]
        per_anchor.setdefault(r["anchor"], set()).add(r["neg_rank"])
    assert len(per_anchor) == 200
    assert all(v == {1, 2, 3} for v in per_anchor.values())
    again = op.apply({"in": df})["out"].collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_negative_sample_matches_python_reference(spark):
    import hashlib

    def hb(key, salt=""):
        return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)

    ids = list(range(50))
    B, K = 4, 2
    byb = {}
    for i in ids:
        byb.setdefault(hb(i) % B, []).append(i)
    ranked = {
        b: [i for i in sorted(members, key=lambda i: (hb(i, "#rank"), i))]
        for b, members in byb.items()
    }
    ref = set()
    for a in ids:
        ab = hb(a) % B
        for j in range(1, K + 1):
            tb = (ab + j) % B
            m = ranked.get(tb)
            if not m:
                continue
            neg = m[hb(f"{a}#{j}", "#pick") % len(m)]
            if neg != a:
                ref.add((a, j, neg))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = get_operator("negative_sample")(
        id_col="doc_id", k=K, buckets=B
    ).apply({"in": df})["out"]
    got = {(r["anchor"], r["neg_rank"], r["negative"]) for r in out.collect()}
    assert got == ref


def test_negative_sample_nulls_drop_and_validation(spark):
    import pytest

    from etl_core_spark.operators.base import OperatorConfigError

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "doc_id long"
    )
    out = get_operator("negative_sample")(
        id_col="doc_id", k=1, buckets=2
    ).apply({"in": df})["out"]
    rows = out.collect()
    assert all(r["anchor"] is not None and r["negative"] is not None
               for r in rows)
    with pytest.raises(OperatorConfigError):
        get_operator("negative_sample")(
            id_col="doc_id", k=8, buckets=8
        ).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("negative_sample")(
            id_col="doc_id", k=0
        ).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("negative_sample")(k=1).validate_config()


def test_negative_sample_empty_and_tiny_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long")
    out = get_operator("negative_sample")(
        id_col="doc_id", k=1, buckets=2
    ).apply({"in": empty})["out"]
    assert out.count() == 0
    # corpus of one: the only candidate lives in the anchor's own
    # bucket, which offsets never target -> zero rows, no error
    one = spark.createDataFrame([(7,)], "doc_id long")
    out2 = get_operator("negative_sample")(
        id_col="doc_id", k=1, buckets=4
    ).apply({"in": one})["out"]
    assert out2.count() == 0
