"""line_dedup / lm_score / pii_scan / url_parts / mix_corpora / ORC
source — the round-7 training-data-pipeline additions."""

import math

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.sampling import _HASH_SPACE, mix_corpora
from etl_core_spark.operators.text_analysis import (
    extract_url_parts,
    line_dedup,
    lm_score,
    pii_annotate,
)


# ---------------------------------------------------------------- line_dedup

BOILER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [
        (1, f"{BOILER}\nalpha body one\ncommon footer"),
        (2, f"{BOILER}\nbeta body two\ncommon footer"),
        (3, f"{BOILER}\ngamma body three\ncommon footer"),
        (4, f"{BOILER}\ndelta body four"),
        (5, "unique page entirely"),
        (6, f"  {BOILER.upper()}  \nepsilon body"),  # normalized match
        (7, BOILER),  # becomes empty after removal
        (8, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _collect_dedup(df):
    return {
        r["doc_id"]: (r["text_dedup"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in df.collect()
    }


def test_line_dedup_frac_removes_boilerplate(spark, boiler_docs):
    out = _collect_dedup(
        line_dedup(boiler_docs, max_doc_frac=0.5, delimiter="\\n")
    )
    # BOILER appears in 6/8 docs (>0.5), footer in 3/8 (<=0.5): only
    # BOILER drops; original bytes (case, padding) survive on kept lines
    assert out[1] == ("alpha body one\ncommon footer", 2, 1)
    assert out[5] == ("unique page entirely", 1, 0)
    assert out[6] == ("epsilon body", 1, 1)
    assert out[7] == ("", 0, 1)
    assert out[8] == ("", 0, 0)
    assert len(out) == 8  # row-preserving


def test_line_dedup_absolute_path_matches_frac_path(spark, boiler_docs):
    frac = _collect_dedup(
        line_dedup(boiler_docs, max_doc_frac=0.5, delimiter="\\n")
    )
    # 0.5 * 8 docs = 4 -> same threshold as max_doc_freq=4
    absolute = _collect_dedup(
        line_dedup(boiler_docs, max_doc_freq=4, delimiter="\\n")
    )
    assert frac == absolute


def test_line_dedup_threshold_validation(spark, boiler_docs):
    with pytest.raises(OperatorConfigError):
        line_dedup(boiler_docs)
    with pytest.raises(OperatorConfigError):
        line_dedup(boiler_docs, max_doc_frac=0.5, max_doc_freq=3)
    with pytest.raises(OperatorConfigError):
        line_dedup(boiler_docs, max_doc_frac=1.5)


def test_line_dedup_operator_registered(spark, boiler_docs):
    op = get_operator("line_dedup")(max_doc_frac=0.5, delimiter="\\n")
    out = op.apply({"in": boiler_docs})["out"]
    assert _collect_dedup(out)[1][0] == "alpha body one\ncommon footer"


def test_line_dedup_no_normalize_keeps_case_variants(spark, boiler_docs):
    out = _collect_dedup(
        line_dedup(boiler_docs, max_doc_frac=0.5, delimiter="\\n",
                   normalize=False)
    )
    # without normalization the upper-case variant in doc 6 no longer
    # matches the 5 lower-case occurrences: 5/8 docs is still > 0.5,
    # so lower-case BOILER drops but doc 6's variant survives
    assert out[6][0].split("\n")[0].strip() == BOILER.upper()
    assert out[1][0] == "alpha body one\ncommon footer"


# ------------------------------------------------------------------ lm_score

def _lm_reference(score_rows, model_rows, D=0.75):
    """Pure-Python mirror of interpolated absolute discounting."""
    from collections import Counter

    uni, bg, c1, conts = Counter(), Counter(), Counter(), {}
    for _i, text in model_rows:
        toks = text.lower().split()
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            c1[a] += 1
            conts.setdefault(a, set()).add(b)
    T, V = sum(uni.values()), len(uni)

    def p_uni(w):
        return (uni.get(w, 0) + 1) / (T + V)

    out = {}
    for i, text in score_rows:
        toks = text.lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        total = 0.0
        for a, b in pairs:
            if a in c1:
                p = max(bg.get((a, b), 0) - D, 0) / c1[a] + (
                    D * len(conts[a]) / c1[a]
                ) * p_uni(b)
            else:
                p = p_uni(b)
            total += math.log(p)
        out[i] = (len(pairs), round(total / len(pairs), 6))
    return out


def test_lm_score_matches_reference(spark):
    rows = [
        (1, "a b a b"),
        (2, "a b c"),
        (3, "z"),
        (4, "the quick brown fox the quick red fox"),
    ]
    out = {r["doc_id"]: r for r in
           lm_score(spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    want = _lm_reference(rows, rows)
    for i, (nb, score) in want.items():
        assert out[i]["n_bigrams"] == nb
        if score is None:
            assert out[i]["avg_logprob"] is None
        else:
            assert out[i]["avg_logprob"] == pytest.approx(score, abs=2e-6)


def test_lm_score_flags_gibberish_lowest(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "zxq qvw wqz vqx xqv"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ranked = lm_score(docs).orderBy("avg_logprob").collect()
    # discounting charges every singleton transition + rare-word
    # backoff: the gibberish doc must rank strictly lowest
    assert ranked[0]["doc_id"] == 99
    assert ranked[0]["avg_logprob"] < ranked[1]["avg_logprob"]


def test_lm_score_external_model_and_unseen_words(spark):
    model = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)], ["doc_id", "text"]
    )
    score_rows = [(1, "the cat sat"), (2, "quantum flux capacitor")]
    docs = spark.createDataFrame(score_rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lm_score(docs, model_df=model).collect()}
    want = _lm_reference(score_rows, [(i, "the cat sat on the mat") for i in range(5)])
    for i, (nb, score) in want.items():
        assert out[i]["n_bigrams"] == nb
        assert out[i]["avg_logprob"] == pytest.approx(score, abs=2e-6)
    # corpus-typical text scores far above fully-unseen text
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_lm_score_operator_two_ports(spark):
    model = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    docs = spark.createDataFrame([(7, "a b")], ["doc_id", "text"])
    op = get_operator("lm_score")()
    got = op.apply({"in": docs, "model": model})["out"].first()
    assert got["n_bigrams"] == 1 and got["avg_logprob"] is not None
    with pytest.raises(OperatorConfigError):
        op.apply({"model": model})


# ------------------------------------------------------------------ pii_scan

PII_TEXT = (
    "mail me at jo.doe+x@corp.example.com, card 1234-5678-9012-3456, "
    "ssn 123-45-6789, host 10.0.0.1, call +1 (415) 555-0100 now"
)


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame([(1, PII_TEXT), (2, "clean text")], ["id", "t"])
    out = {r["id"]: r for r in pii_annotate(df, "t", redact=True).collect()}
    r = out[1]
    assert r["n_pii_email"] == 1
    assert r["n_pii_credit_card"] == 1
    assert r["n_pii_ssn"] == 1
    assert r["n_pii_ipv4"] == 1
    assert r["n_pii_phone"] >= 1
    assert r["n_pii_total"] == sum(
        r[f"n_pii_{k}"] for k in ("email", "credit_card", "ssn", "ipv4", "phone")
    )
    red = r["t_redacted"]
    for token in ("<EMAIL>", "<CC>", "<SSN>", "<IP>", "<PHONE>"):
        assert token in red, red
    # no digits of any identifier survive redaction
    assert "3456" not in red and "6789" not in red and "0100" not in red
    clean = out[2]
    assert clean["n_pii_total"] == 0 and clean["t_redacted"] == "clean text"


def test_pii_order_card_not_eaten_by_ssn_or_phone(spark):
    df = spark.createDataFrame([(1, "card: 1111 2222 3333 4444.")], ["id", "t"])
    red = pii_annotate(df, "t", redact=True).first()["t_redacted"]
    assert red == "card: <CC>."


def test_pii_scan_operator_kind_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("pii_scan")(kinds=["email", "dna"])


# ----------------------------------------------------------------- url_parts

def test_url_parts_extraction(spark):
    urls = [
        (1, "https://user:pw@www.example.co:8443/a/b?q=1&r=2#frag"),
        (2, "http://example.com"),
        (3, "ftp://files.internal.example.org/pub/x.tar"),
        (4, "not a url at all"),
    ]
    df = spark.createDataFrame(urls, ["id", "url"])
    out = {r["id"]: r for r in extract_url_parts(df, "url").collect()}
    assert out[1]["url_scheme"] == "https"
    assert out[1]["url_host"] == "www.example.co"
    assert out[1]["url_domain"] == "example.co"
    assert out[1]["url_path"] == "/a/b"
    assert out[1]["url_query"] == "q=1&r=2"
    assert out[2]["url_host"] == "example.com"
    assert out[2]["url_domain"] == "example.com"
    assert out[2]["url_path"] is None  # no path segment at all
    assert out[3]["url_scheme"] == "ftp"
    assert out[3]["url_domain"] == "example.org"
    assert out[4]["url_scheme"] is None and out[4]["url_host"] is None


# --------------------------------------------------------------- mix_corpora

@pytest.fixture(scope="module")
def mix_docs(spark):
    # 3 sources x 200 docs x 10 tokens each = 2000 tokens per source
    rows = [
        (s * 1000 + i, f"s{s}", " ".join(f"w{j}" for j in range(10)))
        for s in range(3)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_mix_corpora_hits_weighted_budget(spark, mix_docs):
    out = mix_corpora(
        mix_docs, "doc_id", "source",
        weights={"s0": 0.5, "s1": 0.5}, target_tokens=2000,
    )
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # s2 absent from weights -> dropped entirely
    assert "s2" not in got
    # each kept source targets 1000 of its 2000 tokens -> ~100 docs
    for s in ("s0", "s1"):
        assert 75 <= got[s] <= 125, got


def test_mix_corpora_caps_fraction_at_one(spark, mix_docs):
    out = mix_corpora(
        mix_docs, "doc_id", "source",
        weights={"s0": 1.0}, target_tokens=10_000_000,
    )
    assert out.count() == 200  # downsample only, never upsample


def test_mix_corpora_deterministic_and_stable_under_repartition(spark, mix_docs):
    a = sorted(r["doc_id"] for r in mix_corpora(
        mix_docs, "doc_id", "source", {"s0": 1, "s1": 1}, 2000).collect())
    b = sorted(r["doc_id"] for r in mix_corpora(
        mix_docs.repartition(13), "doc_id", "source",
        {"s0": 1, "s1": 1}, 2000).collect())
    assert a == b and len(a) > 0


def test_mix_corpora_matches_md5_threshold_semantics(spark, mix_docs):
    # the kept set is exactly the md5-bucket predicate at frac = 1000/2000
    out = sorted(r["doc_id"] for r in mix_corpora(
        mix_docs, "doc_id", "source", {"s0": 1.0}, 1000).collect())
    import hashlib

    def bucket(doc_id):
        h = hashlib.md5(f"mix{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16)

    want = sorted(
        d for d in range(0, 1000) if d < 200 and bucket(d) < 0.5 * _HASH_SPACE
    )
    assert out == want


def test_mix_corpora_validation(spark, mix_docs):
    with pytest.raises(OperatorConfigError):
        mix_corpora(mix_docs, "doc_id", "source", {}, 100)
    with pytest.raises(OperatorConfigError):
        mix_corpora(mix_docs, "doc_id", "source", {"s0": -1.0}, 100)
    with pytest.raises(OperatorConfigError):
        mix_corpora(mix_docs, "doc_id", "source", {"s0": 1.0}, 0)


def test_mix_corpora_zero_token_group_kept(spark):
    df = spark.createDataFrame(
        [(1, "a", ""), (2, "a", ""), (3, "b", "x y z")],
        ["id", "g", "text"],
    )
    out = mix_corpora(df, "id", "g", {"a": 1.0, "b": 1.0}, 2)
    kept_a = [r["id"] for r in out.where(F.col("g") == "a").collect()]
    assert sorted(kept_a) == [1, 2]  # nothing to downsample -> all kept


# ----------------------------------------------------------------------- ORC

def test_orc_roundtrip_operators(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)],
        ["id", "name", "score"],
    )
    path = str(tmp_path / "t.orc")
    get_operator("write_orc")(
        filepath=path, compression="zlib", num_files=1
    ).apply({"in": src})
    back = get_operator("read_orc")(filepath=path).read()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    assert back.schema == src.schema
    import glob

    assert len(glob.glob(f"{path}/*.orc")) == 1


def test_orc_partitioned_write(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(20)],
        ["id", "par"],
    )
    path = str(tmp_path / "p.orc")
    get_operator("write_orc")(filepath=path, partition_by=["par"]).apply(
        {"in": src}
    )
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("par=")
    ) == ["par=even", "par=odd"]
    back = get_operator("read_orc")(filepath=path).read()
    assert back.count() == 20


def test_line_dedup_null_text_is_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None), (3, "a\nc")],
        "doc_id long, text string",
    )
    for kw in ({"max_doc_frac": 0.6}, {"max_doc_freq": 1}):
        out = _collect_dedup(line_dedup(df, delimiter="\\n", **kw))
        assert out[2] == ("", 0, 0), (kw, out)
        assert len(out) == 3


# ----------------------------------------------------------- quantile_filter

def test_quantile_filter_exact_top_and_bottom(spark):
    from etl_core_spark.operators.sampling import quantile_filter

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], ["id", "v"])
    top = quantile_filter(df, "v", 0.9, keep="top", exact=True)
    assert sorted(r["id"] for r in top.collect()) == list(range(91, 101))
    bottom = quantile_filter(df, "v", 0.1, keep="bottom", exact=True)
    # exact interpolated p10 of 1..100 is 10.9 -> ids 1..10
    assert sorted(r["id"] for r in bottom.collect()) == list(range(1, 11))


def test_quantile_filter_approx_close_to_exact(spark):
    from etl_core_spark.operators.sampling import quantile_filter

    df = spark.createDataFrame([(i, float(i % 997)) for i in range(5000)], ["id", "v"])
    n_exact = quantile_filter(df, "v", 0.8, exact=True).count()
    n_approx = quantile_filter(df, "v", 0.8, exact=False).count()
    assert abs(n_exact - n_approx) / n_exact < 0.05


def test_quantile_filter_null_scores_dropped_and_validation(spark):
    from etl_core_spark.operators.sampling import quantile_filter

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, v double"
    )
    kept = quantile_filter(df, "v", 0.0, keep="top", exact=True)
    assert sorted(r["id"] for r in kept.collect()) == [1, 3]
    with pytest.raises(OperatorConfigError):
        quantile_filter(df, "v", 1.5)
    with pytest.raises(OperatorConfigError):
        quantile_filter(df, "v", 0.5, keep="middle")


def test_quantile_filter_operator_registered(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["id", "v"])
    op = get_operator("quantile_filter")(value_col="v", q=0.5, exact=True)
    assert op.apply({"in": df})["out"].count() == 5


# -------------------------------------------- plan shapes & streaming compose

def test_line_dedup_frac_mode_rewrite_is_narrow(spark, boiler_docs):
    """The 100 TB claim, plan-asserted: fractional-threshold mode
    rewrites documents via a one-row broadcast + per-row array filter
    — no window, no sort-merge join, no per-doc reassembly shuffle."""
    plan = (
        line_dedup(boiler_docs, max_doc_frac=0.5, delimiter="\\n")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan  # the one-row hot set
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_pii_scan_and_url_parts_compose_with_streaming(spark, tmp_path):
    """pii_scan / url_parts are pure narrow maps, so they must apply
    unchanged to a streaming DataFrame (operators are plan rewrites,
    not actions)."""
    src = tmp_path / "pii_stream_src"
    spark.createDataFrame(
        [(1, "mail a@b.com visit https://www.ex.example.com/x")],
        ["id", "t"],
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    annotated = pii_annotate(stream, "t", redact=True)
    assert annotated.isStreaming
    out = extract_url_parts(annotated, "t", prefix="u_")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pii_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    row = spark.sql("SELECT * FROM pii_stream_t").first()
    assert row["n_pii_email"] == 1 and "<EMAIL>" in row["t_redacted"]


# ------------------------------------------------------ strip_duplicate_spans

SPAN = "one two three four five six seven eight"


def test_strip_duplicate_spans_cross_doc(spark):
    from etl_core_spark.operators.text_analysis import strip_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, f"intro {SPAN} tailA"),
            (2, f"other {SPAN} tailB"),
            (3, "a completely unique document body here"),
            (4, "tiny"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(docs, span_tokens=4).collect()}
    # the shared 8-token span is covered in both docs; boundary grams
    # (spanning intro/tail) occur once and cover nothing
    assert out[1]["text_dedup"] == "intro tailA"
    assert out[2]["text_dedup"] == "other tailB"
    assert out[1]["n_tokens_dropped"] == 8 and out[1]["n_tokens_kept"] == 2
    assert out[3]["text_dedup"] == "a completely unique document body here"
    assert out[3]["dup_span_frac"] == 0.0
    # shorter than one span: no grams, fully kept
    assert out[4] ["text_dedup"] == "tiny" and out[4]["n_tokens_dropped"] == 0
    assert len(out) == 4  # row-preserving


def test_strip_duplicate_spans_within_doc_repeat(spark):
    from etl_core_spark.operators.text_analysis import strip_duplicate_spans

    docs = spark.createDataFrame(
        [(1, f"{SPAN} {SPAN}"), (2, "unrelated words entirely different here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(docs, span_tokens=4).collect()}
    # a span repeated WITHIN one doc counts (Lee et al. semantics):
    # every token of both occurrences is covered
    assert out[1]["text_dedup"] == "" and out[1]["dup_span_frac"] == 1.0
    assert out[2]["n_tokens_dropped"] == 0


def test_strip_duplicate_spans_validation(spark):
    from etl_core_spark.operators.text_analysis import strip_duplicate_spans

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(OperatorConfigError):
        strip_duplicate_spans(df, span_tokens=1)
    with pytest.raises(OperatorConfigError):
        strip_duplicate_spans(df, min_count=1)


# --------------------------------------------------------------- assemble_docs

def test_assemble_docs_ordered_concat(spark):
    from etl_core_spark.operators.text_analysis import assemble_docs

    parts = spark.createDataFrame(
        [
            (1, 2, "world"),
            (1, 1, "hello"),
            (2, 1, "solo"),
            (2, 2, None),  # NULL part skipped
        ],
        "key long, ord long, part string",
    )
    out = {r["key"]: r for r in
           assemble_docs(parts, "key", "part", "ord", sep=" ").collect()}
    assert out[1]["part_doc"] == "hello world" and out[1]["n_parts"] == 2
    assert out[2]["part_doc"] == "solo" and out[2]["n_parts"] == 1


def test_assemble_docs_inverts_chunking(spark, tables):
    """assemble(chunk(docs)) round-trips the whitespace-normalized
    text — chunk boundaries are pure token arithmetic, so zero-overlap
    chunking partitions the token stream exactly."""
    from etl_core_spark.operators.text_analysis import assemble_docs, chunk_documents

    docs = tables["documents"].limit(200)
    chunks = chunk_documents(docs, "text", "doc_id", chunk_tokens=16, overlap=0)
    back = assemble_docs(chunks, "doc_id", "chunk_text", "chunk_idx", sep=" ")
    from etl_core_spark.functions.text import tokens

    want = docs.select(
        "doc_id", F.array_join(tokens(F.col("text")), " ").alias("norm")
    )
    diff = (
        back.join(want, on="doc_id")
        .where(F.col("chunk_text_doc") != F.col("norm"))
        .count()
    )
    assert diff == 0


# ------------------------------------------------- review-fix regression pins

def test_lm_score_survives_empty_and_whitespace_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert len(out) == 4
    for i in (2, 3, 4):
        assert out[i]["n_bigrams"] == 0 and out[i]["avg_logprob"] is None
    assert out[1]["n_bigrams"] == 2


def test_line_dedup_absolute_mode_null_ids_not_wiped(spark):
    df = spark.createDataFrame(
        [
            (None, "boiler\nunique gamma text"),
            (None, "boiler\nother delta body"),
            (7, "boiler\nnormal row"),
        ],
        "doc_id long, text string",
    )
    out = [
        (r["doc_id"], r["text_dedup"], r["n_lines_kept"])
        for r in line_dedup(df, max_doc_freq=2, delimiter="\\n").collect()
    ]
    # NULL-id docs keep their own (distinct) kept lines — neither
    # wiped to '' nor merged with each other
    texts = sorted(t for i, t, k in out if i is None)
    assert texts == ["other delta body", "unique gamma text"]
    assert all(k == 1 for i, t, k in out)


def test_strip_duplicate_spans_null_text_is_empty_doc(spark):
    from etl_core_spark.operators.text_analysis import strip_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, span_tokens=4).collect()}
    assert out[2]["text_dedup"] == ""
    assert out[2]["n_tokens_kept"] == 0 and out[2]["n_tokens_dropped"] == 0
    assert out[2]["dup_span_frac"] == 0.0


def test_quantile_filter_quoted_column_name(spark):
    from etl_core_spark.operators.sampling import quantile_filter

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], ["id", "lm score"]
    )
    assert quantile_filter(df, "lm score", 0.5, exact=True).count() == 5
    assert quantile_filter(df, "lm score", 0.5, exact=False).count() >= 4


# --------------------------------------- weighted_sample / take_tokens_per_group

def test_weighted_sample_extremes_and_determinism(spark):
    from etl_core_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)]
        + [(200 + i, 0.0) for i in range(50)]
        + [(300, None), (301, -2.0)],
        "id long, w double",
    )
    kept = sorted(r["id"] for r in weighted_sample(df, "id", "w").collect())
    # weight 1 -> always kept; weight 0 / NULL / negative -> dropped
    assert kept == list(range(100))
    again = sorted(r["id"] for r in
                   weighted_sample(df.repartition(7), "id", "w").collect())
    assert kept == again


def test_weighted_sample_proportional(spark):
    from etl_core_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 0.2) for i in range(1000)] + [(2000 + i, 0.8) for i in range(1000)],
        "id long, w double",
    )
    out = weighted_sample(df, "id", "w")
    lo = out.where(F.col("w") == 0.2).count()
    hi = out.where(F.col("w") == 0.8).count()
    assert 140 <= lo <= 260 and 720 <= hi <= 880


def test_take_tokens_per_group_best_first_prefix(spark):
    from etl_core_spark.operators.sampling import take_tokens_per_group

    rows = [
        # group a: scores 5,4,3 with 4 tokens each; budget 8 -> top 2
        (1, "a", 5.0, "w x y z"),
        (2, "a", 4.0, "w x y z"),
        (3, "a", 3.0, "w x y z"),
        # group b: first (best) doc alone overflows budget -> empty
        (4, "b", 9.0, " ".join(["t"] * 20)),
        (5, "b", 1.0, "small doc"),
    ]
    df = spark.createDataFrame(rows, ["id", "g", "score", "text"])
    out = sorted(
        r["id"]
        for r in take_tokens_per_group(
            df, "g", 8, "id", order_col="score"
        ).collect()
    )
    assert out == [1, 2]  # clean prefix; overflowing group-b head blocks its tail


def test_take_tokens_per_group_token_col_and_determinism(spark):
    from etl_core_spark.operators.sampling import take_tokens_per_group

    df = spark.createDataFrame(
        [(i, "g", 10) for i in range(100)], ["id", "g", "ntok"]
    )
    a = sorted(r["id"] for r in take_tokens_per_group(
        df, "g", 250, "id", token_col="ntok").collect())
    b = sorted(r["id"] for r in take_tokens_per_group(
        df.repartition(9), "g", 250, "id", token_col="ntok").collect())
    assert a == b and len(a) == 25
    with pytest.raises(OperatorConfigError):
        take_tokens_per_group(df, "g", 0, "id")


def test_gopher_metrics_hand_computed(spark):
    from etl_core_spark.operators.base import get_operator

    rows = [
        # 4 lines: 2 bullets, 1 ellipsis-terminated, 1 plain
        (0, "- item one\n* item two\nwait for it...\nplain line here"),
        # symbol-heavy: 2 hashes + one '...' over 5 tokens
        # (the '...' is itself a whitespace token)
        (1, "ok ## then ... four"),
        (2, ""),        # empty
        (3, None),      # NULL
        (4, "12 34 56"),  # numeric-only tokens -> alpha_frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = get_operator("text_analysis")(
        metrics=("alpha_token_frac", "bullet_line_frac",
                 "ellipsis_line_frac", "symbol_token_ratio",
                 "gopher_rules_pass"),
    ).apply({"in": df})["out"]
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["bullet_line_frac"] == pytest.approx(0.5)
    assert got[0]["ellipsis_line_frac"] == pytest.approx(0.25)
    assert got[0]["alpha_token_frac"] == pytest.approx(10 / 12)
    # doc 1: '##' = 2 hash chars, one literal '...' = 1; 5 tokens
    assert got[1]["symbol_token_ratio"] == pytest.approx(3 / 5)
    assert got[2]["alpha_token_frac"] == 0.0
    assert got[2]["gopher_rules_pass"] is False
    assert got[3]["symbol_token_ratio"] == 0.0
    assert got[3]["gopher_rules_pass"] is False
    assert got[4]["alpha_token_frac"] == 0.0


def test_gopher_rules_pass_thresholds(spark):
    """A healthy 60-token English-like doc passes; the same doc at 10
    tokens fails the min-length gate; a symbol-stuffed one fails the
    symbol gate. Thresholds are the published Gopher A1.1 values."""
    from etl_core_spark.functions.text import (
        GOPHER_MIN_TOKENS,
        gopher_rules_pass,
    )
    from pyspark.sql import functions as F

    good = " ".join(f"word{i}" for i in range(60))
    short = " ".join(f"word{i}" for i in range(10))
    symbols = " ".join("w#" for _ in range(60))
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols)], "id long, text string"
    )
    got = {
        r["id"]: r["p"]
        for r in df.select(
            "id", gopher_rules_pass(F.col("text")).alias("p")
        ).collect()
    }
    assert GOPHER_MIN_TOKENS == 50
    assert got[0] is True
    assert got[1] is False
    assert got[2] is False


def test_corpus_overlap_hand_computed(spark):
    from etl_core_spark.operators.base import get_operator

    rows = [
        (1, "a", "alpha beta gamma delta"),   # shingles: ab g, b g d -> n=2
        (2, "a", "alpha beta gamma"),          # duplicate shingle within a
        (3, "b", "alpha beta gamma epsilon"),
        (4, None, "zeta eta theta"),           # NULL group = own slice
        (5, "c", ""),                          # empty doc: contributes none
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = get_operator("corpus_overlap")(shingle_n=3).apply({"in": df})["out"]
    got = {(r["group_a"], r["group_b"]): r for r in out.collect()}
    # a: {"alpha beta gamma", "beta gamma delta"}; b: {"alpha beta
    # gamma", "beta gamma epsilon"}; intersection 1, union 3
    r = got[("a", "b")]
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 2, 1)
    assert r["jaccard"] == pytest.approx(1 / 3)
    # NULL slice appears under the sentinel with zero overlap pairs
    assert not any("__null__" in k for k in got), got.keys()


def test_entropy_metrics_matches_pure_python(spark):
    """Char/token Shannon entropy vs an independently computed
    reference (Counter + math.log) with the operator's exact
    arrangement H = ln(n) - sum(c*ln c)/n and 6dp floors."""
    import math
    from collections import Counter

    from etl_core_spark.operators.base import get_operator

    rows = [
        (1, "aaaa"),                      # zero char entropy
        (2, "ab ab ab"),                  # repeated token
        (3, "the quick brown fox"),       # natural-ish
        (4, ""),                          # empty -> NULL entropies
        (5, None),                        # NULL text
        (6, "AbBa"),                      # lowercase folding
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = get_operator("entropy_metrics")().apply({"in": df})["out"]
    got = {
        r["doc_id"]: (
            r["distinct_chars"], r["char_entropy"],
            r["distinct_tokens"], r["token_entropy"],
        )
        for r in out.collect()
    }

    def h(counter):
        n = sum(counter.values())
        if n == 0:
            return None
        v = math.log(n) - sum(c * math.log(c) for c in counter.values()) / n
        return math.floor(v * 1e6) / 1e6

    for i, t in rows:
        if not t or not t.strip():
            assert got[i] == (0, None, 0, None), i
            continue
        tt = t.strip().lower()
        ch = Counter(tt)
        tk = Counter(tt.split())
        assert got[i] == (len(ch), h(ch), len(tk), h(tk)), i
    # monotone sanity: uniform text has zero char entropy
    assert got[1][1] == 0.0
    # 'ab ab ab' has one distinct token -> zero token entropy
    assert got[2][3] == 0.0


def test_corpus_divergence_matches_pure_python(spark):
    """Pairwise JS divergence vs a direct full-union reference
    (explicit M=(P+Q)/2, no exclusive-mass shortcut) — proves the
    shared-vocab + ln2-closure identity the operator uses, and pins
    the disjoint-pair (exactly ln 2) and identical-pair (exactly 0)
    poles."""
    import math
    from collections import Counter

    from etl_core_spark.operators.base import get_operator

    rows = [
        (1, "a", "x y x z"),
        (2, "a", "x y"),
        (3, "b", "x x x y y z"),    # b == a distribution-wise (3:2:1)
        (4, "c", "p q p q r"),      # c disjoint from a and b
        (5, "d", "x p"),            # d overlaps both worlds
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = get_operator("corpus_divergence")().apply({"in": df})["out"]
    got = {
        (r["group_a"], r["group_b"]): (r["js_divergence"], r["shared_tokens"])
        for r in out.collect()
    }

    dists = {}
    for _i, g, t in rows:
        dists.setdefault(g, Counter()).update(t.split())

    def js(ca, cb):
        na, nb = sum(ca.values()), sum(cb.values())
        vocab = set(ca) | set(cb)
        v = 0.0
        for w in vocab:
            p, q = ca.get(w, 0) / na, cb.get(w, 0) / nb
            m = (p + q) / 2
            if p:
                v += 0.5 * p * math.log(p / m)
            if q:
                v += 0.5 * q * math.log(q / m)
        return v

    groups = sorted(dists)
    assert set(got) == {
        (x, y) for i, x in enumerate(groups) for y in groups[i + 1:]
    }
    for (x, y), (jsv, sh) in got.items():
        ref = js(dists[x], dists[y])
        assert jsv == pytest.approx(math.floor(ref * 1e6) / 1e6, abs=2e-6), (x, y)
        assert sh == len(set(dists[x]) & set(dists[y]))
    # poles: identical distributions -> 0; disjoint -> exactly ln 2
    assert got[("a", "b")][0] == 0.0
    assert got[("a", "c")][0] == math.floor(math.log(2) * 1e6) / 1e6


# ---------------------------------------------------------------- feature_hash


def test_feature_hash_matches_python_reference(spark):
    import hashlib
    import re

    def hb(s, salt=""):
        return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)

    rows = [
        (1, "the cat sat on the mat"),
        (2, "  Weighted   spaces\tand TABS  "),
        (3, ""),          # no tokens -> no rows
        (4, "dup dup dup"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = get_operator("feature_hash")(
        id_col="doc_id", text_col="text", dim=32
    ).apply({"in": df})["out"]
    got = {(r["doc_id"], r["idx"]): r["weight"] for r in out.collect()}
    ref: dict = {}
    for did, text in rows:
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        for t in toks:
            idx = hb(t) % 32
            s = 1 if hb(t, "#sign") % 2 == 0 else -1
            ref[(did, idx)] = ref.get((did, idx), 0) + s
    assert got == ref
    assert not any(d == 3 for d, _ in got)


def test_feature_hash_unsigned_counts_and_dim_bound(spark):
    df = spark.createDataFrame(
        [(1, "a b a c a")], "doc_id long, text string"
    )
    out = get_operator("feature_hash")(
        id_col="doc_id", text_col="text", dim=8, signed=False
    ).apply({"in": df})["out"]
    rows = out.collect()
    assert sum(r["weight"] for r in rows) == 5  # plain tf sums
    assert all(0 <= r["idx"] < 8 for r in rows)
    assert all(r["weight"] > 0 for r in rows)


def test_feature_hash_deterministic_and_validation(spark):
    import pytest

    from etl_core_spark.operators.base import OperatorConfigError

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} shared") for i in range(20)],
        "doc_id long, text string",
    )
    op = get_operator("feature_hash")(id_col="doc_id", text_col="text",
                                      dim=16)
    a = sorted(map(tuple, op.apply({"in": df})["out"].collect()))
    b = sorted(map(tuple, op.apply({"in": df})["out"].collect()))
    assert a == b
    with pytest.raises(OperatorConfigError):
        get_operator("feature_hash")(id_col="doc_id", text_col="text",
                                     dim=1).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("feature_hash")(text_col="text").validate_config()
