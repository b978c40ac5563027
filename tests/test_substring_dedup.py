"""Cross-document exact-substring dedup (operators/substring.py) —
pure-Python differential on a hand-built dirty corpus, span-merge
semantics, keep-one canonical policy, and registry contracts."""

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.substring import (
    substring_dedup,
    substring_dup_spans,
)

BOILER = "this software is provided as is without warranty of any kind"
# doc 1/2 share BOILER verbatim; doc 3 shares a different overlap with
# doc 1; doc 4 repeats a phrase WITHIN itself only (must NOT trigger);
# doc 5 is unique; doc 6 is empty.
CORPUS = [
    (1, f"intro text {BOILER} and some unique tail one"),
    (2, f"completely different head {BOILER} closing words"),
    (3, "intro text this software is provided as is unique middle bit"),
    (4, "repeat me now again repeat me now again repeat me now again x"),
    (5, "nothing here matches anything else in the corpus at all"),
    (6, ""),
]
K = 5  # span_tokens for tests (docs are short)


def _toks(t):
    return t.strip().split() if t.strip() else []


def _py_spans(corpus, k=K, min_docs=2):
    """Reference implementation: maximal cross-doc duplicated spans."""
    grams = {}
    for did, t in corpus:
        toks = _toks(t)
        for s in range(len(toks) - k + 1):
            g = " ".join(toks[s : s + k])
            grams.setdefault(g, []).append((did, s))
    dup = {g for g, hs in grams.items() if len({d for d, _ in hs}) >= min_docs}
    hits = {}
    for g in dup:
        for did, s in grams[g]:
            hits.setdefault(did, set()).add(s)
    out = []
    for did, ss in hits.items():
        ss = sorted(ss)
        start, end, n = ss[0], ss[0] + k, 1
        for s in ss[1:]:
            if s <= end:  # contiguous coverage
                end, n = s + k, n + 1
            else:
                out.append((did, start, end, end - start, n))
                start, end, n = s, s + k, 1
        out.append((did, start, end, end - start, n))
    return sorted(out)


def _df(spark, corpus=CORPUS):
    return spark.createDataFrame(corpus, "doc_id long, text string")


def test_spans_match_pure_python(spark):
    got = sorted(
        tuple(r)
        for r in substring_dup_spans(
            _df(spark), span_tokens=K
        ).collect()
    )
    assert got == _py_spans(CORPUS)
    # the within-document-only repeater and unique/empty docs emit none
    assert {r[0] for r in got} == {1, 2, 3}


def test_spans_islands_merge_long_shared_run(spark):
    """A shared 11-token run must come back as ONE maximal span
    covering all 11 tokens, not 7 length-5 gram hits."""
    shared = "a b c d e f g h i j k"
    df = _df(
        spark,
        [(1, f"x y {shared} tail"), (2, f"{shared} other end")],
    )
    rows = {
        r["doc_id"]: r
        for r in substring_dup_spans(df, span_tokens=K).collect()
    }
    assert rows[1]["span_start"] == 2 and rows[1]["span_len"] == 11
    assert rows[2]["span_start"] == 0 and rows[2]["span_len"] == 11
    assert rows[1]["n_grams"] == 7  # 11 - 5 + 1


def test_dedup_keep_one_preserves_exactly_one_copy(spark):
    out = {
        r["doc_id"]: r
        for r in substring_dedup(_df(spark), span_tokens=K).collect()
    }
    assert len(out) == 6  # row-preserving
    # canonical owner = smallest (doc, start): doc 1 keeps its copy
    assert BOILER in out[1]["text_dedup"]
    assert BOILER not in out[2]["text_dedup"]
    # exactly one corpus copy of the boilerplate survives
    survivors = sum(BOILER in out[d]["text_dedup"] for d in out)
    assert survivors == 1
    # untouched docs keep every token (text normalized to single spaces)
    for did in (4, 5):
        assert out[did]["n_tokens_dropped"] == 0
        assert out[did]["text_dedup"] == " ".join(
            _toks(dict(CORPUS)[did])
        )
    assert out[6]["text_dedup"] == "" and out[6]["dup_span_frac"] == 0.0


def test_dedup_keep_one_false_strips_all_copies(spark):
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in substring_dedup(
            _df(spark), span_tokens=K, keep_one=False
        ).collect()
    }
    assert BOILER not in out[1] and BOILER not in out[2]


def test_dedup_counters_consistent(spark):
    for r in substring_dedup(_df(spark), span_tokens=K).collect():
        n = len(_toks(dict(CORPUS)[r["doc_id"]]))
        assert r["n_tokens_kept"] + r["n_tokens_dropped"] == n
        if n:
            assert r["dup_span_frac"] == pytest.approx(
                r["n_tokens_dropped"] / n, abs=1e-6
            )


def test_max_doc_freq_excludes_hot_grams(spark):
    """With the stopword cap below the boilerplate's doc frequency,
    the shared run stops counting as duplicated."""
    df = _df(
        spark,
        [(i, f"hot shared boiler plate line {i}") for i in range(1, 6)],
    )
    assert (
        substring_dup_spans(df, span_tokens=5, max_doc_freq=3).count() == 0
    )
    assert substring_dup_spans(df, span_tokens=5).count() == 5


def test_registry_and_validation(spark):
    df = _df(spark)
    out = get_operator("substring_dup_spans")(span_tokens=K).apply(
        {"in": df}
    )["out"]
    assert set(out.columns) == {
        "doc_id",
        "span_start",
        "span_end",
        "span_len",
        "n_grams",
    }
    out2 = get_operator("substring_dedup")(
        span_tokens=K, keep_one=False
    ).apply({"in": df})["out"]
    assert "text_dedup" in out2.columns and out2.count() == 6
    with pytest.raises(OperatorConfigError):
        substring_dup_spans(df, span_tokens=1)
    with pytest.raises(OperatorConfigError):
        substring_dedup(df, min_docs=1)
