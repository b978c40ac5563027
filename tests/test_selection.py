"""DSIR importance resampling (operators/selection.py) — pure-Python
differential on the exact arithmetic, plus behavioral and registry
contracts."""

import hashlib
import math

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator

B = 64  # small bucket count so collisions actually happen in-test


def _bucket(f: str, b: int = B) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % b


def _feats(text: str):
    toks = text.strip().lower().split()
    toks = [t for t in toks if t] if text.strip() else []
    out = [f"u:{w}" for w in toks]
    out += [f"b:{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _py_dsir(raw, target, b=B, alpha=1.0):
    """raw/target: list[(id, text)] -> {id: (nf, log_weight)}"""
    ct: dict = {}
    cr: dict = {}
    for _i, t in target:
        for f in _feats(t):
            k = _bucket(f, b)
            ct[k] = ct.get(k, 0) + 1
    for _i, t in raw:
        for f in _feats(t):
            k = _bucket(f, b)
            cr[k] = cr.get(k, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for i, t in raw:
        fs = _feats(t)
        if not fs:
            out[i] = (0, None)
            continue
        lw = 0.0
        tf: dict = {}
        for f in fs:
            k = _bucket(f, b)
            tf[k] = tf.get(k, 0) + 1
        for k, n in tf.items():
            lr = math.log((ct.get(k, 0) + alpha) / (tt + alpha * b)) - math.log(
                (cr.get(k, 0) + alpha) / (tr + alpha * b)
            )
            lw += n * lr
        out[i] = (len(fs), math.floor(lw * 1e6) / 1e6)
    return out


RAW = [
    (1, "the cat sat on the mat"),
    (2, "quantum flux capacitor array"),
    (3, "the dog sat on the rug"),
    (4, "cat mat cat mat cat"),
    (5, ""),
    (6, "flux array quantum quantum"),
]
TARGET = [(100, "the cat sat quietly"), (101, "a cat on a mat")]


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_matches_pure_python(spark):
    out = get_operator("dsir_weights")(num_buckets=B).apply(
        {"in": _spark_df(spark, RAW), "target": _spark_df(spark, TARGET)}
    )["out"]
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"]) for r in out.collect()
    }
    ref = _py_dsir(RAW, TARGET)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0], k
        if ref[k][1] is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(ref[k][1], abs=2e-6), k


def test_dsir_weights_rank_cat_docs_over_offtopic(spark):
    """Docs sharing the target's vocabulary must outweigh off-topic
    docs — normalized per feature so length doesn't dominate."""
    out = get_operator("dsir_weights")(num_buckets=4096).apply(
        {"in": _spark_df(spark, RAW), "target": _spark_df(spark, TARGET)}
    )["out"]
    got = {r["doc_id"]: r for r in out.collect()}
    per_feat = {
        k: got[k]["log_weight"] / got[k]["n_features"]
        for k in (1, 2, 4, 6)
    }
    # cat/mat docs (1, 4) beat quantum-flux docs (2, 6)
    assert min(per_feat[1], per_feat[4]) > max(per_feat[2], per_feat[6])


def test_dsir_select_deterministic_topk_and_salt_sensitivity(spark):
    raw = _spark_df(spark, RAW)
    tgt = _spark_df(spark, TARGET)
    sel = lambda **kw: [  # noqa: E731
        r["doc_id"]
        for r in get_operator("dsir_select")(k=3, num_buckets=B, **kw)
        .apply({"in": raw, "target": tgt})["out"]
        .collect()
    ]
    a, b_run = sel(), sel()
    assert a == b_run and len(a) == 3  # pure function of (corpus, salt)
    assert 5 not in a  # featureless doc never enters the draw
    # a different salt redraws the Gumbel noise (usually a different
    # set/order; at minimum it's still deterministic)
    c1, c2 = sel(salt="s1"), sel(salt="s1")
    assert c1 == c2


def _py_nb(docs, pos, neg, b=B, alpha=1.0):
    cp: dict = {}
    cn: dict = {}
    for _i, t in pos:
        for f in _feats(t):
            k = _bucket(f, b)
            cp[k] = cp.get(k, 0) + 1
    for _i, t in neg:
        for f in _feats(t):
            k = _bucket(f, b)
            cn[k] = cn.get(k, 0) + 1
    tp, tn = sum(cp.values()), sum(cn.values())
    prior = math.log(len(pos) / len(neg))
    out = {}
    for i, t in docs:
        fs = _feats(t)
        if not fs:
            out[i] = (0, None, None)
            continue
        lo = prior
        tf: dict = {}
        for f in fs:
            k = _bucket(f, b)
            tf[k] = tf.get(k, 0) + 1
        s = 0.0
        for k, n in tf.items():
            s += n * (
                math.log((cp.get(k, 0) + alpha) / (tp + alpha * b))
                - math.log((cn.get(k, 0) + alpha) / (tn + alpha * b))
            )
        lo = s + prior
        sc = 1.0 / (1.0 + math.exp(-lo))
        out[i] = (
            len(fs),
            math.floor(lo * 1e6) / 1e6,
            math.floor(sc * 1e6) / 1e6,
        )
    return out


POS = [(200, "the cat sat quietly"), (201, "a cat on a mat")]
NEG = [(300, "quantum flux capacitor"), (301, "flux array quantum")]


def test_quality_classifier_matches_pure_python(spark):
    out = get_operator("quality_classifier")(num_buckets=B).apply(
        {
            "in": _spark_df(spark, RAW),
            "positive": _spark_df(spark, POS),
            "negative": _spark_df(spark, NEG),
        }
    )["out"]
    got = {
        r["doc_id"]: (r["n_features"], r["log_odds"], r["score"])
        for r in out.collect()
    }
    ref = _py_nb(RAW, POS, NEG)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0]
        if ref[k][1] is None:
            assert got[k][1] is None and got[k][2] is None
        else:
            assert got[k][1] == pytest.approx(ref[k][1], abs=2e-6), k
            assert got[k][2] == pytest.approx(ref[k][2], abs=2e-6), k
    # cat-like docs outscore quantum-like docs (absolute 0.5 cuts
    # are unreliable at B=64 — bucket collisions shift mass; the
    # ORDER is the classifier contract)
    assert min(got[1][2], got[4][2]) > max(got[2][2], got[6][2])
    assert got[1][2] > 0.5  # clearly in-domain doc classifies positive


def test_quality_gate_soft_threshold(spark):
    """The Pareto gate keeps high scorers (score→1 ⇒ survival unless
    the draw is ~0, probability ~(1-s)^alpha) and is deterministic."""
    run = lambda: {  # noqa: E731
        r["doc_id"]
        for r in get_operator("quality_gate")(num_buckets=B)
        .apply(
            {
                "in": _spark_df(spark, RAW),
                "positive": _spark_df(spark, POS),
                "negative": _spark_df(spark, NEG),
            }
        )["out"]
        .collect()
    }
    a, b_ = run(), run()
    assert a == b_
    assert 5 not in a  # featureless doc dropped
    assert a <= {1, 2, 3, 4, 6}


def test_dsir_validation(spark):
    raw = _spark_df(spark, RAW)
    tgt = _spark_df(spark, TARGET)
    with pytest.raises(OperatorConfigError):
        get_operator("dsir_select")()  # k required
    with pytest.raises(OperatorConfigError):
        get_operator("dsir_weights")(num_buckets=1).apply(
            {"in": raw, "target": tgt}
        )
    with pytest.raises(OperatorConfigError):
        get_operator("dsir_weights")(alpha=0).apply(
            {"in": raw, "target": tgt}
        )
    with pytest.raises(OperatorConfigError):
        get_operator("dsir_weights")().apply({"in": raw})


def test_selection_empty_corpus_raises_loudly(spark):
    """ADVICE r9: an empty (or all-empty-text) target/positive/negative
    corpus must raise OperatorConfigError, not silently produce
    all-NULL weights/scores that starve dsir_select / quality_gate."""
    raw = _spark_df(spark, RAW)
    tgt = _spark_df(spark, TARGET)
    empty = spark.createDataFrame([], "doc_id long, text string")
    blank = _spark_df(spark, [(1, "   ")])  # rows but zero features
    from etl_core_spark.operators.selection import (
        dsir_select,
        dsir_weights,
        nb_quality_gate,
        nb_quality_score,
    )

    for bad in (empty, blank):
        with pytest.raises(OperatorConfigError, match="target corpus"):
            dsir_weights(raw, bad, num_buckets=B)
        with pytest.raises(OperatorConfigError, match="target corpus"):
            dsir_select(raw, bad, k=2, num_buckets=B)
        with pytest.raises(OperatorConfigError, match="positive corpus"):
            nb_quality_score(raw, bad, tgt, num_buckets=B)
        with pytest.raises(OperatorConfigError, match="negative corpus"):
            nb_quality_gate(raw, tgt, bad, num_buckets=B)
    # empty RAW side of dsir also raises (nothing to weight)
    with pytest.raises(OperatorConfigError, match="raw corpus"):
        dsir_weights(empty, tgt, num_buckets=B)
