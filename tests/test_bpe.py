"""BPE tokenizer (operators/bpe.py) — independent pure-Python
reference differential on train AND encode, plus the contracts a
token-budget consumer relies on."""

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator

EOW = "▁"


def _ref_train(word_counts, num_merges):
    """Textbook BPE training (Sennrich et al. 2016 fig. 1 shape),
    written independently of the operator: dict-of-tuples vocab,
    most-frequent pair per round, lexicographic tie-break."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def _ref_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "low new low new lower"),
    (4, ""),
]


def test_bpe_train_matches_reference(spark):
    from etl_core_spark.operators.bpe import bpe_train_merges

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wc = {}
    for _i, t in CORPUS:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    got = bpe_train_merges(df, num_merges=20)
    ref = _ref_train(wc, 20)
    assert got == ref
    # the dominant word's full merge chain is learned first-ish:
    # 'low' + EOW must become a single symbol within the budget
    joined = {a + b for a, b in got}
    assert "low" + EOW in joined or "low" in joined


def test_bpe_encode_matches_reference_and_counts(spark):
    from etl_core_spark.operators.bpe import bpe_tokenize, bpe_train_merges

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train_merges(df, num_merges=15)
    out = bpe_tokenize(df, num_merges=15, emit_tokens=True)
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_tokens"]) for r in out.collect()}
    for i, t in CORPUS:
        toks = []
        for w in t.lower().split():
            toks.extend(_ref_encode(w, merges))
        assert got[i] == (len(toks), " ".join(toks)), i
    # empty doc: 0 tokens, empty string — never NULL-poisoned
    assert got[4] == (0, "")


def test_bpe_more_merges_never_increase_token_count(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    counts = {}
    for nm in (1, 5, 30):
        out = get_operator("bpe_tokenize")(num_merges=nm).apply({"in": df})[
            "out"
        ]
        counts[nm] = {r["doc_id"]: r["n_bpe_tokens"] for r in out.collect()}
    for i, _ in CORPUS:
        assert counts[1][i] >= counts[5][i] >= counts[30][i]


def test_bpe_train_port_and_determinism(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    train = spark.createDataFrame(
        [(9, "zap zap zap zap")], "doc_id long, text string"
    )
    op = get_operator("bpe_tokenize")(num_merges=5, emit_tokens=True)
    out = op.apply({"in": df, "train": train})["out"]
    toks = {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}
    # merges trained on 'zap' do not merge 'low' — it stays chars
    assert toks[1].split()[:4] == ["l", "o", "w", EOW]
    a = op.apply({"in": df, "train": train})["out"].collect()
    b = op.apply({"in": df, "train": train})["out"].collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(OperatorConfigError):
        get_operator("bpe_tokenize")(num_merges=0)


def test_bpe_pinned_merges_skip_training(spark):
    """A pinned merge table bypasses training and encodes exactly as
    bpe_encode with the same list (the frozen-tokenizer shape)."""
    from etl_core_spark.operators.base import OperatorConfigError, get_operator
    from etl_core_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "lower power tower"), (2, ""), (3, "owl owl")],
        "doc_id long, text string",
    )
    merges = [("o", "w"), ("e", "r"), ("er", "▁"), ("ow", "er▁")]
    via_op = get_operator("bpe_tokenize")(
        merges=merges, emit_tokens=True
    ).apply({"in": df})["out"]
    direct = bpe_encode(df, merges, emit_tokens=True)
    assert sorted(map(tuple, via_op.collect())) == sorted(
        map(tuple, direct.collect())
    )
    got = {r["doc_id"]: r for r in via_op.collect()}
    # 'lower' -> l ower▁ ; 'power' -> p ower▁ ; 'tower' -> t ower▁
    assert got[1]["bpe_tokens"] == "l ower▁ p ower▁ t ower▁"
    assert got[1]["n_bpe_tokens"] == 6
    assert got[2]["n_bpe_tokens"] == 0 and got[2]["bpe_tokens"] == ""
    import pytest as _pytest

    with _pytest.raises(OperatorConfigError):
        get_operator("bpe_tokenize")(merges=[["a"]]).apply({"in": df})
