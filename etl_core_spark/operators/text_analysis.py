"""Text analysis operator (beyond-reference): language ID, quality
scoring, token counting, fingerprinting — the cheap single-pass
document metrics a training-data pipeline runs before dedup/filter.

All metrics are codegen'd column expressions (functions/text.py);
one narrow map over the documents table, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.functions import text as X
from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator

AVAILABLE_METRICS = (
    "n_chars",
    "n_tokens",
    "n_tokens_bpe",
    "punct_ratio",
    "stopword_ratio",
    "mean_token_length",
    "quality_score",
    "lang_pred",
    "lang_pred_ngram",
    "fingerprint",
    "dup_line_frac",
    "dup_line_char_frac",
    "top_bigram_char_frac",
)


def annotate(df: DataFrame, text_col: str = "text", metrics: tuple[str, ...] = AVAILABLE_METRICS) -> DataFrame:
    from etl_core_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    col = F.col(text_col)
    exprs = {
        "n_chars": lambda: X.char_count(col),
        "n_tokens": lambda: X.token_count(col),
        "n_tokens_bpe": lambda: F.size(X.bpe_ish_tokens(col)),
        "punct_ratio": lambda: F.round(X.punct_ratio(col), 6),
        "stopword_ratio": lambda: F.round(X.stopword_ratio(col), 6),
        "mean_token_length": lambda: F.round(X.mean_token_length(col), 6),
        "quality_score": lambda: X.quality_score(col),
        "lang_pred": lambda: X.lang_id(col),
        "lang_pred_ngram": lambda: X.lang_id_ngram(col),
        "fingerprint": lambda: F.md5(col),
        "dup_line_frac": lambda: F.round(X.dup_line_frac(col), 6),
        "dup_line_char_frac": lambda: F.round(X.dup_line_char_frac(col), 6),
        "top_bigram_char_frac": lambda: F.round(X.top_bigram_char_frac(col), 6),
    }
    out = df
    for m in metrics:
        if m not in exprs:
            raise OperatorConfigError(f"unknown text metric {m!r}")
        out = out.withColumn(m, exprs[m]())
    return out


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF.

    tf = term count within the document; idf = ln((N+1)/(df+1)) + 1
    (sklearn's smoothed variant — bounded, never zero). Classic
    keyword extraction / vocab-pruning pass for a training-data
    pipeline. Plan shape: explode → two hash aggregations (both
    map-side combinable) → join the per-term df table back → per-doc
    window top-k. The df join carries NO explicit broadcast hint:
    the relation is vocabulary-sized — small for one corpus, tens of
    millions of n-gram rows on a crawl — so an unconditional hint
    would bypass autoBroadcastJoinThreshold; AQE converts the join to
    broadcast at runtime whenever the vocabulary actually is small
    (both sides shuffle on ``term`` otherwise, which is the correct
    100 TB shape). Ties break on term asc so results are
    engine-independent; scores rounded to 6dp for cross-engine float
    equality.

    The corpus size N rides the plan as a broadcast one-row aggregate
    cross-joined into the scored rows — NOT a driver-side
    ``.count()``. Building this plan therefore launches zero Spark
    jobs (the engine's lazy contract, plans/builder.py) and costs no
    extra corpus scan; the previous eager-count form paid one full
    scan+shuffle per call at plan-construction time.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(X.tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n_docs"))
    idf = F.log((F.col("__n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1
    scored = (
        tf.join(doc_freq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("tf") * idf, 6).alias("tf_idf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf_idf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(id_col, "term", "tf_idf", "rank")
    )


@register_operator("clean_text")
class CleanTextOperator(Operator):
    """Text cleaning / PII redaction (beyond-reference): HTML-tag
    strip, entity unescape, email/IPv4/phone redaction, whitespace
    normalization, optional lowercasing — the standard scrub pass a
    corpus gets before dedup/tokenization. One narrow codegen'd map
    (functions/text.py clean chain), no shuffle, no Python; patterns
    stay in the Java-regex ∩ RE2 subset so the DuckDB oracle
    reproduces the output exactly."""

    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        self.text_col = self.config.get("text_col", "text")
        self.output_col = self.config.get("output_col", "text_clean")
        steps = tuple(self.config.get("steps") or X.DEFAULT_CLEAN_STEPS)
        for s in steps:
            if s not in X.CLEAN_STEPS:
                raise OperatorConfigError(
                    f"unknown clean_text step {s!r}; have {X.CLEAN_STEPS}"
                )
        self.steps = steps

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        out = df.withColumn(
            self.output_col, X.clean_text(F.col(self.text_col), self.steps)
        )
        return {"out": out}


@register_operator("text_analysis")
class TextAnalysisOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        self.text_col = self.config.get("text_col", "text")
        self.metrics = tuple(self.config.get("metrics") or AVAILABLE_METRICS)

    def apply(self, inputs: PortMap) -> PortMap:
        return {"out": annotate(self.single_input(inputs), self.text_col, self.metrics)}


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    embedding/RAG/pretraining preprocessing step. Output one row per
    chunk: (id, chunk_idx, chunk_text, n_tokens).

    Shape: tokens → sequence of window starts (stride = chunk_tokens
    − overlap) → explode → slice+join. Pure codegen array ops, zero
    shuffle, output rows ∝ input tokens / stride. A document shorter
    than one chunk yields exactly one chunk (its whole text,
    whitespace-normalized); empty/NULL docs yield no rows — a crawl
    corpus's empties must not become empty training rows.

    Deterministic and engine-portable: chunk boundaries are pure
    token arithmetic (no tokenizer state), so the DuckDB oracle
    reproduces byte-identical chunks.
    """
    if chunk_tokens < 1 or not 0 <= overlap < chunk_tokens:
        raise OperatorConfigError(
            "chunk_documents requires chunk_tokens >= 1 and 0 <= overlap < chunk_tokens"
        )
    from etl_core_spark.session import ensure_parallelism

    stride = chunk_tokens - overlap
    toks = X.tokens(F.col(text_col))
    n = F.size(toks)
    # last window start: the largest multiple of stride that still
    # begins inside the doc AND starts new content (start < n); for
    # n <= chunk_tokens that is just start 0
    n_starts = F.when(
        n > chunk_tokens, F.ceil((n - F.lit(overlap)) / F.lit(stride))
    ).otherwise(F.lit(1)).cast("int")
    base = ensure_parallelism(df).where(F.length(F.trim(F.col(text_col))) > 0)
    exploded = base.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_starts - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    piece = F.slice(F.col("__toks"), start + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        # chunk_idx FIRST: it is digits-only, so the FIRST ':' always
        # splits unambiguously even when document ids themselves
        # contain ':'. (id-first is also injective, but only under a
        # split-on-LAST-colon rule — consumers naturally split on the
        # first, and that rule DID collide for colon-bearing ids)
        F.concat_ws(
            ":", F.col("chunk_idx").cast("string"), F.col(id_col).cast("string")
        ).alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    ngram_n: int = 8,
    max_matches: int = 0,
    hash_keys: bool = False,
) -> DataFrame:
    """Train-test decontamination: flag training documents sharing
    token n-grams with a benchmark/eval corpus (the GPT-3-style
    13-gram method; n defaults lower because the synthetic docs are
    short). Output: every input doc annotated with
    ``n_contaminated`` (distinct benchmark n-grams it contains),
    ``n_ngrams`` (its distinct n-gram count) and ``is_contaminated``
    (n_contaminated > ``max_matches``) — callers drop or quarantine
    flagged docs.

    Scale shape: both sides explode to distinct n-grams; the
    benchmark side collapses to its distinct n-gram SET (eval suites
    are millions of n-grams, not billions — but NOT broadcast: the
    join shuffles on the n-gram key, and AQE converts to broadcast at
    runtime when the benchmark really is small). One inner join +
    per-doc count + one left join back onto the docs relation (clean
    docs keep count 0). ``hash_keys=True`` joins on ``xxhash64``
    of the n-gram instead of the string — ~6× narrower shuffle with a
    ~2^-64 per-pair phantom-match probability, the right trade at
    crawl scale but off by default so the exact form is what the
    oracle certifies."""
    if ngram_n < 1:
        raise OperatorConfigError("decontaminate requires ngram_n >= 1")
    from etl_core_spark.session import ensure_parallelism

    bcol = bench_text_col or text_col
    key = (lambda c: F.xxhash64(c)) if hash_keys else (lambda c: c)
    bench_grams = (
        ensure_parallelism(benchmark)
        .select(F.explode(X.shingles(F.col(bcol), ngram_n)).alias("__g"))
        .select(key(F.col("__g")).alias("__k"))
        .distinct()
    )
    doc_grams = ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(X.shingles(F.col(text_col), ngram_n))).alias("__g"),
    )
    totals = doc_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        doc_grams.select(F.col(id_col), key(F.col("__g")).alias("__k"))
        .join(bench_grams, on="__k")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.join(totals, on=id_col, how="left")
        .join(hits, on=id_col, how="left")
        .withColumn("n_ngrams", F.coalesce("n_ngrams", F.lit(0)))
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn("is_contaminated", F.col("n_contaminated") > int(max_matches))
    )


@register_operator("decontaminate")
class DecontaminateOperator(Operator):
    """Ports: ``docs`` (training corpus) + ``benchmark`` (eval
    corpus); out: the docs relation annotated with contamination
    counts and flag."""

    in_ports = ("docs", "benchmark")
    out_ports = ("out",)

    def validate_config(self) -> None:
        self.ngram_n = int(self.config.get("ngram_n", 8))
        if self.ngram_n < 1:
            raise OperatorConfigError("decontaminate requires ngram_n >= 1")

    def apply(self, inputs: PortMap) -> PortMap:
        c = self.config
        return {
            "out": decontaminate(
                inputs["docs"], inputs["benchmark"],
                c.get("text_col", "text"), c.get("id_col", "doc_id"),
                c.get("bench_text_col"), self.ngram_n,
                int(c.get("max_matches", 0)), bool(c.get("hash_keys", False)),
            )
        }


@register_operator("chunk_documents")
class ChunkDocumentsOperator(Operator):
    in_ports = ("in",)
    out_ports = ("out",)

    def validate_config(self) -> None:
        for key in ("text_col", "id_col"):
            if not self.config.get(key):
                raise OperatorConfigError(f"chunk_documents requires {key!r}")

    def apply(self, inputs: PortMap) -> PortMap:
        c = self.config
        return {
            "out": chunk_documents(
                self.single_input(inputs), c["text_col"], c["id_col"],
                int(c.get("chunk_tokens", 256)), int(c.get("overlap", 32)),
            )
        }
