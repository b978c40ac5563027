"""clean_text: HTML strip, entity unescape, PII redaction,
whitespace normalization — unit behavior plus a DuckDB differential
(the patterns are deliberately in the Java-regex ∩ RE2 subset, so
both engines must produce byte-identical output)."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.functions import text as X
from etl_core_spark.operators.base import OperatorConfigError, get_operator


def _clean_one(spark, s, steps=X.DEFAULT_CLEAN_STEPS):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(X.clean_text(F.col("text"), steps).alias("c")).first()["c"]


def test_strip_html_and_entities(spark):
    assert (
        _clean_one(spark, "<p>Hello <b>world</b> &amp; friends</p>")
        == "Hello world & friends"
    )


def test_entity_unescape_is_single_pass(spark):
    # "&amp;lt;" means the literal text "&lt;" — NOT "<"
    assert _clean_one(spark, "a &amp;lt; b") == "a &lt; b"
    assert _clean_one(spark, "a &lt; b &gt; c &quot;d&quot; &#39;e&#39;") == (
        'a < b > c "d" \'e\''
    )


def test_email_redaction(spark):
    assert (
        _clean_one(spark, "mail me at first.last+tag@sub.example.co today")
        == "mail me at <EMAIL> today"
    )


def test_ip_redacted_before_phone_pattern_can_eat_it(spark):
    # a dotted quad is phone-shaped; order must yield <IP> not <PHONE>
    assert _clean_one(spark, "server 10.0.12.7 down") == "server <IP> down"
    assert (
        _clean_one(spark, "call +1 (555) 010-0042 now") == "call <PHONE> now"
    )


def test_whitespace_normalization(spark):
    assert _clean_one(spark, "  a\t\tb\n\nc  ") == "a b c"


def test_lowercase_is_opt_in(spark):
    assert _clean_one(spark, "MiXeD") == "MiXeD"
    assert _clean_one(spark, "MiXeD", X.CLEAN_STEPS) == "mixed"


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(X.clean_text(F.col("text")).alias("c")).first()["c"] is None


def test_placeholders_survive_html_strip_order(spark):
    # html runs first, so the angle-bracketed placeholders survive
    out = _clean_one(spark, "<div>x@y.com</div> <span>1.2.3.4</span>")
    assert out == "<EMAIL> <IP>"


def test_unknown_step_raises(spark):
    with pytest.raises(ValueError, match="unknown clean_text step"):
        _clean_one(spark, "x", ("bogus",))
    with pytest.raises(OperatorConfigError, match="unknown clean_text step"):
        get_operator("clean_text")(steps=["bogus"])


def test_operator_output_col_and_steps(spark):
    df = spark.createDataFrame([(1, "<b>A</b>  B")], "id long, text string")
    op = get_operator("clean_text")(steps=["strip_html", "normalize_whitespace"])
    out = op.apply({"in": df})["out"]
    assert out.columns == ["id", "text", "text_clean"]
    assert out.first()["text_clean"] == "A B"
    op2 = get_operator("clean_text")(output_col="text", steps=["lowercase"])
    out2 = op2.apply({"in": df})["out"]
    assert out2.columns == ["id", "text"]  # in-place overwrite
    assert out2.first()["text"] == "<b>a</b>  b"


_DIRTY = [
    (0, "<p>Plain &amp; simple</p>"),
    (1, "reach admin@example.com or +44 20 7946 0958 ok"),
    (2, "host 192.168.0.1 &lt;internal&gt;"),
    (3, "  spaced\tout\n\ntext  "),
    (4, "nested <a href='x'>link text</a> &quot;q&quot; &#39;s&#39;"),
    (5, "&amp;lt;escaped twice&amp;gt;"),
    (6, ""),
    (7, None),
]

_DUCK_CLEAN = r"""
trim(regexp_replace(
  regexp_replace(
    regexp_replace(
      regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(text, '<[^>]*>', '', 'g'),
          '&nbsp;',' '),'&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),'&amp;','&'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
    '\+?[0-9][0-9()\-\s.]{6,}[0-9]', '<PHONE>', 'g'),
  '\s+', ' ', 'g'))
"""


def test_differential_vs_duckdb_on_dirty_fixture(spark):
    import duckdb

    df = spark.createDataFrame(_DIRTY, "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", X.clean_text(F.col("text")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.register("dirty", __import__("pandas").DataFrame(_DIRTY, columns=["doc_id", "text"]))
    want = dict(
        con.execute(f"SELECT doc_id, {_DUCK_CLEAN} FROM dirty").fetchall()
    )
    assert got == want
    # spot-check the interesting rows are genuinely transformed
    assert want[1] == "reach <EMAIL> or <PHONE> ok"
    assert want[2] == "host <IP> <internal>"
    assert want[5] == "&lt;escaped twice&gt;"


# ------------------------------------------------ n-gram language id

def test_lang_id_ngram_profiles(spark):
    from etl_core_spark.functions.text import lang_id_ngram

    rows = [
        (1, "the king and the queen are singing in the morning"),
        (2, "ich bin ein berliner und der schnee ist schoen"),
        (3, "les enfants que nous aimons sont dans les jardins"),
        (4, ""),
        (5, None),
        (6, "zzz qqq xxx"),  # no profile gram fires
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["p"]
        for r in df.select("id", lang_id_ngram(F.col("text")).alias("p")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und" and got[5] == "und" and got[6] == "und"


def test_lang_id_ngram_tie_breaks_alphabetically(spark):
    from etl_core_spark.functions.text import lang_id_ngram

    # "que" scores fr; " el" scores es; equal totals -> alphabetical
    df = spark.createDataFrame([("que el",)], "text string")
    assert df.select(lang_id_ngram(F.col("text")).alias("p")).first()["p"] == "es"
