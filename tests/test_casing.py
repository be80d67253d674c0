"""The Java-equivalent lowercase contract (operators/casing.py): the
DuckDB expression must reproduce Spark's lower() byte-for-byte on text the
plain DuckDB lower() gets wrong — final sigma (with its case-ignorable
transparency rules), İ's two-char expansion, and the newer-Unicode
mappings utf8proc lacks."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import _casing_tables as T
from api_log_iceberg_test_spark.operators.casing import jlower_sql

CRAFTED = [
    "ΑΣ", "ΑΣ Β", "ΟΔΟΣ.", "ΣΣ", "ΑΣΣ", "Α'Σ", "ΑΣ̈", "漢Σ", "ΑΣ漢",
    "İ", "İΣ", "ΑΣ'", "Ω'Σ Α", "ΑΣ.Β", "ΑΣ.", "Α.Σ", "Α:Σ:Β", "ⅯΣ",
    "ⒶΣ", "ΟΔΥΣΣΕΥΣ.", "İSTANBUL ΩΣ", "σΣ", "ςΣ", "Σ", "ασ", "ας",
]


def test_frozen_tables_shape():
    assert len(T.TRANSLATE_FROM) == len(T.TRANSLATE_TO) == 70
    assert "İ" not in T.TRANSLATE_FROM  # two-char expansion goes via replace
    assert T.CASED_PLUS and T.IGN_PLUS
    # the documented residual gap is exactly the one frozen char
    assert T.IGN_MINUS == "\U0001171e"
    # spot-check a mapping from each family: new BMP letter, Vithkuqi astral
    i = T.TRANSLATE_FROM.index("Ᲊ")
    assert T.TRANSLATE_TO[i] == "ᲊ"
    j = T.TRANSLATE_FROM.index("\U00010570")
    assert T.TRANSLATE_TO[j] == "\U00010597"
    # FULL STOP and apostrophe are engine-case-ignorable but not RE2-\p{M}…
    assert "." in T.IGN_PLUS and "'" in T.IGN_PLUS


def test_jlower_matches_spark_lower(spark):
    rng = random.Random(11)
    alphabet = (
        list("ΑΒΓΔΣΩΫσςαβγİIiı漢абЖ '’.:·-") + ["̈", "״"]
        + ["Ᲊ", "Ɤ", "\U00010570", "Ⓐ", "Ⅰ", "ª"]
        + ["Σ"] * 4
    )
    texts = CRAFTED + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 14)))
        for _ in range(600)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "x"])
    want = {r["i"]: r["l"] for r in df.select("i", F.lower("x").alias("l")).collect()}
    con = duckdb.connect()
    con.register("tx", pd.DataFrame({"i": range(len(texts)), "x": texts}))
    got = dict(con.execute(f"SELECT i, {jlower_sql('x')} FROM tx").fetchall())
    bad = [(texts[i], want[i], got[i]) for i in range(len(texts)) if want[i] != got[i]]
    assert not bad, bad[:5]


def test_plain_duckdb_lower_would_diverge():
    """Non-vacuity: the shapes above actually separate plain lower() from
    the engine — otherwise this whole module tests nothing."""
    con = duckdb.connect()
    plain = con.execute("SELECT lower('ΑΣ'), lower('İ')").fetchone()
    assert plain == ("ασ", "i")           # simple mapping
    fixed = con.execute(
        f"SELECT {jlower_sql(chr(39) + 'ΑΣ' + chr(39))}, "
        f"{jlower_sql(chr(39) + 'İ' + chr(39))}"
    ).fetchone()
    assert fixed == ("ας", "i̇")          # full mapping, like Spark


def test_unicode_case_tokens_query_exercises_final_sigma(spark):
    """The driver entry's residue-1 suffix must actually produce ς in the
    engine's normalized text (and residue-2 the İ expansion) — otherwise
    the md5 pins nothing."""
    from api_log_iceberg_test_spark.operators import text as text_ops
    from api_log_iceberg_test_spark.operators.registry import (
        q_unicode_case_tokens,
    )
    from api_log_iceberg_test_spark.schema import load_table

    sf = "/root/testdata/sf0.001"
    out = q_unicode_case_tokens(spark, sf)
    assert out.count() == load_table(spark, sf, "documents").count()
    docs = load_table(spark, sf, "documents")
    import pyspark.sql.functions as F

    r1 = (
        docs.where(F.pmod("doc_id", F.lit(4)) == 1)
        .limit(1)
        .select(text_ops.norm_text(F.concat("text", F.lit(" ΟΔΥΣΣΕΥΣ."))).alias("n"))
        .collect()
    )
    assert r1 and r1[0]["n"].endswith("οδυσσευ\u03c2.")  # interior σσ kept, final ς
    r2 = (
        docs.where(F.pmod("doc_id", F.lit(4)) == 2)
        .limit(1)
        .select(text_ops.norm_text(F.concat("text", F.lit(" İĞİΣ Ω'Σ"))).alias("n"))
        .collect()
    )
    # BOTH sigmas are word-final (one before a space, one apostrophe-
    # transparent at end) \u2014 the engine writes \u03c2 twice, plus \u0130 \u2192 i+U+0307
    assert r2 and r2[0]["n"].endswith("i\u0307\u011fi\u0307\u03c2 \u03c9'\u03c2")
