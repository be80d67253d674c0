"""Text analysis operator semantics on crafted inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "der Hund und die Katze ist hier"),
            (3, "1234 5678!!!"),
            (4, ""),
            (5, "fox brown quick the"),  # bag-of-words identical to doc 1
        ],
        ["doc_id", "text"],
    )


def test_token_counts(spark, docs):
    out = {r["doc_id"]: r for r in text.analyze(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[4]["n_tokens"] == 0
    assert out[3]["n_subword_tokens"] == 5  # 1234, 5678, !, !, !


def test_langid(spark, docs):
    out = {r["doc_id"]: r["lang_pred"] for r in text.analyze(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_langid_tie_break_alphabetical(spark):
    """Tied stopword scores resolve to the alphabetically-first language code,
    matching the oracle CASE's de>en>es>fr priority (ADVICE round 1: reversed
    iteration made the alphabetically-last code win)."""
    df = spark.createDataFrame(
        [
            (1, "la maison"),  # 'la' ∈ fr AND es, 1-1 tie → es
            (2, "der the und and das of"),  # de 3 vs en 3 tie → de
            (3, "le el"),  # fr 1 vs es 1 tie → es
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in text.analyze(df).collect()}
    assert out[1] == "es"
    assert out[2] == "de"
    assert out[3] == "es"
    # standalone langid() column agrees with analyze()
    solo = {
        r["doc_id"]: r["lp"]
        for r in df.select("doc_id", text.langid("text").alias("lp")).collect()
    }
    assert solo == out


def test_quality_bounds(spark, docs):
    for r in text.analyze(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
    out = {r["doc_id"]: r["quality"] for r in text.analyze(docs).collect()}
    assert out[1] > out[3]  # clean text beats digit/punct noise


def test_fingerprint_order_insensitive(spark, docs):
    out = {r["doc_id"]: r["fingerprint"] for r in text.analyze(docs).collect()}
    assert out[1] == out[5]
    assert out[1] != out[2]


def test_ratios(spark):
    df = spark.createDataFrame([(1, "ab, cd!")], ["doc_id", "text"])
    r = text.analyze(df).collect()[0]
    assert r["punct_ratio"] == pytest.approx(2 / 7, abs=1e-6)
    assert r["digit_ratio"] == 0.0


def test_repetition_signals_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top 3/4, dup tokens 2/4, bigrams: aa,aa,ab
            (2, "x y z w"),          # no repetition at all
            (3, "go go go go"),      # fully repetitive
            (4, ""),                 # blank: all signals 0
            (5, "solo"),             # 1 token: no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["top_unigram_frac"] == 0.75
    assert out[1]["dup_token_frac"] == 0.5
    assert out[1]["dup_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["top_unigram_frac"] == 0.25
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["top_unigram_frac"] == 1.0
    assert out[3]["dup_token_frac"] == 0.75
    assert out[3]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[4]["n_tokens"] == 0
    assert out[4]["top_unigram_frac"] == 0.0
    assert out[4]["dup_token_frac"] == 0.0
    assert out[5]["dup_bigram_frac"] == 0.0


def test_trailing_whitespace_token_parity(spark):
    """A trailing tab/newline must not change token counts, fingerprints,
    or simhash signatures (the F.trim space-only gotcha)."""
    from api_log_iceberg_test_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world\t"), (3, "\thello world\n")],
        ["doc_id", "text"],
    )
    rows = df.select(
        "doc_id",
        text.token_count("text").alias("n"),
        text.fingerprint("text").alias("fp"),
        dd.simhash_signature("text").alias("sig"),
    ).collect()
    base = next(r for r in rows if r["doc_id"] == 1)
    for r in rows:
        assert r["n"] == 2, r
        assert r["fp"] == base["fp"], r
        assert r["sig"] == base["sig"], r


def test_stopword_pattern_escapes_metacharacters(spark):
    df = spark.createDataFrame([(1, "c++ and java and c++")], ["doc_id", "text"])
    out = df.select(
        text.stopword_ratio("text", stopwords=["c++"]).alias("r")
    ).collect()[0]
    assert out["r"] == pytest.approx(2 / 5, abs=1e-9)


def test_unigram_lm_scores_ranks_rare_docs(spark):
    # 'common' appears 8x corpus-wide, 'rare' once: the all-common doc must
    # score a higher avg logprob (more typical) than the doc with 'rare'.
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rare"),
            (3, "common "),  # trailing whitespace must not add a token
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.unigram_lm_scores(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
    assert out[3]["n_tokens"] == 1
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    assert out[2]["ppl_proxy"] > out[1]["ppl_proxy"]
    # p(common) = 8/9 -> avg_logprob of doc 1 = ln(8/9)
    import math

    assert abs(out[1]["avg_logprob"] - round(math.log(8 / 9), 4)) < 1e-9


def test_unigram_lm_scores_empty_doc_excluded(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
    ids = [r["doc_id"] for r in text.unigram_lm_scores(df).collect()]
    assert ids == [1]


def test_bpe_pair_counts_crafted(spark):
    # vocabulary: "aa" x3, "ab" x1 -> per-word pairs weighted by frequency:
    # aa -> (a,a),(a,</w>) x3;  ab -> (a,b),(b,</w>) x1
    df = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "aa")], ["doc_id", "text"]
    )
    out = {(r["left"], r["right"]): r["pair_cnt"] for r in text.bpe_pair_counts(df).collect()}
    assert out == {
        ("a", "a"): 3,
        ("a", "</w>"): 3,
        ("a", "b"): 1,
        ("b", "</w>"): 1,
    }


def test_bpe_pair_counts_single_char_words(spark):
    # 1-char words produce only the terminal pair
    df = spark.createDataFrame([(1, "x y x")], ["doc_id", "text"])
    out = {(r["left"], r["right"]): r["pair_cnt"] for r in text.bpe_pair_counts(df).collect()}
    assert out == {("x", "</w>"): 2, ("y", "</w>"): 1}


def test_lineterm_tokens_query_pins_absolute_end_anchors(spark):
    """q_lineterm_tokens must tokenize terminator-final text with
    absolute-end (\\z / RE2 $) semantics: the ' \\x85' suffix branch
    (doc_id % 6 == 4) keeps the terminator as its OWN token; Java `$`
    semantics would strip the interior space and glue it onto the last
    word (VERDICT r13 #1)."""
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators.registry import q_lineterm_tokens
    from api_log_iceberg_test_spark.schema import load_table

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in q_lineterm_tokens(spark, sf).collect()}
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    assert out and len(out) == len(docs)
    suffixes = {1: "\x85", 2: "\u2028", 3: "\u2029", 4: " \x85", 5: " \x0b"}
    import re

    ws = r"[ \t\n\x0b\f\r]"
    n_glue_shapes = n_vt_shapes = 0
    for row in docs:
        t = (row["text"] + suffixes.get(row["doc_id"] % 6, "")).lower()
        stripped = re.sub(f"^{ws}+|{ws}+{chr(92)}Z", "", t)
        norm = re.sub(f"{ws}+", " ", stripped)
        toks = norm.split(" ") if norm else []
        assert out[row["doc_id"]]["n_tokens"] == len(toks), (row["doc_id"], t)
        # the glue shape: buggy Java-$ stripping would have merged the
        # final two tokens, lowering n_tokens by one
        if row["doc_id"] % 6 == 4 and len(toks) >= 2:
            n_glue_shapes += 1
            assert toks[-1] == "\x85"
        # the VT shape: a trailing ' \x0b' is ALL whitespace under Java \s
        # and must vanish (an RE2-\s oracle would keep a phantom token)
        if row["doc_id"] % 6 == 5:
            n_vt_shapes += 1
            assert not toks or toks[-1] != "\x0b"
    assert n_glue_shapes > 0  # the corpus actually exercises the edge
    assert n_vt_shapes > 0
