"""Property-based equivalence armor for the codegen rewrites.

The perf-critical operators were rewritten from interpreted higher-order
expressions to codegen'd regex / explode+aggregate forms; these tests pin
the rewritten forms to slow-but-obviously-correct reference
implementations over adversarial random text (unicode, punctuation,
mixed/exotic whitespace, empty strings).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import dedup

# words plus whitespace variety (space, tab, newline) and junk characters
_texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FF
        ),
        max_size=30,
    ),
    min_size=1,
    max_size=12,
).map(lambda parts: " ".join(parts))


def _hof_shingles(col, n=3):
    """The original interpreted formulation (reference implementation),
    over fully-stripped text (same normalization as the operators)."""
    tokens = F.split(F.regexp_replace(F.lower(col), r"^\s+|\s+$", ""), r"\s+")
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    )


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_regex_shingles_match_hof_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    got = df.select(
        "id",
        F.array_sort(dedup.word_shingles("t")).alias("a"),
        F.array_sort(_hof_shingles(F.col("t"))).alias("b"),
    )
    bad = got.filter(F.col("a") != F.col("b")).collect()
    assert not bad, bad


@settings(max_examples=10, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_simhash_df_matches_column_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    a = df.select(
        F.col("doc_id").alias("id"), dedup.simhash_signature("text").alias("ref")
    )
    b = dedup.simhash_signatures_df(df)
    bad = a.join(b, "id").filter(F.col("ref") != F.col("sig")).collect()
    assert not bad, bad
