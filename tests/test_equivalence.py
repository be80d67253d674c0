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

# words plus whitespace variety (space, tab, newline) and junk characters.
# The alphabet explicitly includes Java's Unicode line terminators
# (U+0085 NEL, U+2028, U+2029 — beyond the base 0x2FF range for the last
# two): a Java-regex `$` matches BEFORE a final one of these, which made
# `\s+$` strip interior whitespace and glue tokens (fixed to `\z`;
# hypothesis found it with a trailing NEL). A sampled suffix puts a
# terminator in final position — the adversarial spot — on many draws
# instead of waiting for a lucky draw.
_LINE_TERMINATORS = "\x85\u2028\u2029"
_texts = st.tuples(
    st.lists(
        st.text(
            alphabet=st.one_of(
                st.characters(
                    codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FF
                ),
                st.sampled_from(_LINE_TERMINATORS),
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from(["", "\x85", "\u2028", "\u2029", "\r\n", " \x85", " \x0b"]),
).map(lambda p: " ".join(p[0]) + p[1])


def _hof_shingles(col, n=3):
    """The original interpreted formulation (reference implementation),
    over fully-stripped text (same normalization as the operators)."""
    tokens = F.split(F.regexp_replace(F.lower(col), r"^\s+|\s+\z", ""), r"\s+")
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


# PII-looking fragments interleaved with arbitrary text
_pii_texts = st.lists(
    st.one_of(
        _texts,
        st.sampled_from(
            [
                "bob@example.com",
                "https://a.example.com/x?y=1",
                "123-45-6789",
                "555-123-4567",
                "+555-123-4567",
                "not.an@email",
                "http://",
            ]
        ),
    ),
    min_size=1,
    max_size=8,
).map(lambda parts: " ".join(parts))


@settings(max_examples=15, deadline=None)
@given(st.lists(_pii_texts, min_size=1, max_size=6))
def test_pii_scrub_idempotent_and_clean(spark, texts):
    """scrub(scrub(x)) == scrub(x), and a scrubbed text re-scores zero on
    every PII counter (placeholders contain no matchable fragments)."""
    from api_log_iceberg_test_spark.operators import text as t

    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], ["id", "s"])
    once = df.select("id", t.scrub_pii("s").alias("s1"))
    twice = once.select("id", F.col("s1"), t.scrub_pii("s1").alias("s2"))
    assert not twice.filter(F.col("s1") != F.col("s2")).collect()
    rescored = once.select("id", *[c for c in t.pii_counts("s1")])
    for r in rescored.collect():
        assert all(r[f"n_{name}"] == 0 for name, _, _ in t.PII_PATTERNS), r


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ).filter(lambda x: abs(x) > 1e-9),
            min_size=2,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_quantize_bounds_and_error(spark, vectors):
    """Quantized values stay in int8 range; the max-magnitude element maps
    to ±127; reconstruction error is bounded by half a quantization step."""
    from api_log_iceberg_test_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], ["vec_id", "embedding"]
    )
    for r in similarity.quantize_embeddings(df).collect():
        v = vectors[r["vec_id"]]
        qs = [int(x) for x in r["q"]]
        assert all(-127 <= q <= 127 for q in qs), qs
        assert 127 in (abs(q) for q in qs)  # max |x| elem hits full scale
        step = max(abs(x) for x in v) / 127.0
        assert r["max_err"] <= step / 2 + 1e-6, (r["max_err"], step)


def _py_repetition(text: str) -> tuple[int, float, float, float]:
    """Pure-Python reference for repetition_signals (obviously correct).

    Whitespace = Java regex \\s ([ \\t\\n\\x0b\\f\\r]) — the engine's
    tokenization class, which the DuckDB oracles spell out EXPLICITLY
    because RE2's \\s excludes \\x0b (r14; see the registry _TOKENS
    comment). Python's str.split() additionally treats \\x1c-\\x1f as
    whitespace, which the engines do NOT (hypothesis found the divergence
    with a lone \\x1f)."""
    import re

    ws = r"[ \t\n\x0b\f\r]"
    t = re.sub(f"^{ws}+|{ws}+$", "", text.lower())
    t = re.sub(f"{ws}+", " ", t)
    toks = t.split(" ") if t else []
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    from collections import Counter

    top = Counter(toks).most_common(1)[0][1]
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    dup_bg = (
        (len(bigrams) - len(set(bigrams))) / len(bigrams) if bigrams else 0.0
    )
    return (
        n,
        round(top / n, 6),
        round((n - len(set(toks))) / n, 6),
        round(dup_bg, 6),
    )


@settings(max_examples=12, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_repetition_signals_match_python_reference(spark, texts):
    from api_log_iceberg_test_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_unigram_frac"],
            r["dup_token_frac"],
            r["dup_bigram_frac"],
        )
        for r in text_ops.repetition_signals(df).collect()
    }
    for i, t in enumerate(texts):
        want = _py_repetition(t)
        assert got[i][0] == want[0], (i, t, got[i], want)
        for g, w in zip(got[i][1:], want[1:]):
            assert g == pytest.approx(w, abs=1e-9), (i, t, got[i], want)


def test_funnel_conversion_window_boundary(spark, tmp_path):
    import datetime as dt

    from api_log_iceberg_test_spark.queries.analytics import q_funnel_conversion

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: converts exactly at the 7-day boundary (inclusive)
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + dt.timedelta(days=7), 1, "purchase", 1.0, "{}"),
        # user 2: purchase 1s past the boundary -> not converted
        (3, t0, 2, "signup", 0.0, "{}"),
        (4, t0 + dt.timedelta(days=7, seconds=1), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE signup -> not converted
        (5, t0, 3, "signup", 0.0, "{}"),
        (6, t0 - dt.timedelta(hours=1), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "funnel")
    df.write.parquet(d + "/events.parquet")
    out = q_funnel_conversion(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_signups"] == 3 and r["n_converted_7d"] == 1
    assert abs(r["conv_rate"] - round(1 / 3, 6)) < 1e-9


def test_retention_cohorts_offsets(spark, tmp_path):
    import datetime as dt

    from api_log_iceberg_test_spark.queries.analytics import q_retention_cohorts

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)  # a Monday
    rows = [
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + dt.timedelta(days=8), 1, "click", 0.0, "{}"),   # week 1
        (3, t0 + dt.timedelta(days=20), 1, "click", 0.0, "{}"),  # week 2
        (4, t0 + dt.timedelta(days=40), 1, "click", 0.0, "{}"),  # week 5: out
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "retention")
    df.write.parquet(d + "/events.parquet")
    out = {(r["week_offset"]): r["n_active"] for r in q_retention_cohorts(spark, d).collect()}
    assert out == {0: 1, 1: 1, 2: 1}  # signup day itself + weeks 1,2; week 5 excluded


def test_curation_pipeline_all_dispositions(spark, tmp_path):
    from api_log_iceberg_test_spark.operators.registry import q_curation_pipeline

    long_clean = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    dup_text = (
        "uniform victor whiskey xray yankee zulu amber bronze copper dusk "
        "ember frost garnet harbor indigo jasper"
    )
    bench_text = "needle one two three four shared with benchmark document here"
    rows = [
        (1, "tiny", "en", "s"),                      # too_short
        (2, "1 2 3 4 5 6 7 8 9 10 11 12 13", "en", "s"),  # low_quality (digits)
        # shares the 5-gram "needle one two three four" with bench doc 7
        (3, "needle one two three four plus many other clean tokens follow here now", "en", "s"),
        (4, dup_text, "en", "s"),                    # duplicate pair (4, 5)
        (5, dup_text + " extra", "en", "s"),
        (6, long_clean, "en", "s"),                  # kept
        (7, bench_text, "en", "s"),                  # benchmark split (id % 10 == 7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    d = str(tmp_path / "curation")
    df.write.parquet(d + "/documents.parquet")
    out = {r["doc_id"]: r["disposition"] for r in q_curation_pipeline(spark, d).collect()}
    assert out[1] == "too_short"
    assert out[2] == "low_quality"
    assert out[3] == "contaminated"
    assert out[5] == "duplicate" and out[4] == "kept"  # 4 is the cluster min -> canonical
    assert out[6] == "kept"
    assert 7 not in out  # benchmark docs are not part of the curated corpus


def test_asof_forward_semantics(spark, tmp_path):
    import datetime as dt

    from api_log_iceberg_test_spark.queries.analytics import q_asof_join_forward

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # purchase at t5: equal-ts click (id 20) must match over later ones
        (10, t(5), 1, "purchase", 0.0, "{}"),
        (20, t(5), 1, "click", 0.0, "{}"),
        (21, t(9), 1, "click", 0.0, "{}"),
        # purchase after the last right event -> no forward match
        (11, t(30), 1, "purchase", 0.0, "{}"),
        # equal-ts tie between two clicks: deterministic min event_id
        (12, t(2), 2, "purchase", 0.0, "{}"),
        (30, t(4), 2, "click", 0.0, "{}"),
        (31, t(4), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "asof_fwd")
    df.write.parquet(d + "/events.parquet")
    out = {r["event_id"]: r["next_event_id"] for r in q_asof_join_forward(spark, d).collect()}
    assert out[10] == 20  # at-or-after includes equal ts
    assert out[11] is None  # nothing after
    assert out[12] == 30  # min id among equal-ts candidates


def test_weighted_sample_downsamples_heavy_source(spark, tmp_path):
    from api_log_iceberg_test_spark.operators.registry import q_weighted_sample

    # src_big holds ~4x the tokens of src_small -> its per-mille rate must
    # be capped below 1000 while src_small stays at 1000 (upweight capped)
    rows = [(i, "word " * 40, "en", "src_big") for i in range(80)]
    rows += [(100 + i, "word " * 10, "en", "src_small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    d = str(tmp_path / "wsample")
    df.write.parquet(d + "/documents.parquet")
    out = {r["source"]: r for r in q_weighted_sample(spark, d).collect()}
    assert out["src_small"]["per_mille"] == 1000
    assert out["src_small"]["n_kept"] == 20
    assert out["src_big"]["per_mille"] < 1000
    assert out["src_big"]["n_kept"] < 80


def test_asof_nearest_picks_closer_side(spark, tmp_path):
    import datetime as dt

    from api_log_iceberg_test_spark.queries.analytics import q_asof_join_nearest

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # backward at -3s, forward at +1s -> forward wins
        (10, t(10), 1, "purchase", 0.0, "{}"),
        (20, t(7), 1, "click", 0.0, "{}"),
        (21, t(11), 1, "click", 0.0, "{}"),
        # exact |dt| tie (backward -2s, forward +2s) -> backward wins
        (11, t(20), 2, "purchase", 0.0, "{}"),
        (30, t(18), 2, "click", 0.0, "{}"),
        (31, t(22), 2, "click", 0.0, "{}"),
        # only a backward candidate exists
        (12, t(40), 3, "purchase", 0.0, "{}"),
        (40, t(35), 3, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "asof_near")
    df.write.parquet(d + "/events.parquet")
    out = {r["event_id"]: (r["nearest_event_id"], r["direction"])
           for r in q_asof_join_nearest(spark, d).collect()}
    assert out[10] == (21, "forward")
    assert out[11] == (30, "backward")
    assert out[12] == (40, "backward")


# ---------------------------------------------------------------------------
# pair-free time-neighborhood stats (r11 re-plan of the aggregated range join)
# ---------------------------------------------------------------------------

_event_rows = st.lists(
    st.tuples(st.integers(0, 120_000_000), st.booleans()),  # (micros, flag)
    min_size=1,
    max_size=40,
)


@given(rows=_event_rows, bucket_seconds=st.sampled_from([10, 20, 35, 120]))
@settings(max_examples=25, deadline=None)
def test_nearby_stats_match_bruteforce(spark, rows, bucket_seconds):
    """joins.nearby_stats_within vs a per-row Python brute force, over
    adversarial timestamps: exact ties, exact ±window boundaries, and
    bucket-edge straddles (bucket_seconds down to == within_seconds, the
    minimum legal strip coverage). Counts and nearest gaps must be exact
    — the boundary-strip replication is a lossless rewrite, not an
    approximation."""
    from api_log_iceberg_test_spark.operators.joins import nearby_stats_within

    within = 10  # seconds
    w_us = within * 1_000_000
    data = [(i, t, bool(f)) for i, (t, f) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, t_us long, flag boolean").select(
        "id", "flag", F.timestamp_micros(F.col("t_us")).alias("ts")
    )
    out = {
        r["id"]: (r["n_nearby"], r["n_nearby_flagged"], r["nearest_gap_us"])
        for r in nearby_stats_within(
            df,
            time_col="ts",
            within_seconds=within,
            flag=F.col("flag"),
            keep_cols=["id"],
            bucket_seconds=bucket_seconds,
        ).collect()
    }
    assert set(out) == {i for i, _, _ in data}
    for i, t, _ in data:
        nb = [(tj, fj) for j, tj, fj in data if j != i and abs(tj - t) <= w_us]
        want = (
            len(nb),
            sum(1 for _, fj in nb if fj),
            min((abs(tj - t) for tj, _ in nb), default=None),
        )
        assert out[i] == want, (i, t, out[i], want)


def test_nearby_stats_match_pair_form_on_events(spark, sf_dir):
    """The r11 pair-free q_range_join_nearby_counts plan is row-identical
    to the r10 aggregated-pair form on the real events table (the driver
    hash must not move — no evidence floor was taken for the re-plan)."""
    from api_log_iceberg_test_spark.operators.joins import (
        nearby_stats_within,
        range_join_within,
    )
    from api_log_iceberg_test_spark.operators.registry import (
        q_range_join_nearby_counts,
    )
    from api_log_iceberg_test_spark.schema import load_table

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        us.alias("err_us"),
    )
    others = ev.select(
        F.col("event_id").alias("near_id"),
        F.col("ts").alias("near_ts"),
        F.col("event_type").alias("near_type"),
        us.alias("near_us"),
    )
    pairs = range_join_within(
        errors,
        others,
        left_time="err_ts",
        right_time="near_ts",
        within_seconds=300,
        left_cols=["err_id", "err_us"],
        right_cols=["near_id", "near_us", "near_type"],
    ).filter(F.col("err_id") != F.col("near_id"))
    reference = (
        pairs.groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            F.count(F.when(F.col("near_type") == "error", 1)).alias(
                "n_nearby_errors"
            ),
            F.min(F.abs(F.col("err_us") - F.col("near_us"))).alias("nearest_gap_us"),
        )
        .orderBy("err_id")
    )
    got = q_range_join_nearby_counts(spark, sf_dir)
    assert got.schema == reference.schema
    assert got.collect() == reference.collect()


def test_nearby_auto_bucket_reacts_to_bursts(spark):
    """VERDICT r11 #1: ``bucket_seconds="auto"`` must SHRINK the bucket
    under a hot distribution — one time bucket is one window partition,
    unsplittable by AQE, so the density pre-scan is the only lever that
    bounds the per-task row count — and stay at the default 12× factor
    on calm data. Output must be identical at every legal bucket choice
    (re-bucketing is a lossless re-partitioning, never a semantics
    change)."""
    from api_log_iceberg_test_spark.operators.joins import (
        auto_bucket_seconds,
        nearby_stats_within,
    )

    within = 10  # seconds

    def mk(rows):
        return spark.createDataFrame(
            [(i, t * 1_000_000, i % 3 == 0) for i, t in enumerate(rows)],
            "id long, t_us long, flag boolean",
        ).select("id", "flag", F.timestamp_micros(F.col("t_us")).alias("ts"))

    # calm: 200 rows, one per 400 s — peak density 1 row per within-cell
    calm = mk([400 * i for i in range(200)])
    # hot: 80 % of 200 rows inside ONE 20-second window (VERDICT's shape)
    hot = mk(
        [100_000 + (i % 20) for i in range(160)]
        + [400 * i for i in range(40)]
    )

    assert auto_bucket_seconds(calm, "ts", within, target_rows_per_task=50) == 12 * within
    # hot peak cell ≈ 80 rows ≫ target → floor at bucket == within
    assert auto_bucket_seconds(hot, "ts", within, target_rows_per_task=50) == within
    # a generous target leaves the calm default even on the hot stream
    assert auto_bucket_seconds(hot, "ts", within, target_rows_per_task=10**6) == 12 * within

    def run(bucket):
        return sorted(
            map(
                tuple,
                nearby_stats_within(
                    hot,
                    time_col="ts",
                    within_seconds=within,
                    flag=F.col("flag"),
                    keep_cols=["id"],
                    bucket_seconds=bucket,
                ).collect(),
            )
        )

    golden = run(12 * within)
    assert run(within) == golden
    assert run("auto") == golden


def test_nearby_bucket_seconds_string_validation_and_reused_density(spark):
    """ADVICE r12: any string other than exactly "auto" must raise a clear
    ValueError (not an opaque str-vs-int TypeError), the eager density
    pre-scan must reject streaming inputs with a targeted error, and a
    precomputed peak (VERDICT r12 #6) must (a) skip the scan entirely —
    proven by passing df=None — and (b) never change the output, only the
    bucketing."""
    import pytest

    from api_log_iceberg_test_spark.operators.joins import (
        auto_bucket_seconds,
        nearby_stats_within,
        peak_cell_density,
    )

    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(40)], "id long, flag boolean"
    ).select("id", "flag", F.timestamp_micros(F.col("id") * 7_000_000).alias("ts"))

    for bad in ("Auto", "AUTO", "aut0", ""):
        with pytest.raises(ValueError, match="auto"):
            nearby_stats_within(
                df, "ts", 10, F.col("flag"), ["id"], bucket_seconds=bad
            )

    # precomputed peak: pure arithmetic, df never touched (df=None proves it)
    assert auto_bucket_seconds(None, "ts", 10, peak_cell_rows=1) == 120
    assert (
        auto_bucket_seconds(
            None, "ts", 10, target_rows_per_task=50, peak_cell_rows=48
        )
        == 10
    )

    # a stale/wrong peak changes the knob, never the result
    peak = peak_cell_density(df, "ts", 10)
    assert peak >= 1

    def run(**kw):
        return sorted(
            map(
                tuple,
                nearby_stats_within(
                    df, "ts", 10, F.col("flag"), ["id"], **kw
                ).collect(),
            )
        )

    golden = run(bucket_seconds=120)
    assert run(bucket_seconds="auto", auto_peak_rows=peak) == golden
    assert run(bucket_seconds="auto", auto_peak_rows=10**9) == golden

    # a precomputed peak without the auto sentinel would be silently
    # discarded — strict, mirroring the sentinel check (ADVICE r13)
    for bs in (None, 120):
        with pytest.raises(ValueError, match="auto_peak_rows"):
            nearby_stats_within(
                df, "ts", 10, F.col("flag"), ["id"],
                bucket_seconds=bs, auto_peak_rows=peak,
            )

    # streaming input: the pre-scan is an eager batch action — clear error
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="streaming"):
        auto_bucket_seconds(stream, "timestamp", 10)
