"""Reference-parity property tests for the round-7 statistical operators:
each Spark result is replayed against an independent pure-Python
implementation on hypothesis-generated inputs (derandomized, small
example counts — each example round-trips through Spark)."""

from __future__ import annotations

import decimal
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import registry

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _patch_docs(monkeypatch, spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(registry, "load_table", lambda *_a, **_k: df)


@given(
    lens=st.lists(st.integers(min_value=1, max_value=700), min_size=3, max_size=40)
)
@settings(**_SETTINGS)
def test_padding_waste_matches_python_reference(spark, monkeypatch, lens):
    rows = [
        (i, " ".join(["w"] * n), "en", "s", n) for i, n in enumerate(lens)
    ]
    _patch_docs(monkeypatch, spark, rows)
    got = {
        r["bucket_cap"]: r
        for r in registry.q_padding_waste(spark, "unused").collect()
    }
    monkeypatch.undo()
    ref: dict[int, list[int]] = {}
    for n in lens:
        e = min(n, 512)
        cap = min(1 if e == 1 else 2 ** math.ceil(math.log2(e)), 512)
        ref.setdefault(cap, []).append(e)
    assert set(got) == set(ref)
    for cap, es in ref.items():
        r = got[cap]
        assert r["n_docs"] == len(es)
        assert r["total_tokens"] == sum(es)
        assert r["pad_tokens"] == len(es) * cap - sum(es)


@given(
    scores=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=25,
        max_size=60,
        unique_by=lambda t: t,
    )
)
@settings(**_SETTINGS)
def test_rbo_matches_python_reference(spark, monkeypatch, scores):
    """Random (n_chars, token-proxy) score pairs → the operator's RBO
    must equal the textbook truncated RBO computed in pure Python from
    the same two rankings (score DESC, doc_id ASC ties)."""
    rows = [
        # text with tb words so token_count == tb exactly; n_chars = ta
        (i, " ".join(["w"] * max(tb, 1)), "en", "s", ta)
        for i, (ta, tb) in enumerate(scores)
    ]
    _patch_docs(monkeypatch, spark, rows)
    got = registry.q_rank_biased_overlap(spark, "unused").collect()[0]
    monkeypatch.undo()

    k, p = 20, 0.9
    a = [i for i, _ in sorted(enumerate(scores), key=lambda t: (-t[1][0], t[0]))][:k]
    b = [
        i
        for i, _ in sorted(
            enumerate(scores), key=lambda t: (-max(t[1][1], 1), t[0])
        )
    ][:k]
    rbo = 0.0
    for d in range(1, k + 1):
        rbo += (1 - p) * p ** (d - 1) * len(set(a[:d]) & set(b[:d])) / d
    assert got["overlap_at_k"] == len(set(a) & set(b))
    assert abs(got["rbo"] - round(rbo, 6)) < 2e-6


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e4,
            max_value=1e4,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=300,
    ),
    keys=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_grid_group_totals_match_decimal_reference(spark, vals, keys):
    """The exact-grid accumulation (r07 sf1.0 fix) must equal a pure
    Decimal-arithmetic reference for arbitrary float inputs — no value
    of the inputs, group layout, or summation order may change it."""
    rows = [(i % keys, v) for i, v in enumerate(vals)]
    units = F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
    got = {
        r["k"]: r["t"]
        for r in spark.createDataFrame(rows, "k int, v double")
        .groupBy("k")
        .agg(
            (F.floor(F.sum(units).cast("double") / 1e4 + F.lit(0.5)) / 1e2).alias("t")
        )
        .collect()
    }
    ref: dict[int, int] = {}
    for k, v in rows:
        u = math.floor(v * 1e6 + 0.5)  # same IEEE ops as the engines
        ref[k] = ref.get(k, 0) + u
    for k, u in ref.items():
        expect = math.floor(float(decimal.Decimal(u)) / 1e4 + 0.5) / 1e2
        assert got[k] == expect, (k, got[k], expect)
