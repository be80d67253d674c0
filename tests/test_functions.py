"""Property-based tests for scalar helpers (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from api_log_iceberg_test_spark.functions import duration_to_ms, ms_to_duration

_UNITS = {"ns": 1e-6, "us": 1e-3, "ms": 1.0, "s": 1000.0, "m": 60_000.0, "h": 3_600_000.0}


@pytest.fixture(scope="module")
def parse_fn(spark):
    """Compile the parse expression once; evaluate via a tiny DataFrame."""

    def parse(strings: list[str]) -> list[float]:
        df = spark.createDataFrame([(s,) for s in strings], ["d"])
        return [r["ms"] for r in df.select(duration_to_ms("d").alias("ms")).collect()]

    return parse


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=9999.99).map(lambda v: round(v, 2)),
            st.sampled_from(sorted(_UNITS)),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_duration_parse_any_unit(parse_fn, cases):
    got = parse_fn([f"{v}{u}" for v, u in cases])
    for (v, u), g in zip(cases, got):
        assert g == pytest.approx(v * _UNITS[u], rel=1e-9), (v, u, g)


def test_duration_parse_edge_cases(parse_fn):
    assert parse_fn(["4.21ms"])[0] == pytest.approx(4.21)
    assert parse_fn(["1.2s"])[0] == pytest.approx(1200.0)
    assert parse_fn(["150µs"])[0] == pytest.approx(0.15)
    assert parse_fn(["garbage"])[0] is None
    assert parse_fn([""])[0] is None


def test_ms_to_duration_roundtrip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(4.21,), (1200.0,), (0.15,)], ["ms"])
    out = [r["d"] for r in df.select(ms_to_duration(F.col("ms")).alias("d")).collect()]
    assert out == ["4.21ms", "1.2s", "0.15ms"]
