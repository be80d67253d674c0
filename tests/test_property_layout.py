"""Property-based armor for the partition-offset family (layout.py).

These operators replace the canonical scale-killer (an unpartitioned
global window) with range-repartition + per-partition work + a
|partitions|-row offset join. Their correctness must be invariant to
WHERE the sampled range boundaries fall — randomized inputs (duplicates,
negatives, skewed clumps) exercise boundary placements the fixed
fixtures can't.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from api_log_iceberg_test_spark.operators import layout

_unique_keys = st.lists(
    st.integers(-1000, 1000), min_size=1, max_size=40, unique=True
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(_unique_keys)
def test_dense_ids_are_exact_ranks(spark, keys):
    """Unique sort keys: dense_id must equal the key's rank in sorted
    order, regardless of range-boundary sampling."""
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {r["k"]: r["dense_id"] for r in layout.dense_ids(df, "k").collect()}
    expect = {k: i for i, k in enumerate(sorted(keys))}
    assert got == expect, keys


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.integers(-50, 50), min_size=1, max_size=40
    )  # duplicates allowed
)
def test_dense_ids_dense_and_monotone_with_duplicates(spark, keys):
    """Duplicate keys: ids stay a permutation of 0..n-1 and the sort key
    is nondecreasing along the id order (tie order itself is unspecified,
    matching the zipWithIndex caveat)."""
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    rows = layout.dense_ids(df, "k").collect()
    ids = sorted(r["dense_id"] for r in rows)
    assert ids == list(range(len(keys))), keys
    by_id = [r["k"] for r in sorted(rows, key=lambda r: r["dense_id"])]
    assert by_id == sorted(keys), keys


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_exclusive_prefix_sum_matches_cumsum(spark, pairs):
    """Exclusive prefix sum over unique order keys == shifted Python
    cumsum in sorted order."""
    df = spark.createDataFrame(pairs, "k bigint, v bigint")
    got = {
        r["k"]: r["prefix_sum"]
        for r in layout.exclusive_prefix_sum(df, "k", "v").collect()
    }
    acc, expect = 0, {}
    for k, v in sorted(pairs):
        expect[k] = acc
        acc += v
    assert got == expect, pairs


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_matches_bruteforce_property(spark, pts):
    """Pareto frontier (maximize both) == O(n²) dominance filter."""
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = sorted((r["x"], r["y"]) for r in layout.skyline2d(df).collect())
    expect = sorted(
        {
            (x, y)
            for x, y in pts
            if not any(
                (a >= x and b >= y and (a, b) != (x, y)) for a, b in pts
            )
        }
    )
    assert got == expect, pts


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    st.lists(st.integers(-1000, 1000), min_size=0, max_size=5, unique=True),
)
def test_range_bucket_ids_properties_random(spark, keys, cuts):
    """r13 literal-boundary bucketing: on ANY multiset (duplicates,
    negatives, clumps) and under BOTH sampled and caller-supplied
    boundaries, bucket ids must be monotone non-decreasing in the key
    and equal keys must share a bucket; with explicit ascending cuts the
    id must equal the exact cut-count formula."""
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    for bounds in (None, sorted(cuts)):
        rows = layout.range_bucket_ids(
            df, "k", boundaries=bounds, bucket_col="b"
        ).collect()
        by_key: dict[int, set[int]] = {}
        for r in rows:
            by_key.setdefault(r["k"], set()).add(r["b"])
        assert all(len(bs) == 1 for bs in by_key.values()), by_key
        ordered = [next(iter(by_key[k])) for k in sorted(by_key)]
        assert ordered == sorted(ordered)
        if bounds is not None:
            want = {k: sum(1 for c in bounds if k >= c) for k in by_key}
            assert {k: next(iter(bs)) for k, bs in by_key.items()} == want


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(-10**6, 10**6), st.integers(-50, 50)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_exclusive_prefix_max_matches_spec_random(spark, pairs):
    """exclusive_prefix_max over the literal-boundary plan must equal the
    semantic spec (running max over sorted order, NULL first) on random
    keys/values — the cut points may land anywhere, including all keys
    in one bucket."""
    df = spark.createDataFrame(pairs, "k long, v long")
    got = {
        r["k"]: r["pm"]
        for r in layout.exclusive_prefix_max(df, "k", "v", "pm").collect()
    }
    best, want = None, {}
    for k, v in sorted(pairs):
        want[k] = best
        best = v if best is None else max(best, v)
    assert got == want
