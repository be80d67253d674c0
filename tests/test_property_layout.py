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
