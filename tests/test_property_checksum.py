"""Property-based armor for the order-independent table checksum.

The operator's whole value proposition is two invariances and one
sensitivity: the checksum must NOT change under row reordering or
repartitioning (modular sum is commutative — this is what lets both
sides of a 100 TB migration compute it without a global sort), and it
MUST change when any single value changes. Random frames exercise all
three.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators.registry import table_checksum

_rows = st.lists(
    st.tuples(
        st.integers(0, 10**9),  # id
        st.sampled_from(["A", "B", "C"]),  # slice
        st.integers(-(10**6), 10**6),  # value
    ),
    min_size=1,
    max_size=30,
)


def _checksum_map(spark, data, n_parts):
    df = spark.createDataFrame(data, "id long, grp string, val long").repartition(
        n_parts
    )
    canon = F.concat_ws(
        "|",
        F.col("id").cast("string"),
        F.col("grp"),
        F.col("val").cast("string"),
    )
    return {
        r["grp"]: (r["n_rows"], r["checksum"])
        for r in table_checksum(df, canon, "grp").collect()
    }


@settings(max_examples=8, deadline=None, derandomize=True)
@given(_rows)
def test_checksum_invariant_to_order_and_partitioning(spark, rows):
    base = _checksum_map(spark, rows, 1)
    assert base == _checksum_map(spark, list(reversed(rows)), 7), rows
    assert base == _checksum_map(spark, sorted(rows), 3), rows


@settings(max_examples=8, deadline=None, derandomize=True)
@given(_rows, st.integers(0, 10**6))
def test_checksum_detects_any_single_value_change(spark, rows, bump):
    base = _checksum_map(spark, rows, 2)
    changed = list(rows)
    rid, grp, val = changed[0]
    changed[0] = (rid, grp, val + 1 + bump % 1000)
    got = _checksum_map(spark, changed, 2)
    assert got[grp] != base[grp], (rows, changed)
    for g in base:  # untouched slices keep their checksum
        if g != grp:
            assert got[g] == base[g], (g, rows)
