"""Join operators Spark lacks as single primitives: range join (bucketed).

(As-of join lives in ``queries.analytics.q_asof_join`` — union-marker +
window, one shuffle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    within_seconds: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with |left_time - right_time| ≤ within.

    A naive theta-join is a full cross product — quadratic and unplannable
    at scale. The scalable composition bucketizes time into ``within``-sized
    buckets and equi-joins each left row to its own and two neighboring
    buckets (right side exploded 3×), then refines exactly. Every pair with
    |Δt| ≤ within falls in the same or adjacent bucket, so recall is exact;
    the equi-join shuffles on compact (bucket) keys and AQE handles bucket
    skew. Cost: 3× the right side, vs |L|×|R| for the theta join.
    """
    # microsecond precision end-to-end: whole-second truncation would
    # misclassify pairs straddling the boundary (e.g. Δ=300.4s)
    # cast("timestamp_ltz") first: parquet written with isAdjustedToUTC=false
    # arrives as TIMESTAMP_NTZ (unix_micros rejects it); the cast is a no-op
    # on LTZ and only Δt is used, so any session-tz offset cancels. The
    # offset-cancels argument assumes a FIXED-offset session zone (UTC, the
    # build_session default): under a DST zone two events straddling a
    # transition would pick up different offsets and skew Δt by the DST gap.
    within_us = within_seconds * 1_000_000
    l = left.select(
        *left_cols, F.unix_micros(F.col(left_time).cast("timestamp_ltz")).alias("_lt")
    ).withColumn("_bucket", F.expr(f"_lt div {within_us}"))
    r = (
        right.select(
            *right_cols, F.unix_micros(F.col(right_time).cast("timestamp_ltz")).alias("_rt")
        )
        .withColumn("_b0", F.expr(f"_rt div {within_us}"))
        .withColumn("_bucket", F.explode(F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
    )
    # No pair-dedup is needed OR correct here: the left row has exactly one
    # bucket and the right row's three exploded buckets are distinct, so
    # each (left, right) pair can match at most once — a trailing
    # dropDuplicates over the projected columns would instead collapse
    # legitimately distinct pairs that merely project equal (and add a full
    # extra shuffle). (Review finding.)
    return (
        l.join(r, "_bucket")
        .filter(F.abs(F.col("_lt") - F.col("_rt")) <= within_us)
        .select(*left_cols, *right_cols)
    )
