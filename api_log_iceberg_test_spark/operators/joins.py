"""Join operators Spark lacks as single primitives: range join (bucketed).

(As-of join lives in ``queries.analytics.q_asof_join`` — union-marker +
window, one shuffle.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    bits_log2: int = 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi join with a Bloom-filter prefilter, entirely in DataFrame ops.

    The gap this fills: a key set too large to broadcast as a hash
    relation forces a full shuffle of the fact table for a plain semi
    join. A Bloom filter compresses ANY key-set size to a fixed
    2^bits_log2-bit bitmap (here 2^16 bits = 1024 64-bit words), so the
    membership test runs map-side and only candidates reach the exact
    residual join. Spark's own runtime bloom pruning
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
    idea inside the optimizer; ``bloom_filter_agg`` is not exposed to SQL,
    so this is the declarative-API form.

    Build: each key sets ``n_hashes`` bits (md5-derived positions, portable
    across engines); a ``bit_or`` aggregate folds them into ≤1024 (word,
    bits) rows — fixed size regardless of |keys|. Probe: the fact side
    derives the same positions and broadcast-joins the word table once per
    hash, keeping rows whose bit is set in ALL of them (no false
    negatives, by construction). An exact ``left_semi`` join then removes
    false positives, so the RESULT equals the plain semi join — the bloom
    stage only changes how many rows pay the final shuffle.
    """
    mask = (1 << bits_log2) - 1

    def positions(col: Column) -> list[Column]:
        s = col.cast("string")
        return [
            F.conv(F.substring(F.md5(s), 1 + 8 * i, 8), 16, 10)
            .cast("bigint")
            .bitwiseAND(F.lit(mask))
            for i in range(n_hashes)
        ]

    # shiftleft's bit count must be a literal in the Python API — the
    # variable-shift form goes through SQL expressions over named columns
    bit_of = "shiftleft(CAST(1 AS BIGINT), CAST(pmod({pos}, 64) AS INT))"
    filtered = fact
    key_col = F.col(fact_key)
    for i, (kpos, fpos) in enumerate(
        zip(positions(F.col(keys_key)), positions(key_col))
    ):
        words = (
            keys.withColumn("_pos", kpos)
            .select(
                F.shiftright(F.col("_pos"), 6).alias(f"_w{i}"),
                F.expr(bit_of.format(pos="_pos")).alias("_b"),
            )
            .groupBy(f"_w{i}")
            .agg(F.bit_or("_b").alias(f"_bits{i}"))
        )
        filtered = (
            filtered.withColumn(f"_fpos{i}", fpos)
            .withColumn(f"_w{i}", F.shiftright(F.col(f"_fpos{i}"), 6))
            .join(F.broadcast(words), f"_w{i}", "left")
            .filter(
                F.coalesce(
                    F.col(f"_bits{i}").bitwiseAND(
                        F.expr(bit_of.format(pos=f"_fpos{i}"))
                    ),
                    F.lit(0),
                )
                != 0
            )
            .drop(f"_w{i}", f"_bits{i}", f"_fpos{i}")
        )
    return filtered.join(
        keys.select(F.col(keys_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )
