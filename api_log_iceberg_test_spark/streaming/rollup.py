"""Incremental rollup maintenance — the hypertable-continuous-aggregate
analog on Spark.

A streaming source feeds ``foreachBatch``; each micro-batch's partial
aggregate is MERGED into a persistent rollup table keyed on the window
bucket, by summing the additive components (count / sum) — so the rollup
is exact after every commit without ever rescanning history. Averages and
other non-additive metrics derive from the additive ones at read time.

Scale notes: the per-batch aggregate is tiny (one row per touched bucket ×
key), so the merge join broadcasts it against the rollup table; with an
Iceberg sink this becomes ``MERGE INTO`` with copy-on-write handled by the
table format. The parquet fallback here rewrites only the rollup table
(bucket-count-sized, not data-sized). Exactly-once comes from the
streaming checkpoint + idempotent overwrite of the rollup output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: additive rollup schema: one row per (bucket_start, name)
_KEYS = ["bucket_start", "name"]


def _batch_partial(batch: DataFrame, time_col: str, key_col: str) -> DataFrame:
    return (
        batch.groupBy(
            F.date_trunc("hour", F.col(time_col)).alias("bucket_start"),
            F.col(key_col).alias("name"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("outputBytes").alias("sum_out"),
        )
    )


def merge_rollup(existing: DataFrame, partial: DataFrame) -> DataFrame:
    """Additive merge: full-outer on the bucket key, components summed."""
    e = existing.select(
        *_KEYS, F.col("cnt").alias("e_cnt"), F.col("sum_out").alias("e_sum")
    )
    p = partial.select(
        *_KEYS, F.col("cnt").alias("p_cnt"), F.col("sum_out").alias("p_sum")
    )
    return (
        e.join(p, _KEYS, "full_outer")
        .select(
            *_KEYS,
            (F.coalesce("e_cnt", F.lit(0)) + F.coalesce("p_cnt", F.lit(0))).alias("cnt"),
            (F.coalesce("e_sum", F.lit(0)) + F.coalesce("p_sum", F.lit(0))).alias(
                "sum_out"
            ),
        )
    )


def start_incremental_rollup(
    stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    time_col: str = "time",
    key_col: str = "name",
):
    """Maintain an hourly (bucket, name) → (cnt, sum_out) rollup table
    incrementally from a stream. Returns the StreamingQuery."""
    spark = stream.sparkSession

    def upsert(batch: DataFrame, batch_id: int) -> None:
        import shutil

        partial = _batch_partial(batch, time_col, key_col)
        if os.path.exists(rollup_dir):
            existing = spark.read.parquet(rollup_dir)
            merged = merge_rollup(existing, partial)
        else:
            merged = partial
        # write-then-swap so the read above isn't clobbered mid-plan; with
        # an Iceberg sink this whole dance is a single atomic MERGE INTO
        tmp = rollup_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(rollup_dir):
            shutil.rmtree(rollup_dir)
        os.rename(tmp, rollup_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Read the rollup with derived (non-additive) metrics."""
    r = spark.read.parquet(rollup_dir)
    return r.select(
        *_KEYS,
        "cnt",
        "sum_out",
        F.round(F.col("sum_out") / F.col("cnt"), 4).alias("avg_out"),
    )
