"""Mergeable sketch aggregates: pre-computed rollups that still compose.

The 100 TB pattern for distinct counting: a plain COUNT(DISTINCT) over a
year of logs rescans the year; a *sketch* rollup stores one small binary
per (day, key) — built once per day on ingest — and any ad-hoc range query
(week, month, year, per-key or global) is a cheap union of sketches with
NO rescan. Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so the
whole flow is JVM-side codegen aggregates — no UDFs.

Estimates are approximate (HLL standard error ≈ 1.04/√2^lgK ≈ 1.6% at the
default lgK=12), so these operators are rows-only for the driver oracle;
pytest asserts the estimates against exact distinct counts within rsd
bounds, and — the load-bearing property — that merged-sketch estimates
EQUAL the estimate of the directly-built sketch over the union (merge
loses nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_sketches(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per day: (day, n_exact-free estimate, sketch binary).

    This is the materialized rollup a pipeline writes on ingest; the
    sketch column is what makes it mergeable later.
    """
    return (
        df.groupBy(F.to_date(F.col(time_col)).alias("day"))
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))
        .select(
            "day",
            F.hll_sketch_estimate("sketch").alias("est_distinct"),
            "sketch",
        )
    )


def hll_merge_estimate(daily: DataFrame) -> DataFrame:
    """Distinct estimate over ALL days by unioning the daily sketches —
    reads |days| small rows, never the raw data."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("est_total")
    )
