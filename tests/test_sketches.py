"""HLL sketch rollups: estimate accuracy and merge losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import sketches
from api_log_iceberg_test_spark.schema import load_table


def test_daily_estimates_near_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.hll_daily_sketches(ev, time_col="ts", value_col="user_id")
    got = {r["day"]: r["est_distinct"] for r in daily.collect()}
    want = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for day, est in got.items():
        # lgK=12 → rsd ~1.6%; allow 5% plus slack for tiny days
        assert abs(est - want[day]) <= max(3, 0.05 * want[day]), (day, est, want[day])


def test_merged_sketch_equals_direct_sketch(spark, sf_dir):
    """The property that makes rollups usable: union of daily sketches gives
    EXACTLY the estimate of one sketch built over all the raw data."""
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.hll_daily_sketches(ev, time_col="ts", value_col="user_id")
    merged = sketches.hll_merge_estimate(daily).collect()[0]["est_total"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert merged == direct
