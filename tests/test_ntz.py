"""Timestamp-dtype drift armor.

Parquet written with ``isAdjustedToUTC=false`` (pyarrow's default for naive
pandas datetimes) is read by Spark 4 as ``TIMESTAMP_NTZ``, while the same
logical data written adjusted arrives as ``TIMESTAMP`` (LTZ). Functions like
``unix_micros`` accept only LTZ, so an operator that works under one reading
crashes under the other (this broke ``q_sessionize`` and
``q_range_join_nearby_events`` in the round-2 driver run). Every
timestamp-consuming operator must produce identical results from NTZ- and
LTZ-typed inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators.joins import range_join_within
from api_log_iceberg_test_spark.queries import analytics
from api_log_iceberg_test_spark.schema import load_table

# Queries that consume the events.ts / orders date columns arithmetically —
# the surface where NTZ-vs-LTZ dtype matters. Projection/agg queries that
# only carry timestamps through are exercised by the oracle-parity sweep.
TS_SENSITIVE = [
    "q_sessionize",
    "q_tumbling_window_batch",
    "q_hourly_rollup",
    "q_asof_join",
    # round-3 additions doing interval/epoch arithmetic on ts
    "q_funnel_conversion",
    "q_retention_cohorts",
    "q_asof_join_forward",
    "q_asof_join_nearest",
]


def _events_both_dtypes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType.typeName()
    if ts_type == "timestamp_ntz":
        ntz = ev
        ltz = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        ltz = ev
        ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return ntz, ltz


def test_range_join_ntz_ltz_identical(spark, sf_dir):
    ntz, ltz = _events_both_dtypes(spark, sf_dir)
    outs = []
    for ev in (ntz, ltz):
        errs = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
        )
        near = ev.select(F.col("event_id").alias("near_id"), F.col("ts").alias("near_ts"))
        out = range_join_within(
            errs, near, "err_ts", "near_ts", 300, ["err_id"], ["near_id"]
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_sessionize_ntz_ltz_identical(spark, sf_dir, tmp_path):
    # q_sessionize reads via load_table, so rewrite the events table in both
    # physical encodings and point the query at each copy.
    ntz, ltz = _events_both_dtypes(spark, sf_dir)
    results = []
    for tag, ev in (("ntz", ntz), ("ltz", ltz)):
        d = str(tmp_path / tag)
        ev.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
        out = analytics.q_sessionize(spark, d)
        results.append(sorted(tuple(r) for r in out.collect()))
    assert results[0] == results[1]
    assert len(results[0]) > 0


@pytest.mark.parametrize("qname", TS_SENSITIVE)
def test_ts_queries_run_on_current_testdata(spark, sf_dir, qname):
    # Whatever dtype the on-disk testdata currently yields, the query must
    # at least plan and execute (the driver reads with default configs).
    fn = getattr(analytics, qname)
    assert fn(spark, sf_dir).limit(5).count() >= 0
