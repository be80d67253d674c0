"""Generator (reference G1-G3) behavior: schema, determinism, op mix."""

from __future__ import annotations

from api_log_iceberg_test_spark.generator import generate_api_logs
from api_log_iceberg_test_spark.schema import API_LOG_SCHEMA, OP_WEIGHTS


def test_schema_matches_reference(spark):
    df = generate_api_logs(spark, 100, seed=1)
    assert [f.name for f in df.schema.fields] == [f.name for f in API_LOG_SCHEMA.fields]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in API_LOG_SCHEMA.fields}
    assert got == want


def test_deterministic(spark):
    a = generate_api_logs(spark, 500, seed=42).collect()
    b = generate_api_logs(spark, 500, seed=42).collect()
    assert a == b


def test_op_mix_weights(spark):
    """Empirical op mix tracks generate-api-logs.sh:74-120 weights (±3pp)."""
    n = 20_000
    df = generate_api_logs(spark, n, seed=7)
    counts = {r["name"]: r["cnt"] for r in df.groupBy("name").count().withColumnRenamed("count", "cnt").collect()}
    for op, weight in OP_WEIGHTS:
        frac = counts.get(op, 0) / n
        assert abs(frac - weight / 100) < 0.03, (op, frac, weight)


def test_request_ids_unique_and_status_mix(spark):
    df = generate_api_logs(spark, 5000, seed=3)
    assert df.select("requestId").distinct().count() == 5000
    errs = df.filter("httpStatusCode >= 400").count()
    assert 0.04 < errs / 5000 < 0.13  # ~8% error tail (FIXTURES.md §1)


def test_time_span_multiday(spark):
    from pyspark.sql import functions as F

    df = generate_api_logs(spark, 2000, seed=5, span_days=7)
    days = df.select(F.countDistinct(F.to_date("time")).alias("d")).collect()[0]["d"]
    assert days >= 7
