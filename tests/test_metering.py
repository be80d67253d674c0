"""G2/G3: rate-source streaming generator + throughput metering."""

from __future__ import annotations

import time

from api_log_iceberg_test_spark.generator import (
    generate_api_logs,
    generate_api_logs_stream,
)
from api_log_iceberg_test_spark.metering import RateListener, measure_batch
from api_log_iceberg_test_spark.schema import API_LOG_COLUMNS


def test_batch_throughput(spark):
    rep = measure_batch(generate_api_logs(spark, 10_000, seed=31))
    assert rep.total_rows == 10_000
    assert rep.rows_per_sec > 0


def test_rate_stream_generator(spark, tmp_path):
    """G2: the continuous generator (rate source) produces api-log rows."""
    stream = generate_api_logs_stream(spark, rows_per_second=200)
    assert stream.isStreaming
    assert [f for f in stream.columns] == API_LOG_COLUMNS

    listener = RateListener()
    spark.streams.addListener(listener)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # generous deadline: under heavy host load the first micro-batch
        # alone can take >30s to schedule (observed when a concurrent
        # local[32] session saturates the box) — the assertion is about
        # row production, not latency
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM rate_smoke").collect()[0]["c"]
            if n >= 100:
                break
            time.sleep(1)
        assert n >= 100, f"only {n} rows after 120s"
        ops = {r["name"] for r in spark.sql("SELECT DISTINCT name FROM rate_smoke").collect()}
        assert "GetObject" in ops or "ListObjectsV2" in ops
    finally:
        q.stop()
        spark.streams.removeListener(listener)
    assert listener.total_rows >= 100
