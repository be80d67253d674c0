"""Custom Python DataSource: schema, determinism, partition planning,
workload mix parity with the documented weights."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.datasource import ApiLogDataSource
from api_log_iceberg_test_spark.schema import API_LOG_COLUMNS, OP_WEIGHTS


def _read(spark, **opts):
    spark.dataSource.register(ApiLogDataSource)
    r = spark.read.format("apilogs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_count(spark):
    df = _read(spark, rows=1000, partitions=4, seed=7)
    assert df.columns == API_LOG_COLUMNS
    assert df.count() == 1000
    assert df.select("requestId").distinct().count() == 1000


def test_partition_planning(spark):
    df = _read(spark, rows=1000, partitions=4, seed=7)
    assert df.rdd.getNumPartitions() == 4
    # uneven split: last partition gets the remainder
    df2 = _read(spark, rows=10, partitions=4, seed=7)
    assert df2.count() == 10


def test_deterministic_replay(spark):
    a = sorted(_read(spark, rows=300, partitions=3, seed=11).collect())
    b = sorted(_read(spark, rows=300, partitions=3, seed=11).collect())
    assert a == b
    c = sorted(_read(spark, rows=300, partitions=3, seed=12).collect())
    assert a != c


def test_op_mix_matches_documented_weights(spark):
    df = _read(spark, rows=20000, partitions=8, seed=5)
    got = Counter({r["name"]: r["cnt"] for r in
                   df.groupBy("name").agg(F.count(F.lit(1)).alias("cnt")).collect()})
    for op, weight in OP_WEIGHTS:
        share = 100.0 * got[op] / 20000
        assert abs(share - weight) <= 3.0, (op, share, weight)
