"""Physical layout helpers: bucketed tables for exchange-free joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Bucketing
both tables by the join key at write time (``bucketBy``) pre-shuffles them
once; every later equi-join on that key then plans WITHOUT an Exchange on
the bucketed sides — verified by plan assertion in tests/test_storage.py.
This is the plain-Spark analog of Iceberg's bucket partition transform
(``bucket(N, key)``), which is what the production Iceberg table would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a managed table bucketed (and optionally sorted) by key."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def cojoin_bucketed(spark: SparkSession, left: str, right: str, key_l: str, key_r: str) -> DataFrame:
    """Equi-join two same-bucketed tables — no exchange on either side."""
    l = spark.table(left)
    r = spark.table(right)
    return l.join(r, l[key_l] == r[key_r])
