"""Schemas.

The reference's one fact table is ``aistor.logs.api`` with a fixed,
system-defined 14-column flat schema (reference ``README.md:172-189``;
SURVEY.md §1.2). camelCase column names are load-bearing — the reference's
Trino queries use them verbatim (README.md:145,163).

``requestTime`` / ``timeToFirstByte`` are *strings* holding durations like
``"4.21ms"`` (README.md:183-184); parsing to milliseconds is a derived
operation (see :mod:`api_log_iceberg_test_spark.functions`), never stored.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Reference README.md:174-189, in documented column order.
API_LOG_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("bucket", T.StringType(), nullable=True),
        T.StructField("object", T.StringType(), nullable=True),
        T.StructField("httpStatusCode", T.IntegerType(), nullable=False),
        T.StructField("inputBytes", T.LongType(), nullable=False),
        T.StructField("outputBytes", T.LongType(), nullable=False),
        T.StructField("requestTime", T.StringType(), nullable=False),
        T.StructField("timeToFirstByte", T.StringType(), nullable=False),
        T.StructField("sourceHost", T.StringType(), nullable=True),
        T.StructField("userAgent", T.StringType(), nullable=True),
        T.StructField("accessKey", T.StringType(), nullable=True),
        T.StructField("requestId", T.StringType(), nullable=False),
        T.StructField("node", T.StringType(), nullable=False),
    ]
)

API_LOG_COLUMNS = [f.name for f in API_LOG_SCHEMA.fields]

#: The nine S3 op kinds and their workload weights
#: (reference generate-api-logs.sh:74-120). Cumulative `RANDOM % 100` ladder.
OP_WEIGHTS: list[tuple[str, int]] = [
    ("ListObjectsV2", 30),
    ("GetObject", 25),
    ("HeadObject", 20),
    ("PutObject", 10),
    ("CopyObject", 5),
    ("DeleteObject", 5),
    ("ListBuckets", 2),
    ("GetObjectTagging", 2),
    ("StatObject", 1),
]

assert sum(w for _, w in OP_WEIGHTS) == 100

#: Driver testdata tables (TESTDATA.md) — TPC-H-ish star schema + events +
#: extension tables. The reference's `api` table has no parquet fixture, so
#: its query shapes are exercised against `events` (FIXTURES.md §1) and
#: against generator output in unit tests.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


from functools import lru_cache


def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Column names stored as parquet TIMESTAMP(NANOS) in `path`.

    Spark 4 can't map nanos to TimestampType; with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as LongType
    (ns since epoch) and we convert to microsecond timestamps on read. One
    driver-side footer read per path — O(1) regardless of data size.
    The cache keys on the file's (mtime, size) as well as its path, so a
    rewritten file is re-inspected instead of served a stale footer schema
    (review finding: a bare lru_cache silently mis-converted after
    overwrite)."""
    import os

    try:
        st = os.stat(path)
        sig = (st.st_mtime_ns, st.st_size)
    except OSError:  # globs/directories: stat the path string only
        sig = (0, 0)
    return _nanos_timestamp_columns_cached(path, sig)


@lru_cache(maxsize=256)
def _nanos_timestamp_columns_cached(
    path: str, sig: tuple[int, int]
) -> tuple[str, ...]:
    import glob
    import os

    import pyarrow.parquet as pq

    # Spark writes a table as a directory of part files; the footer of any
    # one part carries the schema. pq.read_schema only accepts a file.
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        path = parts[0]
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table_time_range(
    spark,
    sf_dir: str,
    name: str,
    time_col: str,
    lower: str | None = None,
    upper: str | None = None,
):
    """Read a table with a time-range predicate that actually pushes down.

    For nanos-stored timestamp columns, a filter on the *converted* column
    (``timestamp_micros(ts div 1000) > T``) cannot reach the Parquet scan —
    Catalyst can't invert the conversion — so row-group pruning is lost.
    This helper applies the equivalent raw int64-nanos predicate *before*
    conversion; ``.explain`` then shows ``PushedFilters: [GreaterThan(ts,...)]``
    and at 100 TB the scan skips every row group outside the range.
    Non-nanos columns just filter on the timestamp directly (already
    pushable).
    """
    import datetime as dt

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    df = _read_parquet_cached_schema(spark, path)
    ns_cols = _nanos_timestamp_columns(path)

    def to_ns(ts_str: str) -> int:
        d = dt.datetime.fromisoformat(ts_str).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp() * 1_000_000) * 1000

    if time_col in ns_cols:
        if lower is not None:
            df = df.filter(F.col(time_col) > F.lit(to_ns(lower)))
        if upper is not None:
            df = df.filter(F.col(time_col) <= F.lit(to_ns(upper)))
    else:
        if lower is not None:
            df = df.filter(F.col(time_col) > F.to_timestamp(F.lit(lower)))
        if upper is not None:
            df = df.filter(F.col(time_col) <= F.to_timestamp(F.lit(upper)))
    for col in ns_cols:
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def fan_out(df, min_parallelism: int | None = None):
    """Round-robin repartition ONLY when the scan yields fewer partitions
    than cores.

    Compute-heavy narrow projections (regex token metrics, shingling) are
    otherwise bound to the scan's task count — a single-file, single-row-
    group input runs them on ONE core regardless of cluster size. When the
    scan is already wide (the 100 TB case: thousands of files/row groups),
    this is a no-op, so the extra exchange never appears in at-scale plans.
    Row order within partitions changes, so callers must be order-
    insensitive past this point (aggregates/sorted outputs — true for every
    registered query).
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_rows_df(spark, rows, schema):
    """Small driver-local row list as a DataFrame, via the Arrow path.

    ``spark.createDataFrame(list)`` parallelizes PICKLED Python rows over
    ``defaultParallelism`` slices: every downstream action then runs that
    many Python-worker tasks just to deserialize a handful of rows
    (~0.4 s per action on local[32], measured; at cluster scale the same
    tasks serialize behind executor round-trips — optimization guide §4:
    keep the Python boundary off the query path). Routing the same rows
    through a pandas DataFrame takes Spark's Arrow converter instead: the
    rows ship as Arrow batches decoded JVM-side, no Python worker at
    execution time (~0.07 s per action, measured). Values, column names
    and declared types are identical on both paths (verified for
    long/int/double/string/boolean row shapes).

    Falls back to the plain path when pandas cannot represent the rows
    faithfully: an empty list, or a None anywhere (pandas would coerce a
    numeric column with None to float64/NaN — a silent type change).
    """
    # ADVICE r15: normalize up front — the any() None-scan below would
    # partially consume a generator input, silently truncating the frame.
    rows = list(rows)
    if rows and not any(v is None for r in rows for v in r):
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame(rows), schema=schema)
    return spark.createDataFrame(rows, schema)


#: Spark read-schema per (path, mtime, size) — metadata only, never data.
#: spark.read.parquet() runs a one-task schema-inference job at DataFrame
#: CONSTRUCTION time; a 6-table join query paid six such jobs (~0.3-0.5 s
#: of pure scheduling at bench scale, and six driver round-trips on a real
#: cluster) before any computation started. Passing the cached StructType
#: via .schema(...) skips inference; the cache key includes the file's
#: (mtime_ns, size) so a rewritten file is re-inferred, mirroring
#: _nanos_timestamp_columns_cached. The cached object is exactly what
#: inference returned, so plans are byte-identical (guide §1.2: remove
#: redundant passes — here, redundant metadata jobs).
_read_schema_cache: dict = {}


def _read_parquet_cached_schema(spark, path: str):
    import os

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, 0, 0)
    schema = _read_schema_cache.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _read_schema_cache[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark, sf_dir: str, name: str):
    """Read one driver testdata table as a DataFrame.

    Nanosecond parquet timestamps are converted to Spark TimestampType
    (microseconds, truncating) so event-time semantics match the DuckDB
    oracle, which also compares at µs after canonicalization.
    """
    from pyspark.sql import functions as F

    # The caller may hand us a stock SparkSession (the driver does). Both
    # confs are runtime-settable SQL confs and required for correct reads:
    # nanos parquet timestamps otherwise abort the scan (PARQUET_TYPE_ILLEGAL)
    # and non-UTC session timezones skew timestamp comparisons vs the oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    path = f"{sf_dir}/{name}.parquet"
    df = _read_parquet_cached_schema(spark, path)
    for col in _nanos_timestamp_columns(path):
        # Only convert if the scan actually surfaced the column as a long
        # (TIMESTAMP(NANOS) + nanosAsLong). INT96 timestamps also read as
        # timestamp[ns] in the pyarrow footer but Spark maps them to
        # TimestampType directly — converting those would be a type error.
        if df.schema[col].dataType.typeName() == "long":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df
