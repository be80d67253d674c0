"""Log-record sources beyond Parquet: JSON-lines and CSV, batch + streaming.

The reference's pipeline receives log records from the serving node's
in-process buffer (README.md:193-202) — an implementation detail of the
closed MinIO binary. Real deployments of a log-analytics engine also ingest
from shipped files: JSONL (the de-facto log-shipping format) and CSV
exports. These readers bind the reference's fixed 14-column schema
(schema.py, README.md:174-189) to those formats with production failure
semantics:

- **Explicit schema, never inference.** Schema inference is a full extra
  pass over the data (prohibitive at scale) and non-deterministic under
  drift; the reference's schema is fixed and system-defined.
- **PERMISSIVE + corrupt-record capture.** A malformed line lands in
  ``_corrupt_record`` instead of failing the job; at 100 TB there WILL be
  torn/garbled lines, and poisoning a multi-hour job on one of them is
  wrong. :func:`corrupt_records` / :func:`valid_records` split the result
  for quarantine-vs-load routing.
- **Streaming variants** return unbounded DataFrames for
  :func:`api_log_iceberg_test_spark.ingest.start_ingest` — same schema, so
  the whole ingest pipeline is source-format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import API_LOG_COLUMNS, API_LOG_SCHEMA

_CORRUPT = "_corrupt_record"

#: Reader schema = log schema + the corrupt-record capture column.
_READ_SCHEMA = T.StructType(
    list(API_LOG_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
)

#: ISO-8601 with microseconds, UTC — matches the generator's timestamps and
#: the reference's Trino timestamp literal format.
_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_jsonl_logs(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read JSON-lines api-log records.

    Malformed lines surface as rows where every schema column is NULL and
    ``_corrupt_record`` holds the raw line (Spark PERMISSIVE mode).
    """
    return (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampFormat", _TS_FORMAT)
        .json(path)
    )


def read_csv_logs(
    spark: SparkSession,
    path: str,
    header: bool = True,
    null_value: str | None = r"\N",
) -> DataFrame:
    """Batch-read CSV api-log records (explicit schema, no inference).

    CSV cannot distinguish NULL from empty string natively; ``null_value``
    is the NULL sentinel (default ``\\N``, the classic mysqldump/Hive
    convention) — the writer must use the same sentinel for faithful
    round-trips. Pass ``None`` to fall back to Spark's default (empty
    field → NULL).
    """
    reader = (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("timestampFormat", _TS_FORMAT)
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def stream_jsonl_logs(spark: SparkSession, path: str) -> DataFrame:
    """Streaming JSONL source for :func:`ingest.start_ingest` — new files in
    ``path`` become micro-batches (the log-shipper drop-directory pattern)."""
    return (
        spark.readStream.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampFormat", _TS_FORMAT)
        .json(path)
        .where(F.col(_CORRUPT).isNull())
        .select(*API_LOG_COLUMNS)
    )


def valid_records(df: DataFrame) -> DataFrame:
    """Well-formed rows only, schema identical to API_LOG_SCHEMA."""
    return df.where(F.col(_CORRUPT).isNull()).select(*API_LOG_COLUMNS)


def corrupt_records(df: DataFrame) -> DataFrame:
    """Quarantine stream: the raw text of every malformed input line.

    Spark refuses a lazy query that references ONLY the corrupt-record
    column of a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    parse must be materialized first, so the input is cached here. In a
    production quarantine flow the parsed batch is persisted once and both
    :func:`valid_records` and this split read the materialized result.
    """
    return df.cache().where(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
