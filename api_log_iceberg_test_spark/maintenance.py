"""Table maintenance: compaction, snapshot expiry, orphan cleanup.

The reference's test config flushes every 10 records (docker-compose.yaml:34)
— a small-file factory. It defers cleanup to the Iceberg ecosystem; our
engine schedules it (BASELINE.json names compaction explicitly):

- Iceberg catalog present → the stock procedures
  (``rewrite_data_files`` / ``expire_snapshots`` / ``remove_orphan_files``),
  issued via ``CALL`` — metadata-transactional, safe under concurrent
  writers.
- Plain-Parquet table (test environment) → :func:`compact_parquet_table`
  rewrites a directory to target-sized files with an atomic directory swap.

Scale notes: compaction at 100 TB must be incremental — pass a partition
predicate (``where``) so each run rewrites only recent partitions (e.g.
yesterday's ``days(time)`` partition), never the whole table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def rewrite_data_files(
    spark: SparkSession,
    table: str,
    where: str | None = None,
    target_file_size_bytes: int = 512 * 1024 * 1024,
) -> None:
    """Iceberg small-file compaction via the stock procedure."""
    catalog = table.split(".")[0]
    pred = f", where => '{where}'" if where else ""
    spark.sql(
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}'"
        f", options => map('target-file-size-bytes', '{target_file_size_bytes}')"
        f"{pred})"
    )


def expire_snapshots(spark: SparkSession, table: str, older_than: str) -> None:
    """Expire Iceberg snapshots older than a timestamp literal."""
    catalog = table.split(".")[0]
    spark.sql(
        f"CALL {catalog}.system.expire_snapshots(table => '{table}',"
        f" older_than => TIMESTAMP '{older_than}')"
    )


def remove_orphan_files(spark: SparkSession, table: str) -> None:
    catalog = table.split(".")[0]
    spark.sql(f"CALL {catalog}.system.remove_orphan_files(table => '{table}')")


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    partition_subdir: str | None = None,
) -> int:
    """Compact a Parquet directory to ~target-sized files.

    Reads the (sub)directory, coalesces to ceil(bytes/target) files, writes
    to a temp dir, then swaps atomically (rename). Returns the new file
    count. For partitioned tables pass ``partition_subdir`` to compact one
    partition per run (the incremental pattern).
    """
    root = os.path.join(path, partition_subdir) if partition_subdir else path
    df = spark.read.parquet(root)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_size_bytes))
    tmp = f"{root}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{root}__old_{uuid.uuid4().hex[:8]}"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    return n_files


def plan_compaction_bins(
    files,
    partition_cols: list[str],
    order_col: str,
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
):
    """Distributed compaction PLANNING: assign each small file to an output
    bin of ~``target_bytes`` within its partition (next-fit by running
    total: a file joins bin ``floor(preceding_cumsum / target)``).

    This is the planning half of ``rewrite_data_files`` — what Iceberg's
    BinPackStrategy computes before rewriting — expressed as a DataFrame
    op over the file inventory (in Iceberg, the ``.files`` metadata
    table), so the plan for a million-file table is itself distributed:
    one window per table partition, never a driver-side listing. Next-fit
    keeps time-adjacent files together (preserving clustering on the
    order column), unlike best-fit-decreasing which shuffles time order
    for marginally tighter bins; a bin may overflow target by less than
    one file, matching the "aim, don't split" behavior of file rewrites.

    Returns the inventory with a ``bin`` column; downstream each (partition,
    bin) group is one coalesced rewrite task.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        "bin", F.floor(prev_cum / F.lit(float(target_bytes))).cast("int")
    )
