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


def publish_version(
    root: str,
    new_version: str,
    retain_seconds: float = 60.0,
    versions_dir: str | None = None,
) -> None:
    """Atomically publish ``new_version`` as the live contents of ``root``.

    The commit primitive shared by :func:`compact_parquet_table` and
    ``ingest.commit_staged`` (the dual-cadence staged-commit path): data
    lives in versioned directories (siblings ``<root>__v<uuid>`` by
    default, or inside ``versions_dir`` when the caller must keep them
    out of an enclosing table root — per-partition compaction), ``root``
    is a symlink, and the commit is ``os.rename`` of a prepared symlink
    over the live one — a single atomic syscall. Handles the three root
    states: absent (first publish just links), plain directory (one-time
    migration to the versioned layout — rename+symlink, the only
    non-atomic step this layout ever performs), symlink (atomic swap).

    Superseded versions survive at least ``retain_seconds`` AFTER THE
    SWAP THAT REPLACED THEM (and the just-replaced version always
    survives this call) so readers that pinned a version at open time
    (:func:`read_compacted_table`) finish cleanly — the parquet-fallback
    analogue of ``expire_snapshots``. The retention clock keys on the
    version dir's mtime, which this function re-stamps at supersede time
    (a version dir is immutable once published, so its natural mtime
    would mean "created at" — under back-to-back swaps that would expire
    a version almost immediately after it was replaced, rug-pulling a
    reader that pinned it within the window; ADVICE r10).
    """
    import time

    parent = os.path.dirname(root) or "."
    vdir = versions_dir or parent
    # the version-family prefix is derived from the version NAME, not from
    # root: versions_dir layouts name versions after the flattened subdir
    prefix = os.path.basename(new_version).rsplit("__v", 1)[0] + "__v"
    current = None
    if os.path.islink(root):
        current = os.path.realpath(root)
    elif os.path.exists(root):
        # one-time migration: plain dir → versioned layout
        os.makedirs(vdir, exist_ok=True)
        current = os.path.join(vdir, f"{prefix}{uuid.uuid4().hex[:8]}")
        os.rename(root, current)
        os.symlink(os.path.relpath(current, parent), root)
    if current is None:
        os.symlink(os.path.relpath(new_version, parent), root)
        return
    swap = f"{root}__swap_{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.relpath(new_version, parent), swap)
    os.rename(swap, root)
    # stamp "superseded at" on the version we just replaced, so the
    # retention test below measures time-since-supersede, not age
    if os.path.isdir(current):
        os.utime(current, None)
    # expire: keep the live version, the just-replaced one (in-flight
    # readers may hold its file list), and anything superseded less than
    # retain_seconds ago; drop the rest
    keep = {os.path.realpath(current), os.path.realpath(new_version)}
    cutoff = time.time() - retain_seconds
    for entry in os.listdir(vdir):
        full = os.path.join(vdir, entry)
        if (
            entry.startswith(prefix)
            and os.path.realpath(full) not in keep
            and os.path.isdir(full)
            and os.path.getmtime(full) < cutoff
        ):
            shutil.rmtree(full)


def read_compacted_table(spark: SparkSession, path: str):
    """Open a (possibly version-symlinked) parquet table PINNED to the
    version live at call time.

    This is the reader half of :func:`compact_parquet_table`'s commit
    protocol — the parquet-fallback analogue of a table format's snapshot
    pin. Resolving the symlink BEFORE listing means the scan's file paths
    go through the immutable versioned directory, so a swap that lands
    mid-query repoints ``path`` without touching the files this reader
    already listed (they survive for ``retain_seconds``). Reading through
    the un-resolved symlink instead would re-resolve per file open and
    rug-pull the scan — the failure mode the concurrency test provokes.
    """
    return spark.read.parquet(os.path.realpath(path))


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    partition_subdir: str | None = None,
    retain_seconds: float = 60.0,
) -> int:
    """Compact a Parquet directory to ~target-sized files, atomically
    under concurrent readers.

    Reads the (sub)directory, coalesces to ceil(bytes/target) files, and
    commits by SYMLINK SWAP: data lives in versioned sibling directories
    (``<root>__v<uuid>``) and ``root`` is a symlink whose replacement —
    ``os.rename`` of one symlink over another — is a single atomic
    syscall. The pre-r10 form renamed the directory itself, which left a
    window where ``root`` did not exist (reader: path-not-found) and
    deleted the old files immediately (reader that had already listed
    them: file-not-found mid-scan). Now a reader that pins the version at
    open time (:func:`read_compacted_table`) sees the OLD version or the
    NEW version, never a gap — proven under a concurrent reader/compactor
    loop in tests/test_storage.py.

    Retention is TIME-based, like ``expire_snapshots``'s ``older_than``:
    a superseded version survives at least ``retain_seconds`` after the
    swap that replaced it (``publish_version`` re-stamps mtime at
    supersede time; ADVICE r10) plus the just-replaced version always
    survives this call, so any reader shorter than ``retain_seconds`` is
    safe no matter how many swaps land mid-scan. Pass
    ``retain_seconds=0`` during a read quiesce to shrink to the live +
    just-replaced pair.

    With ``partition_subdir`` the version directories live OUTSIDE the
    table root, in ``<path>__versions/`` (ADVICE r10: siblings inside the
    root would surface in whole-table reads as duplicate rows or bogus
    partition values like ``_day=...__v1a2b``); the partition subdir
    itself becomes a symlink pointing out, whose NAME still carries the
    partition key — whole-root partition-discovery reads stay clean,
    proven in tests/test_storage.py.

    First call on a plain directory migrates it to the versioned layout —
    that one-time step is rename+symlink (two syscalls, not atomic; run
    it before opening the table to readers). Concurrent WRITERS are out
    of scope (files appended between the read and the swap would be
    dropped) — that is what the Iceberg path's metadata-transactional
    ``rewrite_data_files`` is for; on plain parquet, compact closed
    partitions only (``partition_subdir``).

    Returns the new file count.
    """
    root = os.path.join(path, partition_subdir) if partition_subdir else path
    df = spark.read.parquet(os.path.realpath(root))
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(root, followlinks=True)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_size_bytes))
    if partition_subdir:
        # versions must NOT be siblings of the partition dir — they would
        # sit inside the table root and pollute whole-table reads
        versions_dir = path.rstrip("/") + "__versions"
        os.makedirs(versions_dir, exist_ok=True)
        flat = partition_subdir.strip("/").replace("/", "__")
        new_version = os.path.join(versions_dir, f"{flat}__v{uuid.uuid4().hex[:8]}")
    else:
        versions_dir = None
        new_version = f"{root}__v{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(new_version)
    publish_version(root, new_version, retain_seconds, versions_dir=versions_dir)
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
