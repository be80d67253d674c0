"""Streaming log ingestion — the reference's core pipeline, Spark-native.

Reference semantics (README.md:191-212, SURVEY.md §3.1): each node buffers
api-log records in memory, flushes to a Parquet file when the buffer reaches
``PARQUET_FLUSH_COUNT`` records or ``PARQUET_FLUSH_INTERVAL`` elapses, drops
a 0-byte index marker per file, and a lock-elected leader atomically commits
all marked files to the Iceberg table every ``ICEBERG_COMMIT_INTERVAL``.

Spark-native restatement: one Structured Streaming query subsumes buffer,
flush, marker, leader and commit:

- micro-batch accumulation ≈ the in-memory buffer;
- ``Trigger.ProcessingTime(flush_interval)`` ≈ the flush interval;
- ``maxRecordsPerFile`` ≈ the flush count (bounds Parquet file size);
- the sink's transactional commit ≈ marker + leader election + atomic
  commit: an Iceberg ``toTable`` append is one catalog-mediated atomic
  snapshot per micro-batch, and concurrent writers resolve via optimistic
  retry — no markers, no locks, no custom code.
- checkpointing upgrades the reference's at-least-once to exactly-once.

Without the Iceberg runtime (this container), the same pipeline appends to a
plain Parquet directory via ``foreachBatch`` — per-batch visibility is still
atomic-per-task-commit, which is what the tests exercise; the Iceberg path
is the same code with ``use_iceberg_table`` set.

Config knobs mirror the reference env vars (docker-compose.yaml:31-36):
flush_count ↔ PARQUET_FLUSH_COUNT, flush_interval ↔ PARQUET_FLUSH_INTERVAL,
commit_interval ↔ ICEBERG_COMMIT_INTERVAL.

The reference's DUAL-cadence shape — flush every minute, leader commits
every three (README.md:200-212: staged Parquet + 0-byte index markers,
then a scheduled atomic publish) — is reproduced by the staged mode
(r10, closing the SURVEY §2.1 S5/S6 staging gap at the parquet level):

- :func:`start_staged_ingest` flushes each micro-batch to
  ``<target>__staging/batch-<epoch>/`` on the FLUSH cadence; the batch
  directory's ``_SUCCESS`` file is the index-marker analogue (a flushed
  batch is commit-eligible iff it exists), and checkpoint + per-epoch
  overwrite make replayed flushes idempotent;
- :func:`commit_staged` runs on the COMMIT cadence (or from
  :class:`StagedCommitter`): it builds a new table VERSION — hardlinks
  of the current version's files plus the staged batches' files (names
  prefixed per-batch, so a crash between publish and staging cleanup
  re-links to already-present names and skips: exactly-once) — and
  publishes it with ``maintenance.publish_version``'s atomic symlink
  swap. Readers pin a version via ``maintenance.read_compacted_table``
  and never observe a partial commit; between commits, flushed-but-
  uncommitted data is invisible, exactly like the reference's staged
  files before the leader's Iceberg commit.

Single-cadence ``start_ingest`` remains the recommended shape (one
micro-batch = one atomic visible commit, strictly lower latency for the
same durability — SURVEY §7); the staged mode exists for cadence-fidelity
with the reference and for deployments that want fewer, larger commit
points than flushes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

#: Run ids are fixed-width lowercase hex. The sidecar writer, the sidecar
#: validator, the staged-batch directory pattern and the committed-key
#: manifest regex ALL derive from this one constant — a format drift can
#: break replay dedup only by failing loudly here, never by silently
#: producing keys the manifest regex cannot match (ADVICE r11).
_RUN_ID_HEX_LEN = 8
_RUN_ID_RE = re.compile(rf"[0-9a-f]{{{_RUN_ID_HEX_LEN}}}")
#: Commit-eligible staging dirs: "batch-<run>-<epoch>" (legacy: bare
#: "batch-<epoch>"). Anything else under the staging root (a stray
#: "batch-tmp", an operator's scratch dir) is IGNORED by commit_staged
#: rather than wedging the committer tick with a ValueError (ADVICE r11).
_BATCH_DIR_RE = re.compile(rf"batch-(?:[0-9a-f]{{{_RUN_ID_HEX_LEN}}}-)?\d+")
#: Committed keys carried by live file names: "b<run>-<epoch>-..." or
#: legacy "b<epoch>-...".
_COMMITTED_KEY_RE = re.compile(rf"^b([0-9a-f]{{{_RUN_ID_HEX_LEN}}}-\d+|\d+)-")


@dataclass
class IngestConfig:
    """Mirrors the reference's three cadence knobs (README.md:104-118)."""

    flush_count: int = 50_000  # PARQUET_FLUSH_COUNT production default
    flush_interval: str = "60 seconds"  # PARQUET_FLUSH_INTERVAL (test: 1m)
    commit_interval: str = "180 seconds"  # ICEBERG_COMMIT_INTERVAL (staged mode)
    #: None (default) derives a PER-TARGET checkpoint; a fixed shared
    #: default would make two default-config queries share streaming
    #: offsets — the second would silently write nothing (review finding).
    checkpoint_dir: str | None = None
    partition_by_day: bool = True  # hidden days(time) partitioning, §1.3

    def checkpoint_for(self, target: str) -> str:
        if self.checkpoint_dir is not None:
            return self.checkpoint_dir
        import hashlib

        tag = hashlib.md5(target.encode()).hexdigest()[:12]
        return f"/tmp/api-log-ingest-checkpoint-{tag}"


def start_ingest(
    stream_df: DataFrame,
    target: str,
    config: IngestConfig | None = None,
    use_iceberg_table: bool = False,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the ingest query: stream of api-log rows → table.

    ``target`` is an Iceberg table name when ``use_iceberg_table`` (the
    production shape) else a Parquet directory path. ``available_now`` runs
    one catch-up pass and stops (used by tests and backfills).

    Exactly-once: checkpoint + (Iceberg snapshot commit | per-batch
    idempotent parquet append keyed on batchId).
    """
    config = config or IngestConfig()

    from pyspark.sql import functions as F

    df = stream_df
    # the _day helper column is for the PARQUET layout only; the Iceberg
    # table partitions via its hidden days(time) transform and must receive
    # the 14-column schema unchanged (review finding: _day previously
    # leaked into toTable under the default config)
    if config.partition_by_day and not use_iceberg_table and "time" in df.columns:
        df = df.withColumn("_day", F.to_date("time"))

    writer = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", config.checkpoint_for(target))
        .option("maxRecordsPerFile", config.flush_count)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=config.flush_interval)

    if use_iceberg_table:
        # Atomic snapshot per micro-batch through the catalog — the
        # Spark-native equivalent of the reference's marker+leader commit.
        return writer.toTable(target)

    if config.partition_by_day and "_day" in df.columns:
        writer = writer.partitionBy("_day")
    return writer.format("parquet").option("path", target).start()


#: Spark trigger units → seconds. Bare abbreviations are keyed directly
#: ("ms" must not lose its trailing s to plural-stripping; ADVICE r10).
_INTERVAL_UNITS = {
    "microsecond": 1e-6,
    "us": 1e-6,
    "millisecond": 1e-3,
    "ms": 1e-3,
    "second": 1.0,
    "sec": 1.0,
    "s": 1.0,
    "minute": 60.0,
    "min": 60.0,
    "m": 60.0,
    "hour": 3600.0,
    "h": 3600.0,
    "day": 86400.0,
    "d": 86400.0,
    "week": 604800.0,
    "w": 604800.0,
}


def interval_seconds(interval: str) -> float:
    """'180 seconds' / '3 minutes' / '500 milliseconds' / '45' → seconds.

    Accepts every interval string Spark's ProcessingTime trigger does
    (so a ``flush_interval`` that ``start_staged_ingest`` accepted can
    always be reused as a :class:`StagedCommitter` interval); unknown
    units raise a ValueError naming the supported set instead of the
    bare KeyError the pre-r11 three-unit map produced (ADVICE r10).
    """
    parts = interval.strip().split()
    value = float(parts[0])
    raw = parts[1].lower() if len(parts) > 1 else "second"
    unit = raw if raw in _INTERVAL_UNITS else raw.rstrip("s")
    if unit not in _INTERVAL_UNITS:
        raise ValueError(
            f"unsupported interval unit {raw!r} in {interval!r}; "
            f"supported: {sorted(_INTERVAL_UNITS)}"
        )
    return value * _INTERVAL_UNITS[unit]


def staging_dir(target: str) -> str:
    return target.rstrip("/") + "__staging"


def _ingest_run_id(checkpoint: str) -> str:
    """Stable per-CHECKPOINT identity for staged-batch naming.

    Spark epoch ids are only unique within one checkpoint lineage: a
    fresh checkpoint against an existing target restarts epochs at 0, so
    an epoch-only dedup key would classify the new run's batches as
    replays of the old run's and silently drop genuinely new data
    (review r11). The id is persisted as a sidecar next to Spark's own
    checkpoint metadata: a restart from the SAME checkpoint (true
    replays) reuses it, a fresh checkpoint mints a new one. Written
    before the query starts, so it exists before any flush can.

    Concurrency: the id is written to a private tmp file first and then
    installed under the sidecar name with ``os.link``, which fails with
    EEXIST if the name already exists — exactly one creator can ever
    succeed, the name never exists without its complete content (an
    O_EXCL create would expose an empty file between create and write),
    and everyone (including the winner) re-reads the installed file, so
    concurrent first-starts on one checkpoint always agree. The pre-r12
    check-then-rename dance was NOT atomic on POSIX: ``os.rename``
    silently replaces an existing destination, so two racing
    first-starts could each install-and-use a different id, defeating
    replay dedup (ADVICE r11). A sidecar whose content does not match
    the expected format (hand-restored checkpoint, torn write) raises
    instead of silently minting keys the replay-dedup manifest regex
    can never match (ADVICE r11)."""
    import glob
    import os
    import uuid

    os.makedirs(checkpoint, exist_ok=True)
    sidecar = os.path.join(checkpoint, "_staged_ingest_id")
    # sweep tmp files orphaned by a process that died between the tmp
    # write and the finally-unlink — a crash-looping starter would
    # otherwise accumulate them forever (ADVICE r12). Safe: tmp names are
    # private per-process UUIDs, so nothing live ever matches another
    # process's name, and a concurrent starter losing its OWN tmp to this
    # sweep merely retries the ENOENT-safe unlink below.
    for stale in glob.glob(f"{sidecar}.*.tmp"):
        try:
            os.unlink(stale)
        except OSError:  # pragma: no cover — racing sweepers
            pass
    while not os.path.exists(sidecar):
        tmp = f"{sidecar}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(uuid.uuid4().hex[:_RUN_ID_HEX_LEN])
        try:
            os.link(tmp, sidecar)  # EEXIST → a concurrent creator won
        except FileExistsError:
            pass
        except FileNotFoundError:  # pragma: no cover — a concurrent
            continue  # starter's sweep took our tmp: mint a new one
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:  # pragma: no cover — swept
                pass
    with open(sidecar) as f:
        run_id = f.read().strip()
    if not _RUN_ID_RE.fullmatch(run_id):
        raise ValueError(
            f"corrupt staged-ingest id sidecar {sidecar!r}: {run_id!r} is not "
            f"{_RUN_ID_HEX_LEN} lowercase hex chars. Batches staged under a "
            "non-conforming id would never match the replay-dedup manifest and "
            "a replay would duplicate rows. Remove the sidecar to mint a fresh "
            "run id (reconcile any batches already staged under the bad id "
            "first)."
        )
    return run_id


def start_staged_ingest(
    stream_df: DataFrame,
    target: str,
    config: IngestConfig | None = None,
    available_now: bool = False,
    on_flush=None,
) -> StreamingQuery:
    """FLUSH half of the dual-cadence shape: micro-batches land in
    ``<target>__staging/batch-<epoch>/`` and stay INVISIBLE to table
    readers until :func:`commit_staged` publishes them.

    Exactly-once staging: the checkpoint pins epoch ids, and a replayed
    epoch overwrites its own batch directory; ``_SUCCESS`` (written last
    by the parquet committer) marks a batch commit-eligible, so a
    half-written replay is never published.

    ``on_flush`` (optional ``callable(epoch_id)``) runs AFTER a batch's
    staging write completes but BEFORE Spark records the epoch in the
    checkpoint commit log — a metrics/backpressure hook, and the fault
    line the crash-replay test cuts at: raising here is exactly "process
    died between flush and checkpoint commit", the window where a
    restart must replay the already-staged epoch (VERDICT r11 #3).
    """
    config = config or IngestConfig()
    from pyspark.sql import functions as F

    df = stream_df
    if config.partition_by_day and "time" in df.columns:
        df = df.withColumn("_day", F.to_date("time"))
    stage_root = staging_dir(target)
    checkpoint = config.checkpoint_for(target)
    run_id = _ingest_run_id(checkpoint)

    def flush(batch_df: DataFrame, epoch_id: int) -> None:
        w = batch_df.write.mode("overwrite").option(
            "maxRecordsPerFile", config.flush_count
        )
        if config.partition_by_day and "_day" in batch_df.columns:
            w = w.partitionBy("_day")
        w.parquet(f"{stage_root}/batch-{run_id}-{epoch_id}")
        if on_flush is not None:
            on_flush(epoch_id)

    writer = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(flush)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=config.flush_interval)
    return writer.start()


def commit_staged(target: str, retain_seconds: float = 60.0) -> int:
    """COMMIT half of the dual-cadence shape: atomically publish every
    commit-eligible staged batch into the versioned table at ``target``.

    Builds the next table version as HARDLINKS — the current version's
    files under their existing names plus each staged batch's parquet
    files under ``b<epoch>-``-prefixed names (partition subdirs
    preserved) — then swaps the table symlink via
    ``maintenance.publish_version`` and clears the published staging
    dirs. Hardlinking makes a version O(#files) metadata, not a data
    copy — the manifest-less analogue of an Iceberg snapshot.

    Idempotent across crashes at (RUN, EPOCH) granularity: a staged
    ``batch-<run>-<epoch>`` whose key already has ``b<run>-<epoch>-``
    files in the live version is dropped without linking (its staging
    dir is still cleared). File-name dedup alone is not enough — a Spark
    epoch REPLAY rewrites the staged batch with fresh part-file UUIDs,
    so a crash between a mid-epoch publish and the checkpoint's
    commit-log write re-stages the same rows under new names; linking
    those alongside the already-published ones would duplicate rows
    (ADVICE r10). And epoch alone is not enough either — epoch ids are
    only unique within one checkpoint lineage, so a FRESH checkpoint
    against an existing target restarts at epoch 0 and an epoch-only
    key would silently drop its genuinely new batches as "replays"
    (review r11); the per-checkpoint run id from
    :func:`_ingest_run_id` disambiguates. The name-level skip in
    ``_link_tree`` remains as a third layer for the copy-preserving
    replay path. The committed-key manifest comes from ONE walk of the
    live tree, which also collects the carry-forward file list — so an
    all-replay drain (post-crash recovery) early-outs after the scan
    without building, then discarding, a full speculative version tree
    (ADVICE r11); the version dir is only ever created once at least
    one fresh batch is known. A crash between that creation and
    ``publish_version`` can still orphan an unpublished ``__v`` dir —
    the next successful publish's retention sweep removes it (it
    matches the version-family prefix, is not the live/just-replaced
    version, and ages past ``retain_seconds``; proven in
    tests/test_ingest.py). Returns the number of staged batches
    drained (0 = nothing eligible).
    """
    import os
    import shutil
    import uuid

    from api_log_iceberg_test_spark.maintenance import publish_version

    stage_root = staging_dir(target)

    def _batch_key(d: str) -> str:
        return d.split("-", 1)[1]  # "<run>-<epoch>" (legacy: bare "<epoch>")

    def _epoch(d: str) -> int:
        return int(d.rsplit("-", 1)[-1])

    batches = sorted(
        (
            d
            for d in (os.listdir(stage_root) if os.path.isdir(stage_root) else [])
            if _BATCH_DIR_RE.fullmatch(d)  # stray dirs skipped, not ValueError
            and os.path.exists(os.path.join(stage_root, d, "_SUCCESS"))
        ),
        key=lambda d: (_epoch(d), d),
    )
    if not batches:
        return 0

    # ONE walk over the live tree: the committed-key manifest for replay
    # dedup plus the carry-forward file list for the (maybe) new version
    committed: set[str] = set()
    live_files: list[tuple[str, str, str]] = []  # (src_dir, rel_dir, name)
    if os.path.exists(target):
        live_root = os.path.realpath(target)
        for dp, _, fs in os.walk(live_root):
            rel = os.path.relpath(dp, live_root)
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                m = _COMMITTED_KEY_RE.match(f)
                if m:
                    committed.add(m.group(1))
                live_files.append((dp, rel, f))

    fresh = [b for b in batches if _batch_key(b) not in committed]
    if fresh:
        def _link_tree(src_root: str, dst_root: str, prefix: str) -> None:
            for dp, _, fs in os.walk(src_root):
                rel = os.path.relpath(dp, src_root)
                for f in fs:
                    if f.endswith(".parquet"):
                        _link_one(dp, rel, f, dst_root, prefix)

        def _link_one(src_dir: str, rel: str, f: str, dst_root: str, prefix: str) -> None:
            dst_dir = os.path.join(dst_root, rel) if rel != "." else dst_root
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, prefix + f)
            if not os.path.exists(dst):
                os.link(os.path.join(src_dir, f), dst)

        new_version = f"{target.rstrip('/')}__v{uuid.uuid4().hex[:8]}"
        os.makedirs(new_version)
        for dp, rel, f in live_files:
            _link_one(dp, rel, f, new_version, "")
        for b in fresh:
            _link_tree(
                os.path.join(stage_root, b),
                new_version,
                prefix=f"b{_batch_key(b)}-",
            )
        publish_version(target, new_version, retain_seconds)
    for b in batches:
        shutil.rmtree(os.path.join(stage_root, b))
    return len(batches)


class StagedCommitter:
    """Scheduled commit loop — the leader of the reference's marker+commit
    protocol, minus the lock election (one committer per table by
    construction; concurrent committers on one table would need the
    Iceberg path's optimistic catalog commit).

    A failing tick (e.g. a transient filesystem error in
    ``commit_staged``) does NOT kill the loop: the exception is recorded
    as ``last_error`` (count in ``failures``) and the next tick retries —
    staged batches are durable, so a later success drains everything the
    failed tick left behind. Pre-r11 the daemon thread died silently on
    the first exception and flushes accumulated invisibly forever
    (ADVICE r10). A persistent failure still surfaces: ``stop()``'s
    final drain runs in the CALLING thread and propagates the exception.
    """

    def __init__(
        self,
        target: str,
        interval: str | float = "180 seconds",
        retain_seconds: float = 60.0,
    ) -> None:
        import threading

        self.target = target
        self.retain_seconds = retain_seconds
        self._interval = (
            float(interval) if isinstance(interval, (int, float))
            else interval_seconds(interval)
        )
        self._stop = threading.Event()
        self.commits = 0
        self.failures = 0
        self.last_error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self.commits += commit_staged(self.target, self.retain_seconds)
                self.last_error = None
            except Exception as e:  # noqa: BLE001 — keep ticking, surface via stop()
                self.last_error = e
                self.failures += 1

    def stop(self, final_commit: bool = True) -> int:
        """Stop the loop; by default drain staging with one last commit
        (runs in the calling thread, so a still-broken target raises
        here rather than vanishing with the daemon)."""
        self._stop.set()
        self._thread.join()
        if final_commit:
            self.commits += commit_staged(self.target, self.retain_seconds)
        return self.commits


def ingest_batch(df: DataFrame, target: str, config: IngestConfig | None = None) -> None:
    """Batch append (the generator's batch mode → table), same layout rules."""
    config = config or IngestConfig()
    from pyspark.sql import functions as F

    out = df
    writer_cols = []
    if config.partition_by_day and "time" in df.columns:
        out = out.withColumn("_day", F.to_date("time"))
        writer_cols = ["_day"]
    w = out.write.mode("append").option("maxRecordsPerFile", config.flush_count)
    if writer_cols:
        w = w.partitionBy(*writer_cols)
    w.parquet(target)
