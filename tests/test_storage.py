"""Physical-layout tests: bucketed joins plan without exchanges; salted
aggregation is semantics-preserving."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators.skew import salted_aggregate
from api_log_iceberg_test_spark.schema import load_table
from api_log_iceberg_test_spark.storage import cojoin_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); unique names + full cleanup so reruns never collide
    import shutil
    import uuid

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(orders, t_orders, "o_orderkey", 8)
        write_bucketed(lineitem, t_lineitem, "l_orderkey", 8)

        # at test scale the planner would rather broadcast (and skip the
        # bucketing); disable auto-broadcast to exercise the fact-fact
        # shape bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cojoin_bucketed(spark, t_orders, t_lineitem, "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Exchange" not in plan, plan
        # and the join is still correct
        n = joined.count()
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        for t in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "cnt": "count:*",
            "total": "sum:value",
            "vmin": "min:value",
            "vmax": "max:value",
        },
        salt_buckets=16,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    a = {r["event_type"]: (r["cnt"], round(r["total"], 4), r["vmin"], r["vmax"]) for r in salted.collect()}
    b = {r["event_type"]: (r["cnt"], round(r["total"], 4), r["vmin"], r["vmax"]) for r in plain.collect()}
    assert a == b


def test_training_shard_export_roundtrip(spark, sf_dir, tmp_path):
    from api_log_iceberg_test_spark.operators import text as text_ops
    from api_log_iceberg_test_spark.schema import load_table
    from api_log_iceberg_test_spark import storage

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", text_ops.token_count("text").alias("n_tokens")
    )
    out = str(tmp_path / "shards")
    storage.write_training_shards(docs, out, max_records_per_file=50, fmt="json")

    back = spark.read.json(out)
    assert back.count() == docs.count()
    # hive partition dirs by lang exist and reload with the partition column
    assert sorted(r["lang"] for r in back.select("lang").distinct().collect()) == sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )

    man = storage.shard_manifest(spark, out, token_col="n_tokens").collect()
    assert all(r["n_rows"] <= 50 for r in man), "maxRecordsPerFile cap violated"
    assert sum(r["n_rows"] for r in man) == docs.count()
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["n_tokens"] for r in man) == total_tokens


def test_compaction_swap_is_atomic_under_concurrent_reader(spark, sf_dir, tmp_path):
    """The reference's flush-every-10 test config is a small-file factory
    (docker-compose.yaml:34); compaction must not break readers. This
    drives compact_parquet_table in a background loop while the
    foreground reads the table continuously through the pinned-version
    reader (read_compacted_table): every read must succeed and return
    the full row count — old version or new version, never a missing
    path, a half-swapped directory, or files deleted out from under an
    in-flight scan (VERDICT r09 #5). The pre-r10 rename-swap failed this
    intermittently (path-not-found in the rename window, and
    file-not-found after its immediate old-version delete)."""
    import threading

    from api_log_iceberg_test_spark.maintenance import (
        compact_parquet_table,
        read_compacted_table,
    )

    tgt = str(tmp_path / "events_compact_race")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    n_rows = ev.count()
    # many small files — the state compaction exists to fix
    ev.repartition(16).write.parquet(tgt)
    # one-time layout migration happens before readers arrive (its
    # rename+symlink step is the documented non-atomic exception)
    compact_parquet_table(spark, tgt, target_file_size_bytes=1 << 16)

    stop = threading.Event()
    compactor_err: list[BaseException] = []

    def compact_loop():
        try:
            # alternate target sizes so every pass really rewrites; the
            # default retention window keeps every superseded version
            # alive for the duration of the test's reads
            for i in range(6):
                if stop.is_set():
                    return
                compact_parquet_table(
                    spark, tgt, target_file_size_bytes=(1 << 30) if i % 2 else 1 << 16
                )
        except BaseException as e:  # noqa: BLE001 — surface in main thread
            compactor_err.append(e)

    t = threading.Thread(target=compact_loop, daemon=True)
    t.start()
    reads = 0
    try:
        while t.is_alive():
            got = read_compacted_table(spark, tgt).count()
            assert got == n_rows, f"read {reads}: {got} rows != {n_rows}"
            reads += 1
    finally:
        stop.set()
        t.join(timeout=120)
    assert not compactor_err, compactor_err
    assert reads >= 3, f"only {reads} reads overlapped the compaction loop"
    # quiesced expiry shrinks to the live version + just-replaced pair
    import glob as _glob
    import os as _os

    compact_parquet_table(spark, tgt, target_file_size_bytes=1 << 30, retain_seconds=0)
    versions = [d for d in _glob.glob(tgt + "__v*") if _os.path.isdir(d)]
    assert len(versions) <= 2, versions
    assert _os.path.islink(tgt)
    assert read_compacted_table(spark, tgt).count() == n_rows


def test_publish_version_retains_just_superseded(tmp_path):
    """ADVICE r10: retention must key on time-since-SUPERSEDE, not
    version-dir age. A version that was live for longer than
    retain_seconds used to be expired by the very next swap (its mtime
    meant 'created at'); publish_version now re-stamps the superseded
    dir at swap time, so a reader that pinned it moments ago is safe."""
    import glob
    import os
    import time

    from api_log_iceberg_test_spark.maintenance import publish_version

    root = str(tmp_path / "table")
    os.makedirs(root)
    with open(os.path.join(root, "a.parquet"), "w") as f:
        f.write("x")
    # the table has been live, untouched, far longer than retain_seconds
    old = time.time() - 3600
    os.utime(root, (old, old))

    def new_version(tag):
        d = str(tmp_path / f"table__v{tag}")
        os.makedirs(d)
        with open(os.path.join(d, f"{tag}.parquet"), "w") as f:
            f.write("x")
        os.utime(d, (old, old))  # creation long ago, like a long-lived version
        return d

    va = new_version("aaaa0001")
    publish_version(root, va, retain_seconds=60)  # migrates + swaps; stamps migrated dir
    migrated = [
        d
        for d in glob.glob(str(tmp_path / "table__v*"))
        if os.path.isdir(d) and d != va
    ]
    assert len(migrated) == 1
    vb = new_version("bbbb0002")
    publish_version(root, vb, retain_seconds=60)
    # the migrated dir was superseded seconds ago (though CREATED an hour
    # ago) — it must survive this swap's retention pass
    assert os.path.isdir(migrated[0]), "just-superseded version was rug-pulled"
    # and va (just replaced) is always kept
    assert os.path.isdir(va)
    assert os.path.realpath(root) == os.path.realpath(vb)


def test_partition_compaction_keeps_whole_root_reads_clean(spark, sf_dir, tmp_path):
    """ADVICE r10: per-partition compaction must not leave version dirs
    INSIDE the table root — a whole-table read would see duplicate rows
    or parse '<part>__v1a2b' as a bogus partition value. Versions now
    live in <path>__versions/ with the partition symlink pointing out."""
    import glob
    import os

    from api_log_iceberg_test_spark.maintenance import compact_parquet_table

    tgt = str(tmp_path / "events_part")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    n_rows = ev.count()
    ev.withColumn("_bucket", F.pmod(F.col("event_id"), F.lit(2))).repartition(
        8
    ).write.partitionBy("_bucket").parquet(tgt)

    # compact one partition twice (second swap exercises retention too)
    compact_parquet_table(spark, tgt, target_file_size_bytes=1 << 16,
                          partition_subdir="_bucket=0")
    compact_parquet_table(spark, tgt, target_file_size_bytes=1 << 30,
                          partition_subdir="_bucket=0")

    # no version dirs inside the table root; versions live outside
    inside = [e for e in os.listdir(tgt) if "__v" in e or "__swap" in e]
    assert not inside, inside
    assert glob.glob(tgt + "__versions/_bucket=0__v*")
    assert os.path.islink(os.path.join(tgt, "_bucket=0"))

    # whole-root read: full row count, correct partition values, no dupes
    got = spark.read.parquet(tgt)
    assert got.count() == n_rows
    assert sorted(
        r["_bucket"] for r in got.select("_bucket").distinct().collect()
    ) == [0, 1]
    per_key = got.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert per_key == 0
