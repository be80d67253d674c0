"""Ingest-mode throughput probe (VERDICT r10 #7): single-cadence vs
dual-cadence staged ingest at bench scale, measured on the same
generated api-log stream, so the cadence-fidelity mode has a recorded
cost next to the recommended single-cadence shape.

Drives both pipelines with an availableNow catch-up pass over the same
parquet-backed file source, split into multiple micro-batches via
maxFilesPerTrigger so the staged path exercises several flush epochs
plus one atomic commit (the compressed version of "flush every minute,
leader commits every three"). Appends one JSON record to
bench_history.jsonl:

    {"metric": "ingest_mode_probe", "rows": N,
     "single": {"sec", "rows_per_sec"},
     "staged": {"flush_sec", "commit_sec", "sec", "rows_per_sec",
                "n_batches"},
     "loadavg_1m": ...}

Foreign to bench.py's per-query records by design — the standing
readers (tools/scaling_report.py, tools/probe_normalize.py) filter on
their own keys and skip it.

Usage: python tools/ingest_probe.py [n_rows]    (default 100_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import SparkSession

    from api_log_iceberg_test_spark.generator import generate_api_logs
    from api_log_iceberg_test_spark.ingest import (
        IngestConfig,
        commit_staged,
        start_ingest,
        start_staged_ingest,
    )
    from api_log_iceberg_test_spark.maintenance import read_compacted_table
    from api_log_iceberg_test_spark.schema import API_LOG_SCHEMA

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="ingest-probe-")
    try:
        src = f"{base}/src"
        generate_api_logs(spark, n, seed=77).repartition(32).write.parquet(src)

        def stream():
            return (
                spark.readStream.schema(API_LOG_SCHEMA)
                .option("maxFilesPerTrigger", 4)  # ≥8 flush epochs
                .parquet(src)
            )

        t0 = time.time()
        q = start_ingest(
            stream(),
            f"{base}/single",
            IngestConfig(flush_count=50_000, checkpoint_dir=f"{base}/ckpt1"),
            available_now=True,
        )
        q.awaitTermination(600)
        single_sec = time.time() - t0
        single_rows = spark.read.parquet(f"{base}/single").count()

        t0 = time.time()
        q = start_staged_ingest(
            stream(),
            f"{base}/staged",
            IngestConfig(flush_count=50_000, checkpoint_dir=f"{base}/ckpt2"),
            available_now=True,
        )
        q.awaitTermination(600)
        flush_sec = time.time() - t0
        t1 = time.time()
        n_batches = commit_staged(f"{base}/staged")
        commit_sec = time.time() - t1
        staged_rows = read_compacted_table(spark, f"{base}/staged").count()

        assert single_rows == n, (single_rows, n)
        assert staged_rows == n, (staged_rows, n)
        record = {
            "metric": "ingest_mode_probe",
            "rows": n,
            "single": {
                "sec": round(single_sec, 2),
                "rows_per_sec": round(n / single_sec),
            },
            "staged": {
                "flush_sec": round(flush_sec, 2),
                "commit_sec": round(commit_sec, 3),
                "sec": round(flush_sec + commit_sec, 2),
                "rows_per_sec": round(n / (flush_sec + commit_sec)),
                "n_batches": n_batches,
            },
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        hist = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_history.jsonl",
        )
        with open(hist, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
