"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's workload generator is a shell loop driving `mc`
(generate-api-logs.sh:74-120); :mod:`.generator` re-expresses it as Column
expressions. This module exposes the SAME weighted workload through
Spark's pluggable source API instead, so it composes like any other
format:

    spark.dataSource.register(ApiLogDataSource)
    spark.read.format("apilogs").option("rows", 10000).option("seed", 7).load()

Why it matters at scale: ``partitions()`` drives real parallelism — each
input partition generates its slice independently and deterministically
(seeded per partition), so a 1000-executor cluster synthesizes test/bench
corpora with zero driver involvement and no shuffle. The same API is how
a production deployment would wrap an internal record service as a
first-class Spark source with partition planning.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .schema import API_LOG_SCHEMA, OP_WEIGHTS

_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

#: cumulative weight ladder, mirroring generate-api-logs.sh's RANDOM % 100
_LADDER: list[tuple[int, str]] = []
_acc = 0
for _op, _w in OP_WEIGHTS:
    _acc += _w
    _LADDER.append((_acc, _op))


def _pick_op(r: int) -> str:
    for bound, op in _LADDER:
        if r < bound:
            return op
    return _LADDER[-1][1]


class _Partition(InputPartition):
    def __init__(self, index: int, start: int, count: int, seed: int, span_days: int):
        self.index = index
        self.start = start
        self.count = count
        self.seed = seed
        self.span_days = span_days


class ApiLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))
        self.span_days = int(options.get("span_days", 1))

    def partitions(self):
        per = -(-self.rows // self.n_partitions)
        parts = []
        start = 0
        for i in range(self.n_partitions):
            count = min(per, self.rows - start)
            if count <= 0:
                break
            parts.append(_Partition(i, start, count, self.seed, self.span_days))
            start += count
        return parts

    def read(self, partition: _Partition):
        # deterministic per (seed, partition index) — replays identically on
        # task retry, which is what makes the source exactly-once-safe
        rng = random.Random((partition.seed << 20) ^ partition.index)
        span_s = partition.span_days * 86400
        for i in range(partition.count):
            row_id = partition.start + i
            op = _pick_op(rng.randrange(100))
            ts = _BASE + timedelta(seconds=rng.randrange(span_s))
            status = 200 if rng.random() < 0.95 else rng.choice([403, 404, 500, 503])
            in_b = rng.randrange(1 << 20) if op in ("PutObject", "CopyObject") else 0
            out_b = rng.randrange(1 << 22) if op in ("GetObject", "ListObjectsV2") else 0
            rid = hashlib.md5(f"{partition.seed}|{row_id}".encode()).hexdigest()[:16]
            yield (
                ts.replace(tzinfo=None),
                op,
                f"test-api-logs-{rng.randrange(4)}",
                "" if op == "ListBuckets" else f"obj-{row_id}.bin",
                status,
                in_b,
                out_b,
                f"{rng.uniform(0.5, 200.0):.2f}ms",
                f"{rng.uniform(0.1, 150.0):.2f}ms",
                f"10.0.0.{1 + rng.randrange(4)}",
                "MinIO (linux; amd64) minio-go/v7.0.70",
                "minioadmin",
                rid,
                f"minio{1 + rng.randrange(4)}",
            )


class ApiLogDataSource(DataSource):
    """``format("apilogs")`` — options: rows, partitions, seed, span_days."""

    @classmethod
    def name(cls) -> str:
        return "apilogs"

    def schema(self):
        return API_LOG_SCHEMA

    def reader(self, schema) -> ApiLogReader:
        return ApiLogReader(self.options)
