"""Burst-stress the pair-free neighborhood plan (VERDICT r11 #1).

``joins.nearby_stats_within``'s only untested scale claim: the per-task
ceiling is rows-per-``bucket_seconds`` (one time bucket = one window
partition, unsplittable by AQE), so a deliberately HOT distribution is
the plan's one possible scale-killer. This tool builds the adversarial
set VERDICT prescribes — 80 % of sf1.0's 1M events remapped inside ONE
±5-minute window — and measures the operator at:

- the default ``bucket_seconds`` (12× within = 3600 s: the whole burst
  lands in one window task),
- progressively shrunk buckets down to the ``within`` floor (300 s),
- ``"auto"`` (the r12 density pre-scan, ``joins.auto_bucket_seconds``),

recording wall time AND the max rows any single window task holds
(center rows + boundary-strip copies — computed with the operator's own
tagging expressions, so the number is the real task bound, not an
estimate). A calm-control run on unmodified sf1.0 events confirms the
auto knob stays at the default when density is low. Appends one JSON
record to bench_history.jsonl:

    {"metric": "burst_stress_nearby", "sf": 1.0, "hot_fraction": 0.8,
     "within_seconds": 300, "burst": [{"bucket_seconds", "sec",
     "max_task_rows", "rows_out"}...], "auto_bucket_burst": ...,
     "control": [...], "auto_bucket_control": ..., "loadavg_1m": ...}

Foreign to bench.py's per-query records by design — the standing
readers (tools/scaling_report.py, tools/probe_normalize.py) filter on
their own keys and skip it.

Usage: python tools/burst_stress.py [sf_dir]   (default .localdata/sf1.0)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WITHIN = 300
HOT_FRACTION = 0.8
HOT_WINDOW_S = 600  # the ±5-minute window


def build_burst(spark, sf_dir: str, out_path: str):
    """Remap 80 % of events into one 600-second window, deterministically.

    Hot rows keep sub-second jitter (event_id-derived micros) so ties and
    near-ties exercise the lag/lead gap logic; the window start sits mid-
    range so coarse buckets straddle it.
    """
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    hot_start_us = F.lit(1_705_000_000_000_000)  # 2024-01-11, inside the range
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    is_hot = F.pmod(F.col("event_id"), F.lit(5)) < int(HOT_FRACTION * 5)
    hot_off = F.pmod(
        F.col("event_id") * F.lit(2_654_435_761), F.lit(HOT_WINDOW_S * 1_000_000)
    )
    burst = ev.withColumn(
        "ts",
        F.timestamp_micros(
            F.when(is_hot, hot_start_us + hot_off).otherwise(t_us)
        ),
    )
    burst.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def max_task_rows(df, bucket_seconds: int) -> int:
    """Rows in the hottest window partition, strip copies included —
    the same tagging predicate nearby_stats_within builds."""
    from pyspark.sql import functions as F

    w_us = WITHIN * 1_000_000
    b_us = bucket_seconds * 1_000_000
    base = df.select(
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("_t")
    ).withColumn("_b0", F.expr(f"_t div {b_us}"))
    tagged = (
        base.withColumn("_d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .filter(
            (F.col("_d") == 0)
            | ((F.col("_d") == -1) & (F.col("_t") - F.col("_b0") * b_us <= w_us))
            | ((F.col("_d") == 1) & ((F.col("_b0") + 1) * b_us - F.col("_t") <= w_us))
        )
        .withColumn("_bucket", F.col("_b0") + F.col("_d"))
    )
    row = tagged.groupBy("_bucket").count().agg(F.max("count").alias("m")).first()
    return int(row["m"] or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".localdata/sf1.0")
    from api_log_iceberg_test_spark.session import build_session

    spark = build_session(app_name="burst-stress")
    burst_path = os.path.join(REPO, ".localdata/burst_events")
    burst = build_burst(spark, sf_dir, burst_path)
    control = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators.joins import (
        auto_bucket_seconds,
        nearby_stats_within,
    )

    def run(df, bucket) -> dict:
        t0 = time.monotonic()
        stats = nearby_stats_within(
            df.select("event_id", "ts", "event_type"),
            time_col="ts",
            within_seconds=WITHIN,
            flag=F.col("event_type") == "error",
            keep_cols=["event_id", "event_type"],
            bucket_seconds=bucket,
        )
        out = (
            stats.filter((F.col("event_type") == "error") & (F.col("n_nearby") >= 1))
            .agg(F.count(F.lit(1)).alias("rows_out"), F.sum("n_nearby").alias("chk"))
            .first()
        )
        return {
            "bucket_seconds": bucket,
            "sec": round(time.monotonic() - t0, 3),
            "rows_out": int(out["rows_out"]),
            "chk": int(out["chk"]),
        }

    record = {
        "metric": "burst_stress_nearby",
        "sf": 1.0,
        "hot_fraction": HOT_FRACTION,
        "hot_window_s": HOT_WINDOW_S,
        "within_seconds": WITHIN,
        "n_events": burst.count(),
    }
    auto_b = auto_bucket_seconds(burst, "ts", WITHIN)
    record["auto_bucket_burst"] = auto_b
    variants = []
    for b in [3600, 1200, 600, 300] + ([auto_b] if auto_b not in (3600, 1200, 600, 300) else []):
        v = run(burst, b)
        v["max_task_rows"] = max_task_rows(burst, b)
        variants.append(v)
        print("burst", v, flush=True)
    record["burst"] = variants
    assert len({v["chk"] for v in variants}) == 1, f"outputs diverged: {variants}"
    assert len({v["rows_out"] for v in variants}) == 1

    auto_c = auto_bucket_seconds(control, "ts", WITHIN)
    record["auto_bucket_control"] = auto_c
    ctrl = []
    for b in [3600, auto_c] if auto_c != 3600 else [3600]:
        v = run(control, b)
        v["max_task_rows"] = max_task_rows(control, b)
        ctrl.append(v)
        print("control", v, flush=True)
    record["control"] = ctrl
    record["loadavg_1m"] = round(os.getloadavg()[0], 2)

    with open(os.path.join(REPO, "bench_history.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
