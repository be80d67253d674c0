"""Event-time correctness: the watermark drops data later than the bound.

The reference has no late-data policy (processing-time appends only,
SURVEY.md §2.5); our streaming layer adds event-time windows + watermarks,
and this test proves the drop semantics with a controlled two-batch file
source: batch 2 contains an event whose event time is far behind the
watermark advanced by batch 1.
"""

from __future__ import annotations

import datetime as dt

from api_log_iceberg_test_spark.streaming.windows import tumbling_counts


def test_late_rows_beyond_watermark_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sch = "time timestamp, name string"

    def write_batch(rows, part):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("append").parquet(src)

    # batch 1: events up to 12:00 → watermark advances to ~10:00 (2h delay)
    write_batch(
        [
            (t0, "GetObject"),
            (t0 + dt.timedelta(hours=12), "GetObject"),
        ],
        0,
    )

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    agg = tumbling_counts(stream, time_col="time", key_col="name", window_len="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: one on-time event (13:00) + one hopelessly late event (01:00,
    # 9h behind the 10:00 watermark) → the late one must not create/extend
    # its window in the final output
    write_batch(
        [
            (t0 + dt.timedelta(hours=13), "PutObject"),
            (t0 + dt.timedelta(hours=1), "LateObject"),
        ],
        1,
    )
    q2 = (
        tumbling_counts(
            spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
            time_col="time",
            key_col="name",
            window_len="1 hour",
            watermark="2 hours",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    names = {r["name"] for r in spark.read.parquet(out).collect()}
    assert "LateObject" not in names, f"late row leaked into {names}"
    # the hour-0 GetObject window (closed once the watermark passed it) emitted
    assert "GetObject" in names
