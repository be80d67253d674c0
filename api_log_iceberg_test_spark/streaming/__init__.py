"""Structured Streaming operators beyond the ingest pipeline.

The reference has no streaming-analytics semantics (SURVEY.md §2.5) — its
pipeline is processing-time batched append. These modules add the standard
event-time toolkit a log-analytics engine needs:

- :mod:`windows` — tumbling/sliding event-time aggregation with watermarks
- :mod:`sessionize` — custom stateful sessionization via
  ``applyInPandasWithState``
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as _F


def ensure_event_time(df: DataFrame, time_col: str) -> DataFrame:
    """Event-time columns must be TIMESTAMP (LTZ): ``withWatermark`` rejects
    TIMESTAMP_NTZ, and parquet written with ``isAdjustedToUTC=false`` (the
    pyarrow default for naive datetimes) arrives NTZ-typed. The cast is a
    no-op when the column is already LTZ, and is wall-clock-preserving for
    NTZ only under a UTC session timezone — ``session.build_session`` sets
    that for batch, but streaming entry points may be handed a session built
    elsewhere, so enforce it here rather than rely on the caller.
    """
    if df.schema[time_col].dataType.typeName() == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            # pin rather than raise: the NTZ wall-clock is the event time by
            # definition here, and UTC is the only tz that preserves it
            df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(time_col, _F.col(time_col).cast("timestamp"))
    return df
