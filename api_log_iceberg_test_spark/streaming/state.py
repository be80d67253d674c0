"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The current-generation stateful API (successor to the
``applyInPandasWithState`` used by :mod:`.sessionize`): typed state
variables managed by the state store, Arrow-batched per-key input, and
checkpoint-backed recovery. This module implements the canonical shape —
per-key cumulative statistics that survive restarts — as the template for
custom stateful operators (counters, per-tenant quotas, model-feature
accumulators).

Scale: state lives in the state store partitioned by the grouping key
(shuffle on user_id only); each micro-batch touches only keys present in
the batch. State size is O(|distinct keys|), not O(|stream|).

Environment gate: the transformWithState Python state-server protocol
needs the ``protobuf`` package, which this container lacks (and installs
are disallowed) — the test skips when ``google.protobuf`` is absent, like
the Iceberg-jar gate. :mod:`.sessionize`'s ``applyInPandasWithState`` is
the protobuf-free stateful path that runs everywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "cnt long, total double"
_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


class CumulativeUserStats(StatefulProcessor):
    """Running (event count, value sum) per user; emits the cumulative row
    for every user seen in the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        cnt, total = 0, 0.0
        if self._stats.exists():
            cnt, total = self._stats.get()
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._stats.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def cumulative_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user cumulative (n_events, total_value) over an events stream.

    Emits one updated row per user per micro-batch; the LATEST row per
    user is the running total since stream start (exactly the batch
    ``groupBy(user).agg(count, sum)`` over everything ingested so far —
    asserted in tests, including across a checkpoint restart).
    """
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=CumulativeUserStats(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
