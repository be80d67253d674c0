"""Property-based armor for the time-window family.

Round 4 caught a real boundary bug here — the tumbling/hopping ORACLES
rounded fractional seconds (`epoch(ts)::BIGINT`), shifting events within
0.5s below a bucket edge into the wrong window. These tests armor the
SPARK side the same way: randomized event streams with
boundary-adjacent microsecond deltas, checked against integer-µs Python
references for tumbling buckets, hopping expansion, lag+cumsum gap
sessionization, and native session_window gap-merge (inclusive at
exactly gap).
"""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)
# session timezone is pinned UTC (session.py), so epoch math is explicit-UTC
_BASE_US = (
    int(_BASE.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
)

_H6 = 6 * 3600 * 1_000_000
_H2 = 2 * 3600 * 1_000_000
_GAP = 30 * 60 * 1_000_000

# absolute µs offsets biased toward window/gap boundaries
_offsets = st.one_of(
    st.integers(0, 24 * 3600 * 1_000_000),
    st.sampled_from(
        [
            _H6 - 1, _H6, _H6 + 1,
            _H2 - 1, _H2, _H2 + 1,
            _GAP - 1, _GAP, _GAP + 1,
            2 * _GAP, 2 * _GAP + 1,
            499_999, 500_000, 500_001,  # the r04 rounding trap: <0.5s/≥0.5s
        ]
    ),
)

_events = st.lists(
    st.tuples(st.integers(0, 2), _offsets, st.sampled_from(["click", "view"])),
    min_size=1,
    max_size=20,
)

_counter = itertools.count()


def _write_events(spark, tmp_path, rows):
    data = [
        (
            i,
            _BASE + dt.timedelta(microseconds=off),
            user,
            etype,
            1.0,
            "{}",
        )
        for i, (user, off, etype) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / f"win{next(_counter)}")
    df.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def _us(row_ts):
    return int(row_ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_tumbling_window_matches_floor_division(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_tumbling_window_batch

    d = _write_events(spark, tmp_path, rows)
    got = {
        (_us(r["window_start"]), r["event_type"]): r["cnt"]
        for r in q_tumbling_window_batch(spark, d).collect()
    }
    expect: dict = {}
    for user, off, etype in rows:
        start = ((_BASE_US + off) // _H6) * _H6
        expect[(start, etype)] = expect.get((start, etype), 0) + 1
    assert got == expect, rows


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_hopping_window_expands_each_event_three_times(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_hopping_window_batch

    d = _write_events(spark, tmp_path, rows)
    got = {
        (_us(r["window_start"]), r["event_type"]): r["cnt"]
        for r in q_hopping_window_batch(spark, d).collect()
    }
    expect: dict = {}
    for user, off, etype in rows:
        for k in range(3):  # the 3 covering 6h/2h-slide windows
            start = ((_BASE_US + off) // _H2 - k) * _H2
            expect[(start, etype)] = expect.get((start, etype), 0) + 1
    assert got == expect, rows


def _py_sessions(rows, merge_at_boundary):
    """Reference sessionization: per user, ordered by (ts, event_id), a new
    session starts when the µs gap exceeds _GAP (strictly — an exactly-gap
    delta merges iff merge_at_boundary, which both engines do)."""
    per_user: dict = {}
    for eid, (user, off, _etype) in enumerate(rows):
        per_user.setdefault(user, []).append((_BASE_US + off, eid))
    out = []
    for user, evs in per_user.items():
        evs.sort()
        sessions = []
        for ts, _eid in evs:
            threshold = _GAP if merge_at_boundary else _GAP - 1
            if sessions and ts - sessions[-1][-1] <= threshold:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        for s in sessions:
            out.append((user, len(s), min(s), max(s)))
    return sorted(out)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_sessionize_matches_gap_reference(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_sessionize

    d = _write_events(spark, tmp_path, rows)
    got = sorted(
        (
            r["user_id"],
            r["n_events"],
            _us(r["session_start"]),
            _us(r["session_end"]),
        )
        for r in q_sessionize(spark, d).collect()
    )
    assert got == _py_sessions(rows, merge_at_boundary=True), rows


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_session_window_matches_gap_reference(spark, tmp_path, rows):
    """Native F.session_window agrees with the same reference; its window
    end is last event + gap (and total_value == n_events since value=1)."""
    from api_log_iceberg_test_spark.queries.analytics import q_session_window_batch

    d = _write_events(spark, tmp_path, rows)
    got = sorted(
        (
            r["user_id"],
            r["n_events"],
            _us(r["session_start"]),
            _us(r["session_end"]) - _GAP,
        )
        for r in q_session_window_batch(spark, d).collect()
    )
    assert got == _py_sessions(rows, merge_at_boundary=True), rows
    for r in q_session_window_batch(spark, d).collect():
        assert r["total_value"] == float(r["n_events"])


# --- r12: watermark accounting (q_watermark_accounting's core semantics) ---

_wm_rows = st.lists(
    st.tuples(
        st.integers(0, 8 * 3600 * 1_000_000),  # event-time micros (8h span)
        st.integers(-40 * 60 * 1_000_000, 40 * 60 * 1_000_000),  # arrival jitter
    ),
    min_size=1,
    max_size=50,
)


@given(rows=_wm_rows)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_watermark_accounting_matches_bruteforce(spark, rows):
    """The batch watermark-accounting pipeline (exclusive_prefix_max over
    a jittered arrival order → on_time/late_accepted/dropped per 1-h
    window) against a row-at-a-time Python replay of streaming watermark
    state: same per-window category counts and max lateness, including
    boundary rows (window_end exactly at the watermark ⇒ dropped;
    event time exactly equal to the running max ⇒ on_time)."""
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators import layout

    delay = 300 * 1_000_000
    hour = 3_600_000_000
    data = [
        (i, _BASE_US + t, _BASE_US + t + j) for i, (t, j) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "eid long, tsu long, arr_us long").select(
        "tsu", F.struct("arr_us", "eid").alias("_arr")
    )
    marked = layout.exclusive_prefix_max(df, "_arr", "tsu", "prev_max")
    ws_us = F.expr("tsu div 3600000000") * F.lit(hour)
    prev = F.col("prev_max")
    on_time = prev.isNull() | (F.col("tsu") >= prev)
    dropped = (~on_time) & (ws_us + F.lit(hour) <= prev - F.lit(delay))
    got = {
        r["w"]: (r["n_on"], r["n_late"], r["n_drop"], r["max_late"])
        for r in marked.select(
            ws_us.alias("w"),
            F.when(on_time, 1).otherwise(0).alias("_on"),
            F.when((~on_time) & (~dropped), 1).otherwise(0).alias("_la"),
            F.when(dropped, 1).otherwise(0).alias("_dr"),
            F.when(prev > F.col("tsu"), prev - F.col("tsu")).alias("_lat"),
        )
        .groupBy("w")
        .agg(
            F.sum("_on").alias("n_on"),
            F.sum("_la").alias("n_late"),
            F.sum("_dr").alias("n_drop"),
            F.max("_lat").alias("max_late"),
        )
        .collect()
    }

    # python replay: process rows in arrival order, maintaining the
    # running max exactly as a streaming engine's watermark state would
    want = {}
    best = None
    for eid, tsu, _arr in sorted(data, key=lambda r: (r[2], r[0])):
        w = tsu // hour * hour
        cat_on = best is None or tsu >= best
        cat_drop = (not cat_on) and (w + hour <= best - delay)
        lateness = best - tsu if (best is not None and best > tsu) else None
        o, l, d, ml = want.get(w, (0, 0, 0, None))
        want[w] = (
            o + (1 if cat_on else 0),
            l + (1 if (not cat_on and not cat_drop) else 0),
            d + (1 if cat_drop else 0),
            ml if lateness is None else (lateness if ml is None else max(ml, lateness)),
        )
        best = tsu if best is None else max(best, tsu)
    assert got == want
