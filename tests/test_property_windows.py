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
