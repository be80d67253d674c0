"""Property-based triangulation of the as-of join family.

Each variant already has a DuckDB oracle (the same union-marker SQL) and
hand-built boundary fixtures; this adds a THIRD independent
implementation — a direct per-user candidate search in integer
microseconds — over random event streams with deliberately frequent
exact-timestamp collisions, pinning the documented tie-breaks:
backward = latest right at-or-before (equal-ts ties -> max id),
forward = earliest right at-or-after (ties -> min id),
nearest = closer side by |delta-t| with exact ties resolving backward.
"""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

# coarse offsets (whole seconds over a few minutes) so equal-ts collisions
# and symmetric |delta-t| ties occur often, plus microsecond jitter cases
_offsets = st.one_of(
    st.integers(0, 180).map(lambda s: s * 1_000_000),
    st.sampled_from([0, 1, 999_999, 1_000_000, 90_000_000, 90_000_001]),
)

_events = st.lists(
    st.tuples(
        st.integers(0, 1),
        _offsets,
        st.sampled_from(["purchase", "signup", "click", "view"]),
    ),
    min_size=1,
    max_size=18,
)

_counter = itertools.count()


def _write_events(spark, tmp_path, rows):
    data = [
        (i, _BASE + dt.timedelta(microseconds=off), user, etype, 1.0, "{}")
        for i, (user, off, etype) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / f"asof{next(_counter)}")
    df.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def _sides(rows):
    lefts, rights = [], {}
    for eid, (user, off, etype) in enumerate(rows):
        if etype == "purchase":
            lefts.append((user, off, eid))
        elif etype in ("signup", "click"):
            rights.setdefault(user, []).append((off, eid))
    return lefts, rights


def _backward(cands, t):
    """Latest right at-or-before t; equal-ts ties take the max id."""
    hits = [(rt, rid) for rt, rid in cands if rt <= t]
    return max(hits)[1] if hits else None


def _forward(cands, t):
    """Earliest right at-or-after t; equal-ts ties take the min id."""
    hits = [(rt, rid) for rt, rid in cands if rt >= t]
    return min(hits)[1] if hits else None


def _ts_of(rows, rid):
    return rows[rid][1] if rid is not None else None


_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(_events)
def test_asof_backward_matches_candidate_search(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_asof_join

    d = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["event_id"]): r["prior_event_id"]
        for r in q_asof_join(spark, d).collect()
    }
    lefts, rights = _sides(rows)
    expect = {
        (u, eid): _backward(rights.get(u, []), t) for u, t, eid in lefts
    }
    assert got == expect, rows


@settings(**_SETTINGS)
@given(_events)
def test_asof_forward_matches_candidate_search(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_asof_join_forward

    d = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["event_id"]): r["next_event_id"]
        for r in q_asof_join_forward(spark, d).collect()
    }
    lefts, rights = _sides(rows)
    expect = {
        (u, eid): _forward(rights.get(u, []), t) for u, t, eid in lefts
    }
    assert got == expect, rows


@settings(**_SETTINGS)
@given(_events)
def test_asof_nearest_matches_candidate_search(spark, tmp_path, rows):
    from api_log_iceberg_test_spark.queries.analytics import q_asof_join_nearest

    d = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["event_id"]): (r["nearest_event_id"], r["direction"])
        for r in q_asof_join_nearest(spark, d).collect()
    }
    lefts, rights = _sides(rows)
    expect = {}
    for u, t, eid in lefts:
        cands = rights.get(u, [])
        b, f = _backward(cands, t), _forward(cands, t)
        if b is None and f is None:
            expect[(u, eid)] = (None, None)
        elif b is None:
            expect[(u, eid)] = (f, "forward")
        elif f is None:
            expect[(u, eid)] = (b, "backward")
        else:
            db = t - rows[b][1]
            df_ = rows[f][1] - t
            # exact |delta-t| ties (incl. the same-instant case) -> backward
            expect[(u, eid)] = (f, "forward") if df_ < db else (b, "backward")
    assert got == expect, rows
