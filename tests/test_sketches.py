"""HLL sketch rollups: estimate accuracy and merge losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import sketches
from api_log_iceberg_test_spark.schema import load_table


def test_daily_estimates_near_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.hll_daily_sketches(ev, time_col="ts", value_col="user_id")
    got = {r["day"]: r["est_distinct"] for r in daily.collect()}
    want = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for day, est in got.items():
        # lgK=12 → rsd ~1.6%; allow 5% plus slack for tiny days
        assert abs(est - want[day]) <= max(3, 0.05 * want[day]), (day, est, want[day])


def test_merged_sketch_equals_direct_sketch(spark, sf_dir):
    """The property that makes rollups usable: union of daily sketches gives
    EXACTLY the estimate of one sketch built over all the raw data."""
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.hll_daily_sketches(ev, time_col="ts", value_col="user_id")
    merged = sketches.hll_merge_estimate(daily).collect()[0]["est_total"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert merged == direct


def test_kll_n_exact_and_quantiles_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.kll_daily_sketches(ev, time_col="ts", value_col="value")
    # n per day is exact — KLL tracks the stream length losslessly
    exact_daily = {
        r["day"]: r["cnt"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in daily.collect():
        assert r["n"] == exact_daily[r["day"]]

    merged = sketches.kll_merge_quantiles(daily, [0.5, 0.9, 0.99]).collect()[0]
    n_total = ev.count()
    assert merged["n"] == n_total
    # rank error: the value returned for prob p must sit within eps of p in
    # the TRUE cdf (k=200 → eps ~1.65%; use 5% for slack)
    vals = sorted(r["value"] for r in ev.select("value").collect())
    import bisect

    for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        v = merged[col]
        rank = bisect.bisect_right(vals, v) / n_total
        assert abs(rank - p) < 0.05, (col, v, rank)


def test_kll_merge_matches_direct_build(spark, sf_dir):
    """Folding daily sketches must agree with a sketch built over the whole
    range in one pass (same k): identical n, quantiles within 2*eps."""
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.kll_daily_sketches(ev, time_col="ts", value_col="value")
    merged = sketches.kll_merge_quantiles(daily, [0.5, 0.99]).collect()[0]
    direct = (
        ev.agg(
            F.kll_sketch_agg_double(F.col("value").cast("double"), F.lit(200)).alias(
                "sketch"
            )
        )
        .select(
            F.kll_sketch_get_n_double("sketch").alias("n"),
            F.kll_sketch_get_quantile_double("sketch", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sketch", F.lit(0.99)).alias("p99"),
        )
        .collect()[0]
    )
    assert merged["n"] == direct["n"]
    vals = sorted(r["value"] for r in ev.select("value").collect())
    import bisect

    for col in ["p50", "p99"]:
        ra = bisect.bisect_right(vals, merged[col]) / merged["n"]
        rb = bisect.bisect_right(vals, direct[col]) / direct["n"]
        assert abs(ra - rb) < 0.04, (col, merged[col], direct[col])


def test_cms_bounds_and_merge_losslessness(spark, sf_dir):
    from api_log_iceberg_test_spark.operators import sketches
    from api_log_iceberg_test_spark.schema import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    daily = sketches.cms_daily_sketches(ev)
    merged = sketches.cms_merge(spark, daily)
    est = {
        r["key"]: r["est_cnt"]
        for r in sketches.cms_estimate_counts(spark, merged, sorted(exact)).collect()
    }
    eps = 0.001
    for k, true_cnt in exact.items():
        assert est[k] >= true_cnt, (k, est[k], true_cnt)
        assert est[k] <= true_cnt + eps * n_total, (k, est[k], true_cnt)
    # merge losslessness: CMS merge is counter addition, so the merged
    # sketch must estimate identically to one built over the whole table
    whole = ev.agg(
        F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("sketch")
    )
    direct = sketches.cms_merge(spark, whole)
    for k in exact:
        assert merged.estimateCount(k) == direct.estimateCount(k), k


def test_cms_empty_input(spark):
    from api_log_iceberg_test_spark.operators import sketches

    empty = spark.createDataFrame([], "ts timestamp, event_type string")
    daily = sketches.cms_daily_sketches(empty)
    assert sketches.cms_merge(spark, daily) is None
    out = sketches.cms_estimate_counts(spark, None, ["x"])
    assert [tuple(r) for r in out.collect()] == [("x", 0)]


def test_kll_window_drift_n_exact_and_quantiles_bounded(spark, sf_dir):
    """Sliding-window composition (round 6): per-window n must be EXACT
    (sum of the merged daily stream lengths), quantiles within KLL rank
    error of the exact window distribution, and the drift columns must be
    exactly the difference of consecutive windows' quantiles."""
    import bisect
    import datetime

    ev = load_table(spark, sf_dir, "events")
    daily = sketches.kll_daily_sketches(ev, time_col="ts", value_col="value")
    drift = sketches.kll_window_drift(daily, window_days=7).collect()

    by_day = {}
    for r in ev.select(F.to_date("ts").alias("day"), "value").collect():
        by_day.setdefault(r["day"], []).append(float(r["value"]))
    days = sorted(by_day)
    assert [r["day"] for r in drift] == days  # one window per real day

    rows = {r["day"]: r for r in drift}
    for day in days:
        lo = day - datetime.timedelta(days=6)
        window_vals = sorted(
            v for d, vs in by_day.items() if lo <= d <= day for v in vs
        )
        r = rows[day]
        assert r["n"] == len(window_vals), (day, r["n"], len(window_vals))
        assert r["days_in_window"] == sum(1 for d in days if lo <= d <= day)
        for p, col in [(0.5, "p50"), (0.95, "p95")]:
            rank = bisect.bisect_right(window_vals, r[col]) / len(window_vals)
            assert abs(rank - p) < 0.05, (day, col, r[col], rank)

    # drift = this window's quantile minus the previous day's window's
    for prev_day, day in zip(days, days[1:]):
        for col in ("p50", "p95"):
            want = round(rows[day][col] - rows[prev_day][col], 6)
            assert abs(rows[day][f"d_{col}"] - want) < 1e-9
    assert rows[days[0]]["d_p50"] is None and rows[days[0]]["d_p95"] is None


def test_kll_window_drift_with_gap_days(spark):
    """Non-contiguous rollups (ingestion outages, partitions still in
    flight): windows must end ONLY on days that exist, each trailing
    window must cover exactly the existing days in its range, n stays
    exact, and the drift join pairs a day with the previous CALENDAR day
    (absent day → NULL drift, not the last available window)."""
    import datetime

    base = datetime.date(2024, 3, 1)
    # days 0,1,2 then a 4-day gap, then 7,8 — values chosen distinct/day
    day_values = {
        0: [1.0, 2.0, 3.0],
        1: [10.0, 20.0],
        2: [5.0],
        7: [100.0, 200.0, 300.0, 400.0],
        8: [7.0],
    }
    flat = [(d, v) for d, vs in day_values.items() for v in vs]
    rows = [
        (
            i,
            datetime.datetime.combine(
                base + datetime.timedelta(days=d), datetime.time(12, 0)
            ),
            float(v),
        )
        for i, (d, v) in enumerate(flat)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    daily = sketches.kll_daily_sketches(ev, time_col="ts", value_col="value")
    got = {r["day"]: r for r in sketches.kll_window_drift(daily, window_days=3).collect()}

    want_days = {base + datetime.timedelta(days=d) for d in day_values}
    assert set(got) == want_days  # no window for any absent day
    for d, vs in day_values.items():
        day = base + datetime.timedelta(days=d)
        in_win = [
            dd for dd in day_values
            if 0 <= d - dd <= 2
        ]
        r = got[day]
        assert r["days_in_window"] == len(in_win)
        assert r["n"] == sum(len(day_values[dd]) for dd in in_win)
    # day 7 follows a gap: no window ended on day 6 → drift is NULL
    assert got[base + datetime.timedelta(days=7)]["d_p50"] is None
    # day 8 pairs with day 7's window
    assert got[base + datetime.timedelta(days=8)]["d_p50"] is not None
