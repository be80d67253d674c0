"""Semantic tests for the round-7 operators (evaluation statistics,
feature screening, corpus-value measurement, embedding mining, batching
efficiency). Each operator's headline claim gets a planted-data or
invariant check beyond the DuckDB hash oracle."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

import __spark_entry__ as em

_QUERIES = em.queries()


# --- q_bootstrap_ci ----------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_dir):
    rows = {r["event_type"]: r for r in _QUERIES["q_bootstrap_ci"](spark, sf_dir).collect()}
    again = {r["event_type"]: r for r in _QUERIES["q_bootstrap_ci"](spark, sf_dir).collect()}
    assert rows.keys() == again.keys()
    for t, r in rows.items():
        assert r == again[t]  # no RNG state anywhere
        assert r["boot_se"] > 0
        assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        # CI is symmetric by construction
        assert abs((r["ci_hi"] - r["mean_value"]) - (r["mean_value"] - r["ci_lo"])) < 1e-4


def test_bootstrap_ci_se_shrinks_with_n(spark, sf_dir):
    """SE ~ sd/sqrt(n): the per-type bootstrap SE must be within a small
    factor of the analytic standard error of the mean."""
    from api_log_iceberg_test_spark.schema import load_table
    from pyspark.sql import functions as F

    stats = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.stddev_samp("value").alias("sd"),
        )
        .collect()
    }
    for r in _QUERIES["q_bootstrap_ci"](spark, sf_dir).collect():
        s = stats[r["event_type"]]
        analytic = s["sd"] / math.sqrt(s["n"])
        assert 0.4 * analytic < r["boot_se"] < 2.5 * analytic, (
            r["event_type"],
            r["boot_se"],
            analytic,
        )
        assert r["n_events"] == s["n"]


# --- q_woe_iv ----------------------------------------------------------------


def test_woe_iv_matches_hand_computation(spark, sf_dir):
    from api_log_iceberg_test_spark.schema import load_table
    from pyspark.sql import functions as F

    g = {
        r["o_orderpriority"]: (r["pos"], r["neg"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("int")).alias("pos"),
            F.sum((F.col("o_orderstatus") != "F").cast("int")).alias("neg"),
        )
        .collect()
    }
    pt = sum(p for p, _ in g.values())
    nt = sum(n for _, n in g.values())
    iv = sum(
        (p / pt - n / nt) * math.log((p / pt) / (n / nt)) for p, n in g.values()
    )
    rows = _QUERIES["q_woe_iv"](spark, sf_dir).collect()
    for r in rows:
        p, n = g[r["o_orderpriority"]]
        assert r["n_orders"] == p + n and r["n_pos"] == p
        assert abs(r["woe"] - math.log((p / pt) / (n / nt))) < 1e-5
        assert abs(r["iv"] - iv) < 1e-5  # IV identical on every row


# --- q_kappa_agreement -------------------------------------------------------


def test_kappa_perfect_and_independent_agreement(spark, monkeypatch):
    """Planted corpora: identical raters → κ=1; a rater that is constant
    has zero chance-corrected information → κ=0."""
    from api_log_iceberg_test_spark.operators import registry

    def run(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        monkeypatch.setattr(registry, "load_table", lambda *_a, **_k: df)
        out = registry.q_kappa_agreement(spark, "unused").collect()[0]
        monkeypatch.undo()
        return out

    long_text = " ".join(["word"] * 80)  # ≥60 tokens AND ≥300 chars
    short_text = "tiny"
    perfect = run(
        [(i, long_text, len(long_text)) for i in range(5)]
        + [(i + 5, short_text, len(short_text)) for i in range(5)]
    )
    assert perfect["kappa"] == 1.0 and perfect["p_observed"] == 1.0
    # rater A constant-negative (all n_chars small), rater B splits:
    # p_o == p_e exactly → kappa 0
    mixed = run(
        [(i, long_text, 10) for i in range(5)]
        + [(i + 5, short_text, 10) for i in range(5)]
    )
    assert mixed["kappa"] == 0.0


# --- q_padding_waste ---------------------------------------------------------


def test_padding_waste_bucket_invariants(spark, sf_dir):
    rows = _QUERIES["q_padding_waste"](spark, sf_dir).collect()
    assert rows, "corpus must produce at least one bucket"
    for r in rows:
        cap = r["bucket_cap"]
        assert cap & (cap - 1) == 0 and cap <= 512  # power of two, clamped
        assert 0 <= r["waste_frac"] < 1
        # identity: padded + actual = docs × cap
        assert r["total_tokens"] + r["pad_tokens"] == r["n_docs"] * cap


# --- q_seasonality_strength --------------------------------------------------


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_seasonality_strength_planted_signal(spark, monkeypatch):
    """A value that is a pure function of (dow, hour) has strength ≈ 1;
    a value independent of the cycle has strength ≈ 0."""
    from api_log_iceberg_test_spark.operators import registry

    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for day in range(28):
        for hour in range(0, 24, 3):
            ts = base + dt.timedelta(days=day, hours=hour)
            seasonal = float(10 * ts.weekday() + hour)
            noise = float((i * 2654435761) % 1000) / 100.0
            rows.append((i, ts, 1, "seasonal", seasonal, ""))
            rows.append((i, ts, 1, "noise", noise, ""))
            i += 1
    df = _events_df(spark, rows)
    monkeypatch.setattr(registry, "load_table", lambda *_a, **_k: df)
    out = {
        r["event_type"]: r
        for r in registry.q_seasonality_strength(spark, "unused").collect()
    }
    assert out["seasonal"]["strength"] == 1.0  # residuals exactly zero
    assert out["noise"]["strength"] < 0.3


# --- q_curriculum_pacing -----------------------------------------------------


def test_curriculum_pacing_monotone_and_complete(spark, sf_dir):
    from api_log_iceberg_test_spark.schema import load_table

    rows = _QUERIES["q_curriculum_pacing"](spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(8))
    n_total = load_table(spark, sf_dir, "documents").count()
    prev = 0
    for r in rows:
        assert r["max_tier"] == r["step"] // 2
        assert r["n_admitted"] >= prev  # pacing only ever admits more
        prev = r["n_admitted"]
    assert rows[-1]["n_admitted"] == n_total  # final steps train on everything
    assert rows[0]["n_admitted"] < n_total  # early steps are restricted


# --- q_ngram_novelty ---------------------------------------------------------


def test_ngram_novelty_first_slice_and_conservation(spark, sf_dir):
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators import dedup
    from api_log_iceberg_test_spark.schema import load_table

    rows = _QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    by_slice = {r["slice"]: r for r in rows}
    assert by_slice[0]["new_frac"] == 1.0  # nothing precedes slice 0
    total_new = sum(r["n_new"] for r in rows)
    distinct_tris = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(dedup.word_shingles("text", 3)).alias("t"))
        .distinct()
        .count()
    )
    assert total_new == distinct_tris  # every trigram first-seen exactly once
    for r in rows:
        assert 0 < r["n_new"] <= r["n_shingles"]


# --- q_ece_calibration -------------------------------------------------------


def test_ece_bins_and_weighting(spark, sf_dir):
    rows = _QUERIES["q_ece_calibration"](spark, sf_dir).collect()
    assert rows and all(0 <= r["bin"] <= 9 for r in rows)
    ece = {r["ece"] for r in rows}
    assert len(ece) == 1  # same ECE on every row
    # ECE is the N-weighted mean gap — recompute from the bins
    n_tot = sum(r["n"] for r in rows)
    manual = sum(
        r["n"] / n_tot * abs(r["accuracy"] - r["confidence"]) for r in rows
    )
    assert abs(next(iter(ece)) - manual) < 1e-4
    for r in rows:
        assert 0.0 <= r["confidence"] <= 1.0 and 0.0 <= r["accuracy"] <= 1.0


# --- q_ab_ttest --------------------------------------------------------------


def test_ab_ttest_matches_scipy_free_reference(spark, sf_dir):
    """Welch t against a driver-side reference computed with plain
    Python floats from the raw values."""
    from api_log_iceberg_test_spark.schema import load_table

    vals = {"click": [], "view": []}
    for r in (
        load_table(spark, sf_dir, "events")
        .filter("event_type IN ('click','view')")
        .select("event_type", "value")
        .collect()
    ):
        vals[r["event_type"]].append(r["value"])
    import statistics

    na, nb = len(vals["click"]), len(vals["view"])
    ma, mb = statistics.fmean(vals["click"]), statistics.fmean(vals["view"])
    va, vb = statistics.variance(vals["click"]), statistics.variance(vals["view"])
    t_ref = (ma - mb) / math.sqrt(va / na + vb / nb)
    r = _QUERIES["q_ab_ttest"](spark, sf_dir).collect()[0]
    assert r["n_click"] == na and r["n_view"] == nb
    assert abs(r["t_stat"] - t_ref) < 1e-3
    assert r["df_welch"] > min(na, nb) - 1  # Welch df ≥ smaller-sample df


# --- q_join_skew_probe -------------------------------------------------------


def test_join_skew_probe_invariants(spark, sf_dir):
    r = _QUERIES["q_join_skew_probe"](spark, sf_dir).collect()[0]
    assert r["n_rows"] >= r["n_keys"] >= 1
    assert r["max_freq"] >= r["p99_freq"] >= r["p50_freq"] >= 1
    assert r["skew_ratio"] >= 1.0
    assert abs(r["mean_freq"] - r["n_rows"] / r["n_keys"]) < 1e-4


# --- q_rank_biased_overlap ---------------------------------------------------


def test_rbo_bounds_and_self_agreement(spark, sf_dir, monkeypatch):
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators import registry

    r = _QUERIES["q_rank_biased_overlap"](spark, sf_dir).collect()[0]
    assert 0 <= r["overlap_at_k"] <= 20
    assert 0.0 <= r["rbo"] <= 1.0
    # identical rankings (patch ranking B's score to ranking A's) →
    # overlap d/d = 1 at every depth, so RBO@20 = (1-p)·Σ p^(d-1)
    monkeypatch.setattr(registry.text, "token_count", lambda c: F.col("n_chars"))
    same = registry.q_rank_biased_overlap(spark, sf_dir).collect()[0]
    monkeypatch.undo()
    expect = sum((1 - 0.9) * 0.9 ** (d - 1) for d in range(1, 21))
    assert same["overlap_at_k"] == 20
    assert abs(same["rbo"] - round(expect, 6)) < 1e-6


# --- q_source_balance --------------------------------------------------------


def test_source_balance_statistics(spark, sf_dir):
    rows = _QUERIES["q_source_balance"](spark, sf_dir).collect()
    shares = [r["share"] for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-4
    k = len(rows)
    g, e = rows[0]["gini"], rows[0]["entropy"]
    assert all(r["gini"] == g and r["entropy"] == e for r in rows)
    assert 0 <= g <= 1 - 1 / k + 1e-9  # Gini bounded by uniform case
    assert 0 <= e <= math.log(k) + 1e-9
    assert 1 <= rows[0]["effective_sources"] <= k + 1e-6
    # uniform-ish corpus → effective count close to k
    assert abs(rows[0]["effective_sources"] - math.exp(e)) < 1e-4


# --- q_mi_feature_label ------------------------------------------------------


def test_mi_matches_python_reference_and_independence_floor(spark, sf_dir):
    from api_log_iceberg_test_spark.schema import load_table

    cells = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .count()
        .collect()
    ):
        cells[(r[0], r[1])] = r["count"]
    n = sum(cells.values())
    mx, my = {}, {}
    for (x, y), c in cells.items():
        mx[x] = mx.get(x, 0) + c
        my[y] = my.get(y, 0) + c
    mi_ref = sum(
        c / n * math.log(c * n / (mx[x] * my[y])) for (x, y), c in cells.items()
    )
    rows = _QUERIES["q_mi_feature_label"](spark, sf_dir).collect()
    assert len(rows) == len(cells)
    assert abs(rows[0]["mi"] - mi_ref) < 1e-5
    assert rows[0]["mi"] >= -1e-9  # MI is non-negative


# --- q_survivorship_golden ---------------------------------------------------


def test_survivorship_rules_on_planted_clusters(spark, monkeypatch):
    """Planted duplicate cluster: canonical = longest member with min-id
    tie-break; representative = min id; singletons flagged unmerged."""
    from api_log_iceberg_test_spark.operators import registry

    rows = [
        # cluster A: same normalized text, lengths 30/50/50 → canonical
        # is id 11 (first of the two 50s), rep is 10
        (10, "  Hello   World  ", "en", "s1", 30),
        (11, "hello world", "en", "s2", 50),
        (12, "HELLO  WORLD", "en", "s1", 50),
        # singleton
        (20, "unique text here", "en", "s1", 16),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(registry, "load_table", lambda *_a, **_k: df)
    out = {r["rep_id"]: r for r in registry.q_survivorship_golden(spark, "x").collect()}
    monkeypatch.undo()
    a = out[10]
    assert a["n_members"] == 3 and a["is_merged"] == 1
    assert a["canonical_id"] == 11 and a["canonical_chars"] == 50
    assert a["n_sources"] == 2
    s = out[20]
    assert s["n_members"] == 1 and s["is_merged"] == 0 and s["canonical_id"] == 20


# --- q_power_analysis --------------------------------------------------------


def test_power_analysis_consistency_with_ttest(spark, sf_dir):
    """MDE and the observed delta must be consistent with the t-test: if
    |t| > z_total then the observed delta exceeds the MDE, and the
    required-n grows as delta shrinks relative to the spread."""
    t = _QUERIES["q_ab_ttest"](spark, sf_dir).collect()[0]
    p = _QUERIES["q_power_analysis"](spark, sf_dir).collect()[0]
    assert p["n_click"] == t["n_click"] and p["n_view"] == t["n_view"]
    z_total = 1.959964 + 0.841621
    # mde = z_total * se and t = delta / se  →  |delta| >= mde ⇔ |t| >= z
    se = p["mde"] / z_total
    assert abs(abs(t["t_stat"]) - abs(p["observed_delta"]) / se) < 0.01
    assert p["n_required_per_arm"] >= 1


# --- exact-grid accumulation (r07 sf1.0 sweep fix) ---------------------------


def test_grid_accumulation_is_layout_invariant(spark):
    """The sf1.0 sweep showed fp SUM association flips ROUND boundaries
    (engines disagree); the exact-grid fix also makes totals invariant
    to PHYSICAL layout. Pin that: session-style group totals over the
    grid are bit-identical across repartitionings, and equal the exact
    decimal reference computed driver-side."""
    import decimal

    from pyspark.sql import functions as F

    # values chosen for poor binary representation (0.1-style tails)
    rows = [(i % 7, 0.1 + i * 0.0001) for i in range(2000)]
    ref = {}
    for k, v in rows:
        u = int(
            decimal.Decimal(v * 1e6 + 0.5).to_integral_value(
                rounding=decimal.ROUND_FLOOR
            )
        )
        ref[k] = ref.get(k, 0) + u
    expect = {
        k: float(int((u / 1e4 + 0.5) // 1)) / 1e2 for k, u in ref.items()
    }

    def grid_total(df):
        units = F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
        return {
            r["k"]: r["t"]
            for r in df.groupBy("k")
            .agg((F.floor(F.sum(units).cast("double") / 1e4 + F.lit(0.5)) / 1e2).alias("t"))
            .collect()
        }

    base = spark.createDataFrame(rows, "k int, v double")
    a = grid_total(base.repartition(1))
    b = grid_total(base.repartition(16, "v"))
    assert a == b == expect


def test_welch_grid_moments_layout_invariant(spark):
    """The shared A/B moment builder must return bit-identical doubles
    whatever the physical layout — its outputs feed ROUND and
    q_power_analysis's uncushioned CEIL, where one ulp of partial-sum
    association would flip a hash-gated value. Drive the REAL production
    expressions (_welch_grid_moments_from) over the same synthetic arm
    data under maximally different repartitionings and require exact
    equality of all six derived moments."""
    from api_log_iceberg_test_spark.operators.registry import (
        _welch_grid_moments_from,
    )

    # poor-binary-representation values across both arms
    rows = [
        ("click" if i % 3 == 0 else "view", 0.1 + (i % 997) * 0.0007)
        for i in range(6000)
    ]
    base = spark.createDataFrame(rows, "event_type string, value double")
    a = _welch_grid_moments_from(base.repartition(1)).collect()[0]
    b = _welch_grid_moments_from(base.repartition(32, "value")).collect()[0]
    c = _welch_grid_moments_from(base.repartition(7, "event_type")).collect()[0]
    assert a == b == c  # exact float equality — bit-identical moments


# --- q_hard_negatives --------------------------------------------------------


def test_hard_negatives_constraints_and_quantization_fidelity(spark, sf_dir):
    from api_log_iceberg_test_spark.schema import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    labels = {r["vec_id"]: r["label"] for r in emb}
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb}

    rows = _QUERIES["q_hard_negatives"](spark, sf_dir).collect()
    anchors = {r["anchor_id"] for r in rows}
    assert anchors == {v for v in labels if v < 10}
    per_anchor: dict[int, list] = {}
    for r in rows:
        assert labels[r["neighbor_id"]] != labels[r["anchor_id"]]
        per_anchor.setdefault(r["anchor_id"], []).append(r)
    for a, rs in per_anchor.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert rs[0]["l1_dist"] <= rs[1]["l1_dist"] <= rs[2]["l1_dist"]
        # quantization fidelity: the rank-1 quantized-L1 neighbor is in the
        # true top-3 by RAW float L1 over the other-label candidates
        cands = sorted(
            (
                float(np.abs(vecs[a] - vecs[v]).sum(), ),
                v,
            )
            for v, l in labels.items()
            if l != labels[a]
        )
        top_raw = {v for _, v in cands[:3]}
        assert rs[0]["neighbor_id"] in top_raw, (a, rs[0], cands[:5])
