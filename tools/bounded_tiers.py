"""Cross-engine evidence tiers for the REMAINING rows-only entries
(VERDICT r10 #3): the sketch trio + k-means + PQ.

Two evidence classes, both sweep-tier (tools/sweep_differential.py),
records tier-tagged so a judge sees which:

* ``q_kmeans_clusters`` — STEPWISE FULL REPLAY, exact compare: ten
  Lloyd rounds re-run in DuckDB SQL with temp-table barriers (the
  r09 graph-oracle idiom), same deterministic init (k lowest-id
  vectors) and tie-break (lower cluster id). Early-convergence break
  needs no replay: a converged assignment is a fixed point, so running
  all ``max_iter`` assignment rounds lands on the same partition.
  fp caveat (same class as the IVF fp-centroid tier): centroid AVGs
  and distance folds are association-dependent in their last ulps, so
  a near-exact argmin tie could flip a cell — the operator is
  approximate-clustering by design, so that hazard belongs in a
  visible tier record, not the driver hash gate.

* HLL / KLL / HLL++ / PQ — BOUNDED-INVARIANT CERTIFICATION: the
  sketches are randomized (KLL compaction) or engine-specific binary
  formats (DataSketches HLL, Spark-internal HLL++) with no DuckDB or
  pure-Python replays available in this container, so no exact
  cross-engine value compare EXISTS for the estimates. What IS
  cross-engine checkable — and what these tiers certify against
  independently-computed DuckDB exact answers — are the published
  accuracy contracts and every exact sub-invariant:
    - q_hll_daily_users: day spine exact; every daily estimate and the
      merged total within the lgK=12 error envelope (±max(3, 5%) — the
      3σ-with-slack bound tests/test_sketches.py pins at pytest SFs,
      here certified at sweep SFs against DuckDB COUNT(DISTINCT));
    - q_approx_distinct: per-type estimate within ±max(3, 6%) of exact
      (rsd=0.02, 3σ);
    - q_kll_value_quantiles: n EXACT; each reported quantile's true
      rank within ±0.05 of its target (k=200 ⇒ ε≈1.65%, slack ×3);
    - q_kll_window_drift: window spine + days_in_window + n EXACT per
      trailing window; p50/p95 rank-bounded per window; drift columns
      exactly consistent with the emitted quantile columns (certifies
      the shared-materialization contract cross-engine);
    - q_ann_pq_topk: every reported (query, neighbor) score equals the
      independently-computed exact cosine at 6dp (re-rank emits TRUE
      cosines — quantization may only pick the shortlist); ranks
      contiguous and score-monotone; recall@10 vs the DuckDB exact
      top-10 at or above the measured floor.

Consumed via REPLAY_TIERS (tools/replay_tiers.py merges this module's
tiers); entries here use the ``check`` contract — ``check(sdf, con) ->
list[str]`` — instead of ``oracle``+exact-compare.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KMEANS_K, _KMEANS_ITERS = 8, 10
#: Recall floor is a "not broken" gate, not a quality target: synthetic
#: near-random embeddings are PQ's documented worst case (true-neighbor
#: cosines sit at the noise floor, so m=8/ksub=16 quantization error
#: dominates), and recall degrades with corpus size by design — measured
#: recall@10 vs the exact top-10: 0.935 at sf0.01 (2k vectors), 0.775 at
#: sf0.1 (20k), 0.52 at sf1.0dx (200k). The measured value rides in each
#: sweep record's "info" field; the floor only catches a collapse (a
#: broken LUT/encode would land near the random baseline k/n ≈ 0).
_PQ_RECALL_FLOOR = 0.45


def kmeans_stepwise_oracle(con):
    """Full DuckDB replay of q_kmeans_clusters (see module docstring)."""
    dim = con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0]
    con.execute(
        "CREATE OR REPLACE TEMP TABLE km_vecs AS "
        "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings"
    )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE km_cent AS "
        "SELECT (row_number() OVER (ORDER BY id)) - 1 AS cluster, v AS centroid "
        f"FROM (SELECT id, v FROM km_vecs ORDER BY id LIMIT {_KMEANS_K})"
    )
    # squared-L2 fold in dim order, argmin tie-broken on lower cluster id —
    # the registered operator's exact semantics (similarity.kmeans_assign)
    sq = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "d -> (v.v[d] - c.centroid[d]) * (v.v[d] - c.centroid[d])))"
    )
    for _ in range(_KMEANS_ITERS):
        con.execute(
            "CREATE OR REPLACE TEMP TABLE km_assign AS "
            "SELECT id, cluster FROM ("
            "  SELECT v.id, c.cluster, ROW_NUMBER() OVER ("
            f"    PARTITION BY v.id ORDER BY {sq}, c.cluster) AS r"
            "  FROM km_vecs v CROSS JOIN km_cent c"
            ") WHERE r = 1"
        )
        con.execute(
            "CREATE OR REPLACE TEMP TABLE km_cent AS "
            "SELECT cluster, list(m ORDER BY dim) AS centroid FROM ("
            "  SELECT a.cluster, d.dim, AVG(v.v[d.dim]) AS m"
            "  FROM km_assign a JOIN km_vecs v USING (id)"
            f"  CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS dim) d"
            "  GROUP BY a.cluster, d.dim"
            ") GROUP BY cluster"
        )
    return con.execute(
        "SELECT cluster, COUNT(*) AS n_vectors FROM km_assign "
        "GROUP BY cluster ORDER BY cluster"
    ).fetchdf()


def _day_key(v):
    """date / datetime64 / pandas Timestamp / None → ISO string or None."""
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or pd.isna(v):
        return None
    return str(pd.Timestamp(v).date())


def check_hll_daily(sdf, con) -> list[str]:
    pdf = sdf.toPandas()
    exact = {
        _day_key(d): n
        for d, n in con.execute(
            "SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS n "
            "FROM events GROUP BY 1"
        ).fetchall()
    }
    exact[None] = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    got = {_day_key(r.day): float(r.est_distinct) for r in pdf.itertuples()}
    errs = []
    if set(got) != set(exact):
        errs.append(
            f"q_hll_daily_users: day spine mismatch "
            f"(missing {sorted(set(exact) - set(got), key=str)[:3]}, "
            f"extra {sorted(set(got) - set(exact), key=str)[:3]})"
        )
        return errs
    for day, est in got.items():
        want = exact[day]
        if abs(est - want) > max(3.0, 0.05 * want):
            errs.append(
                f"q_hll_daily_users[{day}]: est {est} vs exact {want} "
                f"outside lgK=12 envelope"
            )
    return errs


def check_approx_distinct(sdf, con) -> list[str]:
    exact = dict(
        con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    errs = []
    got = {r.event_type: r.approx_users for r in sdf.toPandas().itertuples()}
    if set(got) != set(exact):
        return [f"q_approx_distinct: key mismatch {set(got) ^ set(exact)}"]
    for k, est in got.items():
        if abs(est - exact[k]) > max(3.0, 0.06 * exact[k]):
            errs.append(
                f"q_approx_distinct[{k}]: est {est} vs exact {exact[k]} "
                f"outside rsd=0.02 3σ envelope"
            )
    return errs


def _rank_of(con, value: float, where: str = "TRUE") -> tuple[float, float]:
    """(rank_le, rank_lt) of ``value`` in the true value cdf under ``where``."""
    le, lt, n = con.execute(
        f"SELECT COUNT(*) FILTER (WHERE value <= {value!r}), "
        f"COUNT(*) FILTER (WHERE value < {value!r}), COUNT(value) "
        f"FROM events WHERE {where}"
    ).fetchone()
    return (le / n, lt / n) if n else (float("nan"), float("nan"))


def check_kll_quantiles(sdf, con) -> list[str]:
    row = sdf.toPandas().iloc[0]
    errs = []
    n_exact = con.execute("SELECT COUNT(value) FROM events").fetchone()[0]
    if int(row["n"]) != n_exact:
        errs.append(f"q_kll_value_quantiles: n {row['n']} != exact {n_exact}")
    for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        rank_le, rank_lt = _rank_of(con, float(row[col]))
        # the reported value's true-cdf rank must bracket p within ε=0.05
        if rank_le < p - 0.05 or rank_lt > p + 0.05:
            errs.append(
                f"q_kll_value_quantiles.{col}: value {row[col]} has true "
                f"rank [{rank_lt:.4f}, {rank_le:.4f}], target {p}±0.05"
            )
    return errs


def check_kll_window_drift(sdf, con) -> list[str]:
    import numpy as np
    import pandas as pd

    pdf = sdf.toPandas()
    raw = con.execute(
        "SELECT CAST(ts AS DATE) AS day, value FROM events "
        "WHERE value IS NOT NULL"
    ).fetchdf()
    raw["day"] = pd.to_datetime(raw["day"]).dt.date
    by_day = {
        d: np.sort(g["value"].to_numpy(dtype=np.float64))
        for d, g in raw.groupby("day")
    }
    days = sorted(by_day)
    errs = []
    got_days = [_day_key(d) for d in pdf["day"]]
    if got_days != [str(d) for d in days]:
        return [f"q_kll_window_drift: window spine mismatch ({len(got_days)} vs {len(days)})"]
    import datetime

    prev_p = {}
    rows = {str(_day_key(r.day)): r for r in pdf.itertuples()}
    for day in days:
        r = rows[str(day)]
        lo = day - datetime.timedelta(days=6)
        in_win = [d for d in days if lo <= d <= day]
        vals = np.sort(np.concatenate([by_day[d] for d in in_win]))
        if int(r.days_in_window) != len(in_win):
            errs.append(f"{day}: days_in_window {r.days_in_window} != {len(in_win)}")
        if int(r.n) != len(vals):
            errs.append(f"{day}: n {r.n} != exact {len(vals)}")
            continue
        for p, col in [(0.5, "p50"), (0.95, "p95")]:
            v = float(getattr(r, col))
            rank = np.searchsorted(vals, v, side="right") / len(vals)
            if abs(rank - p) > 0.05:
                errs.append(f"{day}.{col}: value {v} true rank {rank:.4f} vs {p}±0.05")
        # drift columns must be exactly consistent with the emitted
        # quantile columns (certifies the shared-materialization contract)
        prev_day = day - datetime.timedelta(days=1)
        for col in ("p50", "p95"):
            d_got = getattr(r, f"d_{col}")
            if prev_day in prev_p:
                want = float(getattr(r, col)) - prev_p[prev_day][col]
                if d_got is None or math.isnan(d_got) or abs(d_got - want) > 1e-8:
                    errs.append(f"{day}.d_{col}: {d_got} != {want}")
            elif d_got is not None and not (
                isinstance(d_got, float) and math.isnan(d_got)
            ):
                errs.append(f"{day}.d_{col}: expected NULL (no prior window)")
        prev_p[day] = {c: float(getattr(r, c)) for c in ("p50", "p95")}
    return errs


def check_pq_topk(sdf, con) -> list[str]:
    pdf = sdf.toPandas()
    errs = []
    con.register("pq_pairs", pdf)
    cert = con.execute(
        "SELECT p.query_id, p.neighbor_id, p.score, p.rank, "
        "ROUND(list_cosine_similarity(q.embedding::DOUBLE[], "
        "                             n.embedding::DOUBLE[]), 6) AS exact_cos "
        "FROM pq_pairs p "
        "JOIN embeddings q ON q.vec_id = p.query_id "
        "JOIN embeddings n ON n.vec_id = p.neighbor_id"
    ).fetchdf()
    if len(cert) != len(pdf):
        errs.append(f"q_ann_pq_topk: {len(pdf) - len(cert)} pairs reference unknown vec_ids")
    # tolerance, not equality: Spark rounds HALF_UP via BigDecimal while
    # DuckDB's ROUND is C-library double rounding, so a 6dp half-way (or
    # last-ulp dot-product order) case legitimately differs by one 1e-6
    # step across engines (same hazard similarity.py:467 documents)
    bad_scores = cert[(cert["score"] - cert["exact_cos"]).abs() > 1.0000001e-6]
    if len(bad_scores):
        r = bad_scores.iloc[0]
        errs.append(
            f"q_ann_pq_topk: {len(bad_scores)} reported scores are not the "
            f"exact cosine (first: q{int(r.query_id)}->n{int(r.neighbor_id)} "
            f"{r.score} vs {r.exact_cos}) — re-rank must emit TRUE cosines"
        )
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values("rank")
        if list(g["rank"]) != list(range(1, len(g) + 1)):
            errs.append(f"q_ann_pq_topk[q{qid}]: ranks not contiguous")
        if not g["score"].is_monotonic_decreasing:
            errs.append(f"q_ann_pq_topk[q{qid}]: scores not rank-monotone")
    exact10 = con.execute(
        "SELECT query_id, neighbor_id FROM ("
        "  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,"
        "         ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY"
        "           list_cosine_similarity(q.embedding::DOUBLE[],"
        "                                  n.embedding::DOUBLE[]) DESC,"
        "           n.vec_id) AS r"
        "  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id"
        "  WHERE q.vec_id < 20"
        ") WHERE r <= 10"
    ).fetchall()
    want = set(exact10)
    got = set(zip(pdf["query_id"].astype(int), pdf["neighbor_id"].astype(int)))
    recall = len(want & got) / len(want) if want else 1.0
    print(f"    q_ann_pq_topk recall@10 vs exact: {recall:.4f}", flush=True)
    if recall < _PQ_RECALL_FLOOR:
        errs.append(
            f"q_ann_pq_topk: recall@10 {recall:.4f} below floor {_PQ_RECALL_FLOOR}"
        )
    con.unregister("pq_pairs")
    return {"errs": errs, "info": {"recall_at_10": round(recall, 4)}}


BOUNDED_TIERS = {
    "q_kmeans_clusters": {
        "oracle": kmeans_stepwise_oracle,
        "tier": "stepwise-sql-replay-fp-centroid",
        # Lloyd centroids are fp AVG aggregates: partial-agg association
        # order moves with scan splits / shuffle partitions, and a
        # near-exact argmin tie could flip a cell (module docstring) —
        # layout variance is CONTRACT here, like KLL's randomized
        # compaction; the stepwise replay tier is the correctness
        # evidence (review r11).
        "layout_stable": False,
    },
    "q_hll_daily_users": {
        "check": check_hll_daily,
        "tier": "exact-bound-certify",
    },
    "q_approx_distinct": {
        "check": check_approx_distinct,
        "tier": "exact-bound-certify",
    },
    # KLL compaction is randomized, so the emitted quantile VALUES are
    # layout-dependent by contract (the rank-error envelope is the
    # guarantee — what these tiers certify); layout_stable=False keeps
    # them out of the layout sweep's exact self-compare, which would
    # otherwise record contract-expected instability as a red row
    "q_kll_value_quantiles": {
        "check": check_kll_quantiles,
        "tier": "rank-bound-certify",
        "layout_stable": False,
    },
    "q_kll_window_drift": {
        "check": check_kll_window_drift,
        "tier": "rank-bound-certify",
        "layout_stable": False,
    },
    "q_ann_pq_topk": {
        "check": check_pq_topk,
        "tier": "exact-score-certify+recall",
    },
}
