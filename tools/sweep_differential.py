"""Differential sweep: every oracled query, Spark vs DuckDB, at any SF dir.

The driver's gate runs at sf0.01; the verify recipe adds sf0.1. Each 10x
step has surfaced a new cross-engine numeric class (r06: q_anomaly_mad's
ROUND flip at sf0.1), so round 7 adds sf1.0 (VERDICT r06 #1) via the
derived tables from tools/make_sf1.py.

Scope control: --skip-heavy excludes the pair/graph families whose cost
is driven by near-dup pair explosion, not numeric arithmetic — the sf1.0
derivation makes every document a 10-replica near-dup cluster, which is
great for dedup semantics but quadratic for exact-pair oracles, and none
of those families are in the numeric-risk taxonomy (rounded doubles, fp
aggregates joined against themselves, modular checksums, quantiles).
They remain covered by the sf0.1 sweep.

Round 8: the --decorrelate derivation (make_sf1.py, .localdata/sf1.0dx)
makes pair growth LINEAR, and 19 of the 22 HEAVY entries got sf1.0-scale
cross-engine records in sweep_sf1.0dx.jsonl (all MATCH; the range-join
entry needed its oracle banded first — see its docstring).

Round 9 closed the last three holdouts (VERDICT r08 #2/#3) — the sf1.0
denylist is now EMPTY:
  * q_pagerank_parts, q_label_propagation — the single-statement
    unrolled-CTE oracles spilled >79 GB in DuckDB at 1M events and died
    on IO (913s/866s, recorded); the sweep now runs their
    stepwise-materialized twins (tools/graph_stepwise_oracle.py —
    identical per-round SQL text, temp-table barriers) and both MATCH
    at sf1.0dx in 48s/89s.
  * q_embedding_neardup — intrinsically all-pairs at threshold 0.42
    (eps = sqrt(2-2t) ~ 1.08 disables the projection pruning), DNF on
    the full 20k-vector corpus; the sweep runs its bounded
    sampled-exact tier at sf1.0* (tools/sampled_tiers.py — 20% of
    originals with all replicas, exact 0.42 semantics, ~2000 pairs),
    recorded with a "tier" tag. The LSH twin remains the recall-traded
    100 TB path.

Usage:
    python tools/sweep_differential.py <sf_dir> [--skip-heavy] [--only n1,n2]
Writes JSONL progress to sweep_<tag>.jsonl next to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: pair-explosion / iterative-graph families — excluded under --skip-heavy
#: (cost ∝ near-dup pairs² or |V| iterations; not numeric-risk)
HEAVY = {
    "q_dedup_ngram_jaccard",
    "q_dedup_canonical",  # 21 min at sf1.0 (passed) — pair-quadratic
    "q_dup_clusters",  # 16 min at sf1.0 (passed) — recursive-CTE components
    "q_embedding_neardup",  # killed at 35+ min — O(pairs) under replica clusters
    "q_embedding_neardup_lsh",
    # DuckDB-oracle-side quadratic at 1M events (no interval-join optimizer
    # path — 27 min at 100% CPU, Spark side idle); the Spark plan is fine
    "q_range_join_nearby_events",
    "q_dedup_minhash_lsh",
    "q_dedup_incremental",
    "q_dedup_spans",
    "q_dedup_cluster_stats",
    "q_cross_source_dups",
    "q_containment_pairs",
    "q_dup_clusters_star",
    "q_decontaminate",
    "q_leakage_safe_split",
    "q_curation_pipeline",
    "q_corpus_datacard",
    "q_fuzzy_match_names",
    "q_source_similarity",
    "q_audience_overlap",
    "q_pagerank",
    "q_pagerank_parts",
    "q_label_propagation",
    "q_triangle_counts",
    "q_lsh_param_sweep",
}


def main() -> None:
    sf_dir = sys.argv[1]
    skip_heavy = "--skip-heavy" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from tests.oracle import compare, duckdb_conn
    from tools.graph_stepwise_oracle import STEPWISE_ORACLES
    from tools.replay_tiers import REPLAY_TIERS
    from tools.sampled_tiers import SAMPLED_TIERS

    qs, osql = em.queries(), em.oracle_sql()
    # spill tuning (VERDICT r10 #4): the sf1.0dx stepwise graph oracles
    # exhausted temp disk on their first pass under defaults; a high
    # explicit memory_limit keeps them in RAM on this 128 GiB box (the
    # concurrent Spark JVM is a few GiB), and the explicit temp dir makes
    # any residual spill visible and cleanable
    con = duckdb_conn(
        sf_dir,
        temp_directory=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "duckdb_tmp",
        ),
        memory_limit=os.environ.get("SWEEP_DUCKDB_MEMLIMIT", "96GB"),
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    # tier gating must survive symlink spellings: .localdata/dx-sf1.0 is a
    # symlink to sf1.0dx (bench.py's SF parser needs the dirname to END in
    # the number), so gate on the RESOLVED basename — otherwise a sweep run
    # through dx-sf1.0 would silently skip the sampled tier and fall back
    # to the all-pairs oracle that DNFs the 20-min box (ADVICE r09 #1)
    real_tag = os.path.basename(os.path.realpath(sf_dir.rstrip("/")))
    log_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"sweep_{tag}.jsonl")
    # rows-only entries with a cross-engine replay oracle (python-xxh64
    # or shared-sig — tools/replay_tiers.py) sweep too, tier-tagged
    names = [n for n in sorted(qs) if n in osql or n in REPLAY_TIERS]
    if skip_heavy:
        names = [n for n in names if n not in HEAVY]
    if only:
        names = [n for n in names if n in only]
    bad = []
    # append, never truncate: a follow-up --only pass must not wipe the
    # earlier passes' results (r07 lost a 39-query pass this way once).
    # Reader convention: take the LAST record per query name that carries
    # "done": true — pass ⇔ done-record with errs null. A trailing start
    # record with no matching done-record means that query KILLED the
    # process (DNF, not a pass); records for since-removed queries are
    # stale and must be cross-checked against the current registry.
    with open(log_path, "a") as log:
        for i, name in enumerate(names):
            log.write(json.dumps({"q": name, "start": True, "i": i}) + "\n")
            log.flush()
            t0 = time.time()
            tier = None
            info = None
            try:
                # the iterative-graph pair runs the stepwise-materialized
                # twin of its CTE oracle (identical per-round SQL text;
                # tools/graph_stepwise_oracle.py) — the CTE form spills
                # >79 GB and dies at sf1.0 (VERDICT r08 #2)
                if name in STEPWISE_ORACLES:
                    odf = STEPWISE_ORACLES[name](con)
                    sdf = qs[name](spark, sf_dir)
                elif name in SAMPLED_TIERS and real_tag.startswith("sf1.0"):
                    # all-pairs families run their bounded sampled-exact
                    # tier at sf1.0 (tools/sampled_tiers.py) — the full
                    # corpus DNFs the 20-min box (VERDICT r08 #3)
                    t = SAMPLED_TIERS[name]
                    tier = t["tier"]
                    odf = con.execute(t["oracle"]).fetchdf()
                    sdf = t["spark"](spark, sf_dir)
                elif name in REPLAY_TIERS:
                    # rows-only entries upgraded to cross-engine evidence:
                    # either a full replay oracle (python-xxh64 UDFs,
                    # shared-sig table, stepwise SQL — exact compare) or a
                    # bounded-invariant check callable (sketch/PQ tiers,
                    # tools/bounded_tiers.py) that certifies the published
                    # accuracy contract against DuckDB exact answers
                    t = REPLAY_TIERS[name]
                    tier = t["tier"]
                    sdf = qs[name](spark, sf_dir)
                    if "check" in t:
                        res = t["check"](sdf, con)
                        if isinstance(res, dict):  # optional measured-info
                            errs, info = res.get("errs") or [], res.get("info")
                        else:
                            errs = res
                        odf = None
                    else:
                        odf = t["oracle"](con)
                else:
                    odf = con.execute(osql[name]).fetchdf()
                    sdf = qs[name](spark, sf_dir)
                if odf is not None:
                    errs = compare(sdf, odf, name)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                errs = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
            dt = round(time.time() - t0, 2)
            row = {
                "q": name,
                "done": True,
                "sec": dt,
                "errs": errs or None,
                "i": i,
                "n": len(names),
            }
            if tier:
                row["tier"] = tier
            if info:
                row["info"] = info
            log.write(json.dumps(row) + "\n")
            log.flush()
            if errs:
                bad.append(errs)
                print("MISMATCH", name, errs, flush=True)
            else:
                print(f"[{i + 1}/{len(names)}] {name} ok {dt}s", flush=True)
    print("SWEEP DONE", sf_dir, "queries:", len(names), "mismatches:", len(bad))
    for b in bad:
        print("  ", b)
    spark.stop()


if __name__ == "__main__":
    main()
