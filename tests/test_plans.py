"""Physical-plan regression guards: the properties that matter at 100 TB.

These assert on .explain output so a refactor can't silently lose predicate
pushdown, column pruning, broadcast joins, or top-k plans.
"""

from __future__ import annotations

import json
import os
import re

import pytest

import __spark_entry__ as em

_QUERIES = em.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = _QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_projection")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "event_type", "value"}


def test_time_range_pushes_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_time_range_full_scan")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(ts", plan), plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_recent_top20")
    assert "TakeOrderedAndProject" in plan


def test_revenue_join_pushes_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_revenue_topk")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_shipdate", plan), plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(c_mktsegment,BUILDING", plan), plan
    assert "TakeOrderedAndProject" in plan


def test_disjunctive_predicates_push_to_both_scans(spark, sf_dir):
    """Q19 shape: the OR-of-conjunctions must decompose — part predicates
    to the part scan, quantity bounds to the lineitem scan."""
    plan = _plan(spark, sf_dir, "q_disjunctive_revenue")
    assert re.search(r"PushedFilters: \[[^\]]*Or\(And\(EqualTo\(p_brand", plan), plan
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan), plan
    assert "BroadcastHashJoin" in plan


def test_exists_agg_uses_semi_broadcast(spark, sf_dir):
    """Q4 shape: the EXISTS must plan as a semi join with the orders date
    range pushed to its scan (no inner-join row blowup before the agg)."""
    plan = _plan(spark, sf_dir, "q_late_ship_priority")
    assert "LeftSemi" in plan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(o_orderdate", plan), plan


def test_grouped_sample_single_shuffle(spark, sf_dir):
    """Per-stratum sampling is one window over one exchange — a second
    exchange would mean the hash-order computation isn't colocated."""
    plan = _plan(spark, sf_dir, "q_grouped_sample")
    # one exchange for the window partitionBy(lang); the final orderBy adds
    # a range-partition exchange — anything beyond that is a regression
    # (count tree nodes "(n) Exchange", not the detail section echoes)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
    # rank<=k is pushed below the exchange as a partial per-partition top-k
    assert "WindowGroupLimit" in plan


def test_aqe_splits_skewed_join(spark):
    """With a 99%-one-key build side and broadcast disabled, AQE must mark
    the skewed partition for runtime splitting (skew=true in the final
    adaptive plan) — the mechanism that absorbs hot keys at 100 TB."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        big = (
            spark.range(300_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 == 0, F.col("id")).otherwise(F.lit(0)),
            )
            .withColumn("pad", F.lit("x" * 64))
        )
        small = spark.range(5000).select(
            F.col("id").alias("k2"), F.lit("y").alias("tag")
        )
        j = big.join(small, big["k"] == small["k2"])
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_approx_distinct_within_rsd(spark, sf_dir):
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.schema import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in _QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, approx[k], n)


def test_fan_out_noop_on_wide_scans(spark, sf_dir):
    """fan_out must add an exchange ONLY for narrow scans: a frame already
    at/above core parallelism passes through with an identical plan (the
    100 TB case — wide scans must not pick up a gratuitous shuffle)."""
    from api_log_iceberg_test_spark.schema import fan_out, load_table

    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism

    narrow = fan_out(docs)
    assert narrow.rdd.getNumPartitions() >= min(
        target, 2
    )  # single-file scan got widened

    wide = docs.repartition(target + 4)
    same = fan_out(wide)
    assert same is wide  # no-op: not even a new plan node


def test_neardup_avoids_nested_loop_join(spark, sf_dir):
    # round 3: the exact near-dup entry joins on projection buckets — a
    # cartesian/BroadcastNestedLoopJoin reappearing means the lossless
    # pruning regressed to the all-pairs product
    plan = _plan(spark, sf_dir, "q_embedding_neardup")
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # still a join, now equi on _bucket


def test_span_dedup_no_python_and_shared_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_dedup_spans")
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_lm_quality_total_is_broadcast(spark, sf_dir):
    # the 1-row grand total must attach via broadcast, never a shuffle join
    plan = _plan(spark, sf_dir, "q_lm_quality")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_zorder_stats_single_agg_no_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_zorder_stats")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_forecast_revenue_pushes_all_predicates(spark, sf_dir):
    # TPC-H Q6's whole point: every predicate reaches the parquet scan
    plan = _plan(spark, sf_dir, "q_forecast_revenue")
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    assert "Join" not in plan


def test_equiheight_histogram_avoids_global_window(spark, sf_dir):
    # equi-height deciles must come from a combinable percentile agg +
    # broadcast, never an NTILE over a single-partition global sort
    plan = _plan(spark, sf_dir, "q_equiheight_histogram")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_minhash_corpus_scanned_once(spark, sf_dir):
    # The sig-MIN, banding, and both verification branches must all hang off
    # ONE scan+shingle+shuffle subtree. Reuse is only visible in the FINAL
    # adaptive plan (AQE matches canonicalized stages at runtime), so
    # execute first. A round-4 audit found a pre-reduced pmod column made
    # the signature branch prune differently and doubled the corpus scan.
    df = _QUERIES["q_dedup_minhash_lsh"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    real_scans = [l for l in final.splitlines() if "FileScan parquet" in l]
    assert len(real_scans) == 1, f"corpus scanned {len(real_scans)}x:\n{final}"
    assert "ReusedExchange" in final


# --- round-4 operator plan guards -------------------------------------------


def test_negative_sampling_broadcasts_reps(spark, sf_dir):
    """The 64-row bucket-representative table must broadcast; a sort-merge
    join here would shuffle the whole anchor stream for nothing."""
    plan = _plan(spark, sf_dir, "q_negative_sampling")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_winsorized_bounds_broadcast(spark, sf_dir):
    """Percentile bounds (|groups| rows) broadcast back onto the fact
    table — the fact side must never shuffle for the clamp join."""
    plan = _plan(spark, sf_dir, "q_winsorized_stats")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ohlc_single_exchange(spark, sf_dir):
    """Both window passes and the final agg share ONE (event_type, day)
    exchange — a second Exchange means a window lost the partitioning."""
    plan = _plan(spark, sf_dir, "q_ohlc_bars")
    # one data exchange (hashpartitioning) + the final orderBy range exchange
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_rolling_zscore_no_global_window(spark, sf_dir):
    """The anomaly window partitions by event_type — a SinglePartition
    window would serialize the whole fact table through one task."""
    plan = _plan(spark, sf_dir, "q_rolling_zscore")
    assert "Window" in plan
    assert "hashpartitioning(event_type" in plan, plan
    assert "SinglePartition" not in plan


def test_cumulative_distinct_global_window_is_post_agg(spark, sf_dir):
    """The running sum's unpartitioned window is allowed ONLY because it
    runs over the |days|-row aggregate — the plan must place the window
    ABOVE both aggregations, never on raw events."""
    plan = _plan(spark, sf_dir, "q_cumulative_distinct")
    # the Window node's child chain must contain the two HashAggregates
    widx = plan.find("Window")
    assert widx != -1
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial/final


def test_resample_spine_joins_broadcast(spark, sf_dir):
    """Spine grid ⋈ hourly counts must broadcast the bounded side; the
    fact table appears only under the count aggregate."""
    plan = _plan(spark, sf_dir, "q_resample_hourly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_match_blocks_before_levenshtein(spark, sf_dir):
    """The levenshtein must sit above an equi-join on the block key —
    never a BroadcastNestedLoopJoin over all name pairs."""
    plan = _plan(spark, sf_dir, "q_fuzzy_match_names")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_psi_drift_single_events_scan(spark, sf_dir):
    """The full type×bucket grid derives from the tiny checkpointed agg,
    not a second events scan; the joins above it broadcast."""
    plan = _plan(spark, sf_dir, "q_psi_drift")
    assert plan.count("Scan parquet") <= 1, plan
    assert "BroadcastHashJoin" in plan


def test_event_transitions_single_user_shuffle(spark, sf_dir):
    """One hash-partitioning exchange on user_id feeds the lag window;
    the per-prev totals join back broadcast, not via a second big
    shuffle of the transition pairs."""
    plan = _plan(spark, sf_dir, "q_event_transitions")
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) >= 1
    assert "BroadcastHashJoin" in plan


def test_term_pmi_vocab_broadcast_no_bnlj_pairs(spark, sf_dir):
    """The vocab join broadcasts and the within-doc pair join is an
    equi-join on doc_id — the only nested-loop node is the 1-row
    corpus-count crossJoin."""
    plan = _plan(spark, sf_dir, "q_term_pmi")
    assert "BroadcastHashJoin" in plan
    # pair generation must be an equi-join keyed on doc_id, not cartesian
    assert re.search(r"keys(?: \[\d+\])?: \[doc_id", plan), plan
    # the only tolerated nested-loop node is the 1-row corpus-count cross
    # (formatted explain prints each node twice: tree sketch + details)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan


def test_attribution_single_window_pass(spark, sf_dir):
    """Both touch models come from ONE window pass over one user_id
    shuffle — the unpivot means no second scan / window / agg-join
    branch (the naive two-groupBy full-join shape doubles both)."""
    plan = _plan(spark, sf_dir, "q_attribution")
    # Spark may split first/last into two WindowExec nodes, but they must
    # share one sort over ONE user_id exchange and one events scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 0, plan


def test_assoc_rules_basket_scanned_once(spark, sf_dir):
    """The distinct basket is checkpoint-shared by the pair join, the
    singleton counts, and the user count — one events scan feeds all
    branches, and the stat joins broadcast."""
    plan = _plan(spark, sf_dir, "q_assoc_rules")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1, plan
    assert "BroadcastHashJoin" in plan


def test_interarrival_single_window_shuffle(spark, sf_dir):
    """Gaps come from one lag window over one (user, type) shuffle; the
    final stats are a combinable sum/sumsq agg, no second window."""
    plan = _plan(spark, sf_dir, "q_interarrival_stats")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_bm25_topk_plan(spark, sf_dir):
    """BM25: per-term df and corpus stats broadcast (no SMJ), ranking is a
    true top-k, and the query-term IN-filter sits on the exploded stream
    below the (doc, term) aggregate."""
    plan = _plan(spark, sf_dir, "q_bm25_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "IN (spark" in plan, plan  # query-term filter on the token stream


def test_skyline_no_cartesian_no_smj(spark, sf_dir):
    """Skyline must be the sweep plan: no O(n²) join anywhere — no
    BroadcastNestedLoopJoin, no SortMergeJoin; offsets join broadcasts."""
    plan = _plan(spark, sf_dir, "q_skyline_frontier")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_interpolate_windows_stay_off_fact_table(spark, sf_dir):
    """Both neighbor windows partition by event_type over the GRID; the
    events table feeds only aggregates (no Window directly over the scan)."""
    plan = _plan(spark, sf_dir, "q_interpolate_gaps")
    assert "hashpartitioning(event_type" in plan, plan
    assert "SinglePartition" not in plan.split("Window")[0], plan


def test_compaction_plan_windows_partition_by_day(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_compaction_plan")
    assert "hashpartitioning(day" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_table_profile_no_expand_explosion(spark, sf_dir):
    """r15 exact shape: one single-distinct aggregate per column, unioned —
    NO Expand anywhere (the multi-column-exact single-pass plan's
    |cols|+1 row multiplier measured 35 s of executor time at sf0.1 vs
    ~3 s for the union), and each branch scans ONLY its own column (one
    column-pruned scan per column, so the union reads the same bytes as
    the old single wide scan)."""
    plan = _plan(spark, sf_dir, "q_table_profile")
    assert "Expand" not in plan, plan
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) <= 5, plan
    # every scan must be pruned to a single column. ADVICE r15: assert the
    # regex actually matched — a format drift that matches nothing would
    # otherwise pass vacuously.
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) >= 5, plan
    for s in schemas:
        assert s.count(",") == 0, s


def test_ivm_deltas_broadcast_bases_probe(spark, sf_dir):
    """All three delta-rule joins must broadcast the delta side — a
    SortMergeJoin would mean a base table is being shuffled to refresh a
    view, defeating the point of IVM."""
    plan = _plan(spark, sf_dir, "q_ivm_join_delta")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


# Queries whose plans legitimately contain an unpartitioned Window node.
# Every entry is bounded by construction, never corpus-sized (SCALE.md §3):
# - partition-offset family: the window runs over |partitions| rows
#   (q_dense_ids, q_skyline_frontier, q_auc_eval);
# - post-aggregation frames: |sources| / |strata| / |digits| / |days| rows
#   (q_source_mix_weights, q_weighted_sample, q_temperature_mix,
#   q_neyman_allocation, q_benford_audit, q_cumulative_distinct);
# - predicate-bounded demo input: q_sql_ignore_nulls windows over the
#   pushdown-filtered event_id < 2000 slice (IGNORE NULLS syntax surface).
_GLOBAL_WINDOW_ALLOWLIST = {
    "q_auc_eval",
    # surfaced by the r06 regex fix (Window nodes in join branches were
    # previously invisible): ranks bm25_topk's ≤50-row lexical result —
    # bounded by the upstream top-k LIMIT regardless of corpus scale
    # (registry.py q_hybrid_rrf docstring)
    "q_hybrid_rrf",
    # r07: RBO ranks two 20-row frames that each sit ABOVE a
    # TakeOrderedAndProject limit — the window input is bounded by
    # construction (same contract as q_hybrid_rrf)
    "q_rank_biased_overlap",
    "q_benford_audit",
    "q_cumulative_distinct",
    "q_dense_ids",
    "q_neyman_allocation",
    "q_skyline_frontier",
    "q_source_mix_weights",
    "q_sql_ignore_nulls",
    "q_temperature_mix",
    "q_weighted_sample",
    # r12: partition-offset family (layout.exclusive_prefix_max) — the
    # unpartitioned window runs over the |partitions|-row per-partition
    # maxima, never the events table
    "q_watermark_accounting",
}


@pytest.fixture(scope="module")
def registry_builds(spark, sf_dir):
    """One build per registered query — 'extended' explain (optimized
    logical + physical sections) plus the analyzed output schema — shared
    by every registry-wide guard below so the registry-wide pass is paid
    once per suite run, not once per test.

    The session cache is cleared before EACH query's build+explain:
    operators that cache internal frames print a collapsed
    InMemoryTableScan subtree when an equivalent plan is already
    registered and the full duplicated subtree when not — so without
    isolation, fingerprints depend on which tests (or which other
    registry entries, i.e. rotation order) ran first. Found r07: the
    full suite flipped q_auc_eval/q_dense_ids/q_skyline_frontier counts
    vs the standalone run. (r13: the partition-offset family — the
    original offender — no longer caches at all; the isolation stays as
    a cheap guard for graph/localCheckpoint frames and future ops.)"""
    import __spark_entry__ as entrymod

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "extended"
    )
    plans, schemas = {}, {}
    for name, fn in entrymod.queries().items():
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plans[name] = df._jdf.queryExecution().explainString(mode)
        schemas[name] = df.schema
    spark.catalog.clearCache()
    return plans, schemas


@pytest.fixture(scope="module")
def registry_plans(registry_builds):
    return registry_builds[0]


def test_all_query_outputs_are_scalar(registry_builds):
    """The driver's value-hash canonicalizer sorts and hashes raw pandas
    cells; an array/map/struct output column crashes it with unhashable
    list cells (this exact failure produced r04's two red driver rows —
    COVERAGE.md round-4 notes). Guard the whole registry: every
    queries() entry must emit scalar columns only; serialize collections
    with array_join/concat_ws in BOTH engines before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {
        name: [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        for name, schema in registry_builds[1].items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"non-scalar output columns: {offenders}"


def test_no_unallowlisted_fp_sums_registry_wide(spark, sf_dir):
    """SCALE.md §11 enforced statically (r08, widened r09 per ADVICE):
    a SUM over DoubleType in a hash-gated query is summation-
    association-dependent — its low bits vary with partial-merge order
    across layouts and engines, and a ROUND near a half boundary then
    flips the driver hash (the exact failure class of q_running_total
    at sf1.0 and ADVICE r07's q_seasonality_strength / q_bootstrap_ci
    findings). AVG and the central-moment family (stddev/var/covar/
    corr) run the identical double partial-merge reduction, so the
    audit matches those too (superclass-chain match in
    tools/audit_fp_sums._FP_AGG_BASES). Every registered query's
    analyzed plan is walked; each hit must either be grid-accumulated
    (DECIMAL units) or carry an explicit justification in
    tools/audit_fp_sums.ALLOW (exact-in-double summands, reference-SQL
    semantics, ANSI moment-aggregate contract, or a bounded frame — all
    measured stable). A new operator with an unjustified fp aggregate
    fails here. The INT-EXACT side channel (ADVICE r09 #2: Average/
    moment aggregates over INTEGRAL children still carry a DoubleType
    partial sum) is collected too and pinned to the known-accepted set
    — a new integral avg/moment shows up here deliberately instead of
    silently, and the author must confirm its group sums stay below
    the 2^53 exactness bound (tools/audit_fp_sums._INTEGRAL_TYPES doc
    block) before extending the set."""
    from tools.audit_fp_sums import audit

    int_exact: dict = {}
    findings = audit(spark, sf_dir, int_exact=int_exact)
    assert not findings, (
        "hash-gated queries with un-allowlisted raw double sums "
        f"(grid them per SCALE.md §11 or justify in ALLOW): {findings}"
    )
    # audited INT-EXACT members: q_chunk_embed_pool mean-pools int8
    # quantized bucket values (|b| <= 127) over <= corpus-chunk-count
    # rows — group sums orders of magnitude below 2^53
    known_int_exact = {"q_chunk_embed_pool"}
    assert set(int_exact) <= known_int_exact, (
        "new integral avg/moment aggregate (DoubleType partial sum — "
        "verify its group sums stay < 2^53 and extend known_int_exact "
        f"with a comment): { {k: v for k, v in int_exact.items() if k not in known_int_exact} }"
    )


def test_no_new_unpartitioned_windows_registry_wide(registry_plans):
    """Exhaustive global-window ban (SCALE.md §3): scan EVERY registered
    query's optimized plan for Window nodes with an empty partition spec.
    Any query outside the audited allowlist fails — a new operator cannot
    silently move a corpus through one partition. (If a new entry's global
    window IS bounded, audit it and extend the allowlist with a comment.)"""
    offenders = {}
    for name, plan in registry_plans.items():
        for line in plan.splitlines():
            # strip ALL tree-drawing prefixes — the old `^\s*\+?-?\s*` regex
            # missed the `:` branch connector, so Window nodes inside a
            # join's left branch escaped the scan (ADVICE r05, verified
            # live on q_top_supplier_revenue)
            node = re.sub(r"^[\s:+|*-]*", "", line)
            m = re.match(r"Window (\[.+)$", node)
            if not m:
                continue
            groups = re.findall(r"\[[^\]]*\]", m.group(1))
            # A Window node prints [funcs] then its specs: a PARTITION
            # group (plain columns) and/or an ORDER group (entries carry
            # ASC/DESC). Counting groups alone misclassifies a
            # partitioned-but-unordered window (2 groups: funcs +
            # partition) as global — found r07 by q_seasonality_strength,
            # whose (type,dow,hour)-partitioned frame-less window is
            # exactly the scale-safe shape this ban exists to encourage.
            # Global ⇔ no spec group consists of plain (non-ASC/DESC)
            # columns.
            has_partition = any(
                g.strip("[]").strip() and " ASC" not in g and " DESC" not in g
                for g in groups[1:]
            )
            if not has_partition:
                offenders[name] = offenders.get(name, 0) + 1
    unexpected = set(offenders) - _GLOBAL_WINDOW_ALLOWLIST
    assert not unexpected, f"unaudited unpartitioned windows: {unexpected}"
    gone = _GLOBAL_WINDOW_ALLOWLIST - set(offenders)
    assert not gone, f"allowlist entries no longer global-window: {gone}"


# Queries whose plans legitimately contain a BroadcastNestedLoopJoin —
# every one is a crossJoin/non-equi join whose BROADCAST side is bounded
# by contract: a 1-row global-stats frame (totals, grand counts, spline
# anchors), a tiny value grid, or a top-k list. Round-5 exhaustive audit.
_BNLJ_ALLOWLIST = {
    "q_ann_cosine_topk",
    "q_ann_cosine_topk_ivf",
    "q_assoc_rules",
    "q_auc_eval",
    "q_bm25_topk",
    "q_chisq_lang_source",
    "q_equiheight_histogram",
    # r08: the 7x24 heatmap spine is a crossJoin of two tiny ranges
    # (168 rows total, both sides bounded constants) — the empty-cell
    # reporting fix; the observed agg then broadcast-joins onto it
    "q_hourofweek_profile",
    "q_hybrid_rrf",
    "q_interpolate_gaps",
    "q_lm_quality",
    # r15: tf-idf attaches its 1-row corpus count N via broadcast crossJoin
    # (replaced the driver-side df.count() job) — bounded by contract
    "q_tfidf_top_terms",
    # r06: the sweep report joins its 4 config rows against the 1-row
    # truth-count aggregate (broadcast crossJoin) — bounded by contract
    "q_lsh_param_sweep",
    # r06: Q11 attaches its 1-row bloc total via broadcast crossJoin
    # (Q9 lost its BNLJ when partsupp switched to the observed-pair
    # derivation — no supplier-count attach remains)
    "q_important_stock",
    # r07: WOE/IV attaches its 1-row class totals + 1-row IV sum via
    # broadcast crossJoins — bounded by contract
    "q_woe_iv",
    # r07: novelty curve attaches the 1-row MAX(doc_id) via broadcast —
    # the attach now sits below the lazy checkpoint so the top plan no
    # longer prints it; kept allowlisted for the un-checkpointed lineage
    "q_ngram_novelty",
    # r07: hard-negative mining broadcasts the 10-anchor frame into a
    # non-equi (label<>label) join — the audited ANN family shape
    "q_hard_negatives",
    # r07: ECE attaches the 1-row anchor + 1-row N total + 1-row ECE sum
    # via broadcast crossJoins — all bounded by contract
    "q_ece_calibration",
    # r07: RBO joins the 20-row depth spine against the ≤20-row prefix
    # frame on a non-equi (m <= d) condition — 400 pairs max
    "q_rank_biased_overlap",
    # r07: source balance attaches its 1-row corpus total + 1-row
    # concentration stats via broadcast crossJoins — bounded by contract
    "q_source_balance",
    # r07: MI attaches the 1-row N and 1-row MI totals via broadcast
    # crossJoins over the |X|·|Y|-cell frame — bounded by contract
    "q_mi_feature_label",
    "q_psi_drift",
    "q_resample_hourly",
    "q_rich_quiet_customers",
    "q_source_similarity",
    "q_target_encoding",
    "q_term_pmi",
}

# Queries that cross the Python boundary — all Arrow-batched by design
# (ArrowEvalPython / MapInPandas / cogrouped+grouped applyInPandas /
# ArrowEvalPythonUDTF). SCALE.md §5: pickled row-at-a-time transfer
# (BatchEvalPython) is banned outright; there is no allowlist for it.
_ARROW_PYTHON_ALLOWLIST = {
    "q_ann_cosine_topk_np",
    "q_ann_pq_topk",
    "q_chunk_embed_pool",
    "q_embed_documents",
    "q_embedding_neardup_lsh",
    "q_ks_drift",
    "q_multimodal_features",
    "q_rolling_median",
    "q_udf_sigmoid",
    "q_udtf_token_stats",
}


#: Window frames Spark cannot evaluate incrementally, audited per entry.
#: Sliding frames (both bounds finite, bounds differ) re-aggregate the
#: whole in-frame buffer on every frame move (no inverse-combine), so
#: their cost is O(n × frame_rows): fine when the frame is a small
#: CONSTANT number of ROWS, density-quadratic when it is a RANGE of a
#: dense column. UNBOUNDED FOLLOWING lower-bounded frames re-aggregate
#: current→partition-end per row: O(n²), never acceptable (a DESC-sort
#: prefix frame is always available instead — see q_interpolate_gaps).
_SLIDING_FRAME_ALLOWLIST = {
    # ROWS frames of constant width k: cost O(k·n), k documented here.
    "q_lag_features": "ROWS 7-row trailing stats — constant k=7",
    "q_moving_avg": "ROWS 4-row moving average — constant k=4",
    # RANGE value-frame: SQL-surface breadth demo (RANGE BETWEEN value
    # PRECEDING); frame size is value-density-dependent BY CONTRACT and
    # the demo's partition is a 5-row-per-group dimension slice.
    "q_sql_range_frame": "RANGE value frame — SQL breadth demo, bounded partitions",
}


def test_no_density_quadratic_window_frames_registry_wide(registry_plans):
    """r11 frame-discipline ban, registry-wide: every window frame in
    every registered query's optimized plan must be one Spark evaluates
    incrementally — UNBOUNDED-PRECEDING lower bound (add-only), equal-
    bounds RowFrame (lag/lead offset), or whole-partition — unless the
    entry is in the audited sliding-frame allowlist above. UNBOUNDED
    FOLLOWING lower-bounded frames (O(n²) per partition) are banned
    outright with no allowlist: the DESC-sort prefix rewrite is always
    available and bit-identical (q_interpolate_gaps, r11)."""
    frame_re = re.compile(
        r"specifiedwindowframe\((RowFrame|RangeFrame), ([^,]+), ([^)]+)\)"
    )
    sliding, unbounded_following = {}, {}
    for name, plan in registry_plans.items():
        for ft, lo, hi in frame_re.findall(plan):
            lo, hi = lo.strip(), hi.strip()
            if lo.startswith("unboundedpreceding"):
                continue  # add-only incremental
            if ft == "RowFrame" and lo == hi:
                continue  # lag/lead offset frame
            if hi.startswith("unboundedfollowing"):
                unbounded_following.setdefault(name, []).append((ft, lo, hi))
            else:
                sliding.setdefault(name, []).append((ft, lo, hi))
    assert not unbounded_following, (
        "UNBOUNDED FOLLOWING frames re-aggregate current->end per row "
        "(O(n^2) per partition); rewrite as a prefix frame over the DESC "
        f"sort: {unbounded_following}"
    )
    unlisted = {n: f for n, f in sliding.items() if n not in _SLIDING_FRAME_ALLOWLIST}
    assert not unlisted, (
        "sliding window frames re-aggregate the in-frame buffer per row "
        "(O(n x frame_rows)); use prefix-rank differences or, if the "
        "frame is a small constant, audit and extend "
        f"_SLIDING_FRAME_ALLOWLIST: {unlisted}"
    )
    gone = set(_SLIDING_FRAME_ALLOWLIST) - set(sliding)
    assert not gone, f"allowlist entries no longer sliding — prune: {gone}"


def test_join_and_python_boundary_shapes_registry_wide(registry_plans):
    """One pass over every registered query's plan enforcing three bans
    (SCALE.md §2/§5): no CartesianProduct anywhere, no row-at-a-time
    Python transfer (BatchEvalPython*) anywhere, and no
    BroadcastNestedLoopJoin outside the audited bounded-side allowlist.
    The Arrow-Python set is pinned exactly so a new Python hot path (or a
    built-in path silently degrading to Python) shows up here."""
    cartesian, batch_py, bnlj, arrow_py = [], [], set(), set()
    for name, plan in registry_plans.items():
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            batch_py.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj.add(name)
        if any(
            node in plan
            for node in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "FlatMapCoGroupsInPandas",
            )
        ):
            arrow_py.add(name)
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not batch_py, f"row-at-a-time Python transfer in: {batch_py}"
    assert bnlj <= _BNLJ_ALLOWLIST, f"unaudited BNLJ: {bnlj - _BNLJ_ALLOWLIST}"
    assert arrow_py == _ARROW_PYTHON_ALLOWLIST, (
        f"Python-boundary drift: +{arrow_py - _ARROW_PYTHON_ALLOWLIST} "
        f"-{_ARROW_PYTHON_ALLOWLIST - arrow_py}"
    )


def test_arrow_python_queries_survive_count_only_consumers(spark, sf_dir):
    """The KS crash class as permanent CI (VERDICT r08 #5): under a bare
    count() — or a partial projection — Catalyst prunes an Arrow UDF's
    INPUT columns to whatever the consumer observes, and a UDF that
    assumes its full input schema crashes the worker (q_ks_drift died
    with KeyError in r08; found then by a one-off audit, enforced here
    since). Every pinned Arrow-Python query must produce the same
    cardinality under count(), a first-column-only projection count,
    and a full collect()."""
    from __spark_entry__ import queries

    qs = queries()
    bad = {}
    for name in sorted(_ARROW_PYTHON_ALLOWLIST):
        df = qs[name](spark, sf_dir)
        full = len(df.collect())
        counted = df.count()
        projected = df.select(df.columns[0]).count()
        if not (counted == projected == full):
            bad[name] = (counted, projected, full)
    assert not bad, f"count/projection/collect cardinality drift: {bad}"


# --- plan-fingerprint regression harness (VERDICT r06 #3) -------------------
#
# The targeted guards above catch KNOWN anti-patterns; they cannot catch
# silent plan drift — a broadcast flipping to sort-merge, a pushed filter
# un-pushing, an extra exchange appearing after an innocent refactor. This
# harness freezes a structural fingerprint of EVERY registered query's
# physical plan (node-type counts + the pushed-filter set) into a committed
# snapshot; any diff fails the suite.
#
# Intentional-diff workflow: when a plan change is DELIBERATE (new operator,
# reviewed optimization), regenerate with
#
#   SPARK_GRAFT_UPDATE_FINGERPRINTS=1 python -m pytest \
#       tests/test_plans.py::test_plan_fingerprints_frozen -q
#
# then review `git diff tests/plan_fingerprints.json` — the diff IS the
# review artifact (exactly which queries changed shape, and how) — and
# commit it together with the code change.

_FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")

#: Physical node types whose count defines a plan's shape. \b-bounded so
#: e.g. `Exchange` (shuffle) does not also count `BroadcastExchange`.
_FP_NODES = (
    "FileScan",
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
)


def _fingerprint(plan: str) -> dict:
    """Structural fingerprint of one query's physical plan: non-zero node
    counts + the sorted set of PushedFilters strings (literal-determined,
    no expression IDs — stable across runs at a fixed SF)."""
    phys = plan.split("== Physical Plan ==")[-1]
    counts = {
        node: len(re.findall(rf"\b{node}\b", phys)) for node in _FP_NODES
    }
    # single-line capture, clipped at `]` OR end-of-line: Spark truncates
    # long filter lists mid-entry (maxMetadataStringLength) with no closing
    # bracket on the line, and a greedy cross-line capture would absorb
    # neighboring plan text containing expression IDs (#NNN) — those shift
    # whenever the registry's construction order rotates, which would fail
    # this suite at every driver round boundary
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", phys)
    return {
        "nodes": {k: v for k, v in sorted(counts.items()) if v},
        "pushed": sorted(set(pushed)),
    }


def test_plan_fingerprints_frozen(registry_plans, sf_dir):
    """Every registered query's plan fingerprint must match the committed
    snapshot — silent plan drift anywhere in the registry fails here.
    Snapshot is taken at the default sf0.001 testdata (statistics-driven
    choices like broadcast thresholds are SF-dependent), so the test
    skips under an SF override."""
    if sf_dir != "/root/testdata/sf0.001":
        pytest.skip("fingerprint snapshot is pinned to the sf0.001 testdata")
    got = {name: _fingerprint(plan) for name, plan in registry_plans.items()}
    if os.environ.get("SPARK_GRAFT_UPDATE_FINGERPRINTS"):
        with open(_FP_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        pytest.skip(f"regenerated {_FP_PATH} — review the git diff")
    assert os.path.exists(_FP_PATH), (
        "no committed fingerprint snapshot; regenerate with "
        "SPARK_GRAFT_UPDATE_FINGERPRINTS=1"
    )
    with open(_FP_PATH) as f:
        want = json.load(f)
    drifted = {
        n: {"want": want.get(n), "got": got.get(n)}
        for n in set(want) | set(got)
        if want.get(n) != got.get(n)
    }
    assert not drifted, (
        f"plan fingerprints drifted for {sorted(drifted)}:\n"
        + json.dumps(drifted, indent=1, sort_keys=True)[:4000]
        + "\nIf deliberate, regenerate the snapshot (see module comment) "
        "and commit the reviewed diff."
    )


# --- round-6 operator plan guards -------------------------------------------


def test_pack_batches_bucket_window_and_pruned_scan(spark, sf_dir):
    """The running-offset window must partition on bucket (no global sort
    path exists), the scan must prune to (doc_id, text), and the batch agg
    must keep map-side partial aggregation (two HashAggregates)."""
    plan = _plan(spark, sf_dir, "q_pack_batches")
    assert "hashpartitioning(bucket" in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2, plan


def test_nearby_counts_no_sliding_window_frames(spark, sf_dir):
    """r11 frame discipline: q_range_join_nearby_counts must never use a
    sliding window frame. Spark's SlidingWindowFunctionFrame has no
    inverse-combine, so a ±w RANGE frame re-evaluates the whole in-frame
    buffer per row — O(n × window density), the quadratic term the
    pair-free re-plan exists to remove (measured: ~3s of a 4.4s sf1.0dx
    run sat in three sliding frames; the monotonic form runs ~1.7s).
    Allowed frames: RangeFrame with an UNBOUNDED PRECEDING lower bound
    (incremental add-only) and RowFrame with equal bounds (lag/lead
    offset frames, O(1) per row)."""
    plan = _plan(spark, sf_dir, "q_range_join_nearby_counts")
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    for lo, hi in re.findall(r"specifiedwindowframe\(RangeFrame, ([^,]+), ([^)]+)\)", plan):
        assert lo.startswith("unboundedpreceding"), (lo, hi, plan[:2000])
    for lo, hi in re.findall(r"specifiedwindowframe\(RowFrame, ([^,]+), ([^)]+)\)", plan):
        assert lo == hi, (lo, hi, plan[:2000])


def test_lsh_param_sweep_bounded_corpus_scans(spark, sf_dir):
    """The sweep materializes the 32-perm signature pass and the truth tier
    ONCE each (lazy checkpoints): across the whole execution the corpus
    parquet may be scanned at most twice — 4 configs × 2 self-join sides
    re-slicing signatures must NOT re-derive them (an early version
    scanned the corpus 18x through config-branch duplication)."""
    df = _QUERIES["q_lsh_param_sweep"](spark, sf_dir)
    df.collect()
    # FileScan counts across ALL query executions aren't directly exposed;
    # assert instead on the checkpoint structure: the top plan must read
    # ONLY checkpointed RDDs (no parquet re-scan above the two
    # materialization points, each of which scans the corpus once).
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert "FileScan parquet" not in final, final
    assert final.count("Scan ExistingRDD") >= 2, final


def test_lsh_param_sweep_sample_filter_below_shingle_explode(
    spark, sf_dir, monkeypatch
):
    """VERDICT r06 #2: the sweep's bounded-sample contract must be CODE —
    the deterministic hash-sample filter (multiplicative constant
    2654435761) has to sit scan-adjacent, BELOW the shingle explode, in
    EVERY tier (signatures, banding, truth), so the O(blocking-join)
    truth tier only ever sees the sample. The lazy checkpoints hide the
    scan subtree from the final plan, so this guard disables them (the
    filter placement is identical either way — checkpointing only changes
    where materialization happens, not the lineage below it)."""
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    from api_log_iceberg_test_spark.operators import dedup
    from api_log_iceberg_test_spark.schema import load_table

    monkeypatch.setattr(
        _ClassicDF, "localCheckpoint", lambda self, eager=True: self
    )
    docs = load_table(spark, sf_dir, "documents")
    df = dedup.lsh_param_sweep(docs, threshold=0.5)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "extended"
    )
    opt = (
        df._jdf.queryExecution()
        .explainString(mode)
        .split("== Optimized Logical Plan ==")[1]
        .split("== Physical Plan ==")[0]
    )
    lines = opt.splitlines()
    rels = [i for i, ln in enumerate(lines) if re.search(r"Relation .*parquet", ln)]
    assert rels, opt
    for i in rels:
        # the node directly above every corpus scan must be the sample
        # filter — nothing (explode, join, agg) gets unsampled rows
        assert "Filter" in lines[i - 1] and "2654435761" in lines[i - 1], (
            f"scan at line {i} not sample-filtered: {lines[i - 1]}"
        )
    # and the Filter-node count matches the scan count: no tier escapes,
    # and no tier re-filters already-sampled rows. Catalyst's constraint
    # propagation may additionally copy the predicate into Join CONDITIONS
    # (seen above the exhaustive truth tier's least/greatest candidate
    # join) — redundant but sound; only non-Filter non-Join occurrences
    # would indicate a real contract drift.
    occurrences = [ln for ln in lines if "2654435761" in ln]
    filters = [ln for ln in occurrences if "Filter" in ln]
    others = [ln for ln in occurrences if "Filter" not in ln]
    assert len(filters) == len(rels), opt
    assert all("Join" in ln for ln in others), others


def test_ngram_novelty_single_shingle_materialization(spark, sf_dir):
    """The novelty curve's two consumers (per-slice presence, first-seen
    MIN) must share ONE materialized (slice, trigram) distinct — without
    the lazy checkpoint each branch re-scans the corpus and re-runs the
    shingle explode (r07 plan audit found 4 FileScans; the corpus pass
    is the dominant cost at scale)."""
    df = _QUERIES["q_ngram_novelty"](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert "FileScan parquet" not in final, final
    assert final.count("Scan ExistingRDD") >= 2, final


def test_product_profit_pushes_name_filter_no_cartesian(spark, sf_dir):
    """Q9 over the derived partsupp: the part name filter must reach the
    part scan (StringContains pushdown) and every join is an equi join —
    the observed-pair derivation needs no nested-loop attach at all."""
    plan = _plan(spark, sf_dir, "q_product_profit")
    assert re.search(r"PushedFilters: \[[^\]]*StringContains\(p_name,red", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
