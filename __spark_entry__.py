"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registry lives in ``api_log_iceberg_test_spark.queries`` (reference
SQL surface + analytic extensions) and ``.operators`` (LLM-data-pipeline
extension ops). Each module exports ``QUERIES`` and ``ORACLE`` dicts that
are merged here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from api_log_iceberg_test_spark.queries import analytics, api_logs, sql_surface

try:  # extension operators land incrementally; keep the contract importable
    from api_log_iceberg_test_spark.operators import registry as _ops_registry

    _OPS_QUERIES = _ops_registry.QUERIES
    _OPS_ORACLE = _ops_registry.ORACLE
    _OPS_TAIL = getattr(_ops_registry, "QUERIES_TAIL", {})
    _OPS_LATE = getattr(_ops_registry, "QUERIES_LATE", {})
except ImportError:  # pragma: no cover
    _OPS_QUERIES, _OPS_ORACLE, _OPS_TAIL, _OPS_LATE = {}, {}, {}, {}

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's error-analysis query shape (A3, README.md:163-167):
    filtered multi-key frequency with descending count. Threshold 100 (not
    the registered query's 400) so the result is non-empty at sf0.001.
    """
    from api_log_iceberg_test_spark.queries.api_logs import error_analysis
    from api_log_iceberg_test_spark.schema import load_table

    return error_analysis(
        load_table(spark, SF0001, "events"), "value", ["event_type", "user_id"], threshold=100
    )


# The driver verifies only the FIRST 50 queries() entries per round (merge =
# dict insertion order), so the order below is a ROTATING verification window.
# Round-5 policy (VERDICT r04 #1/#2): keep the 9 pinned sentinels (reference
# §2 surface + the round-1-red analytics trio); every one of the remaining 41
# slots holds an entry that has never earned a driver CORRECTNESS row — the
# two canonicalizer-fixed q_sql_* entries (r04 red → stringified array/map
# outputs) plus 39 of the 58 never-verified round-4 operators, highest
# algorithmic complexity first. Registry growth is frozen this round so the
# remaining 19 (the simplest analytics tail) drain in round 6. Entries green
# in r04 rotate OUT; their evidence stands.
# tests/test_oracle_parity.py::test_driver_window_priority and
# ::test_no_query_stays_driver_dark enforce the rotation.
_WINDOW_R05 = [
    # pinned sentinels: full reference §2 surface ...
    "q_count",
    "q_frequency_by_name",
    "q_recent_top20",
    "q_time_range_full_scan",
    "q_error_analysis",
    "q_projection",
    # ... and the round-1-red analytics trio (oracle fixes must stay proven)
    "q_priority_line_buckets",
    "q_sessionize",
    "q_tumbling_window_batch",
    # r04 driver-red, now canonicalizer-safe (VERDICT r04 "What's wrong")
    "q_sql_array_agg",
    "q_sql_map_functions",
    # VERDICT r04 #1 priority list: highest-complexity round-4 operators
    "q_dup_clusters_star",
    "q_label_propagation",
    "q_pagerank_parts",
    "q_ivm_join_delta",
    "q_table_checksum",
    "q_table_diff",
    "q_bloom_semi_join",
    "q_rolling_median",
    "q_ks_drift",
    "q_dense_ids",
    "q_auc_eval",
    "q_salted_join",
    # remaining never-verified round-4 operators, complexity-ordered
    "q_containment_pairs",
    "q_table_profile",
    "q_bm25_topk",
    "q_hybrid_rrf",
    "q_inverted_index",
    "q_compaction_plan",
    "q_pruning_efficiency",
    "q_salted_agg",
    "q_skyline_frontier",
    "q_stratified_kfold",
    "q_weighted_reservoir",
    "q_neyman_allocation",
    "q_benford_audit",
    "q_audience_overlap",
    "q_fuzzy_match_names",
    "q_chunk_embed_pool",
    "q_quality_calibration",
    "q_negative_sampling",
    "q_oov_rate",
    "q_token_entropy",
    "q_chisq_lang_source",
    "q_cross_source_dups",
    "q_dedup_cluster_stats",
    "q_psi_drift",
    "q_term_pmi",
    "q_source_similarity",
    "q_temperature_mix",
]


def _merged(attr: str) -> dict:
    api = getattr(api_logs, attr)
    ana = getattr(analytics, attr)
    sql = getattr(sql_surface, attr)
    ops = _OPS_QUERIES if attr == "QUERIES" else _OPS_ORACLE
    full: dict = {}
    full.update(api)
    full.update(ops)
    if attr == "QUERIES":
        full.update(_OPS_LATE)
    full.update(sql)
    full.update(ana)
    if attr == "QUERIES":
        full.update(_OPS_TAIL)
    if attr != "QUERIES":
        return full  # oracle dict order is irrelevant to the driver
    out: dict = {}
    for k in _WINDOW_R05:  # window entries first, in window order
        if k in full:
            out[k] = full[k]
    for k, v in full.items():  # then everything already proven, stable order
        if k not in out:
            out[k] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return _merged("QUERIES")


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (tables region nation
    customer supplier part orders lineitem events documents embeddings are
    pre-registered views). Keys without an oracle get a rows-only check.
    """
    return _merged("ORACLE")
