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
# Round-4 policy (VERDICT r03 #1): keep the 9 pinned sentinels (reference §2
# surface + the round-1-red analytics trio), then spend every remaining slot
# on entries that have never earned a driver CORRECTNESS row — all round-3
# operators, the q_sql_* front door, the analytics additions, and this
# round's new operators — plus the three re-certifications the verdict asked
# for (non-vacuous q_embedding_neardup, displaced-since-r02 q_show_tables /
# q_limit_scan). Entries green in r03 rotate OUT; their evidence stands.
# tests/test_oracle_parity.py::test_driver_window_priority enforces that no
# never-verified entry stays outside the window while capacity allows.
_WINDOW_R04 = [
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
    # round-3 operators: oracled, never driver-verified
    "q_corr_stats",
    "q_dedup_spans",
    "q_lm_quality",
    "q_bpe_pair_counts",
    "q_zorder_stats",
    "q_dedup_incremental",
    "q_curation_pipeline",
    "q_weighted_sample",
    "q_funnel_conversion",
    "q_retention_cohorts",
    "q_forecast_revenue",
    "q_asof_join_forward",
    "q_asof_join_nearest",
    "q_equiheight_histogram",
    # raw-SQL front door: oracled, never driver-verified
    "q_sql_correlated_exists",
    "q_sql_cte_join",
    "q_sql_case_having",
    "q_sql_grouping_sets",
    "q_sql_intersect",
    "q_sql_regexp_extract",
    "q_sql_array_agg",
    "q_sql_unpivot",
    "q_sql_null_scalars",
    "q_sql_intersect_all",
    "q_sql_lateral_explode",
    "q_sql_filter_clause",
    "q_sql_range_frame",
    "q_sql_ignore_nulls",
    "q_sql_map_functions",
    # re-certifications requested by VERDICT r03
    "q_embedding_neardup",  # threshold fix: was green-but-vacuous (0 rows)
    "q_show_tables",  # §2 S8, displaced since r02
    "q_limit_scan",  # §2 O3, displaced since r02
    # round-4 operators (added below as they land)
    "q_pagerank",
    "q_triangle_counts",
    "q_hopping_window_batch",
    "q_winsorized_stats",
    # rows-only approximate family: never driver-verified (weaker rows-only
    # driver check by design; bounds/merge parity asserted in pytest)
    "q_hll_daily_users",
    "q_kmeans_clusters",
    "q_kll_value_quantiles",
    "q_ann_pq_topk",
    "q_cms_event_counts",
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
    for k in _WINDOW_R04:  # window entries first, in window order
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
