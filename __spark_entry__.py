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
except ImportError:  # pragma: no cover
    _OPS_QUERIES, _OPS_ORACLE = {}, {}

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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(api_logs.QUERIES)
    out.update(analytics.QUERIES)
    out.update(sql_surface.QUERIES)
    out.update(_OPS_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (tables region nation
    customer supplier part orders lineitem events documents embeddings are
    pre-registered views). Keys without an oracle get a rows-only check.
    """
    out: dict[str, str] = {}
    out.update(api_logs.ORACLE)
    out.update(analytics.ORACLE)
    out.update(sql_surface.ORACLE)
    out.update(_OPS_ORACLE)
    return out
