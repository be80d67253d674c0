"""The reference's SQL query surface, Spark-first (SURVEY.md §2).

The reference documents nine query shapes over its single ``logs.api`` table
(README.md:125-168, init-setup.py:166-173, run.sh:100,316). Two layers here:

1. ``*_on(df)`` — each shape as a plan transformer over any DataFrame with
   api-log column semantics. Used by unit tests against generator output.
2. ``q_*(spark, sf_dir)`` — the same shapes bound to the driver's testdata
   (``events`` is the api-table analog per FIXTURES.md §1: ``ts``≈time,
   ``event_type``≈name, ``value``≈numeric predicate target, ``user_id``≈a
   second group key). These are the entries registered in
   ``__spark_entry__.queries()``.

Scale notes: every query here compiles to a single scan + (at most) one
shuffle. Counts and group-bys get partial aggregation map-side; the top-k
query plans ``TakeOrderedAndProject`` (no global sort); time-range predicates
push down to Parquet row-group stats (and to Iceberg partition pruning when
the table is partitioned by ``days(time)``, SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table

# ---------------------------------------------------------------------------
# Layer 1: plan transformers over an api-log DataFrame
# ---------------------------------------------------------------------------


def count_all(df: DataFrame) -> DataFrame:
    """A1 — ``SELECT COUNT(*) FROM api`` (README.md:142, run.sh:316)."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def recent_top_k(df: DataFrame, time_col: str, cols: list[str], k: int = 20) -> DataFrame:
    """O1 — most recent k rows (README.md:145-148:
    ``SELECT time,name,bucket,object FROM api ORDER BY time DESC LIMIT 20``).

    Plans ``TakeOrderedAndProject`` — per-partition heap + driver merge, no
    global sort even at 100 TB.
    """
    return df.select(*cols).orderBy(F.desc(time_col)).limit(k)


def frequency_by(df: DataFrame, key: str) -> DataFrame:
    """A2+O2 — op frequency (README.md:151-154:
    ``SELECT name, COUNT(*) cnt FROM api GROUP BY name ORDER BY cnt DESC``)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).orderBy(F.desc("cnt"), F.asc(key))


def time_range_scan(df: DataFrame, time_col: str, lower: str) -> DataFrame:
    """S2+P2 — ``SELECT * FROM api WHERE time > TIMESTAMP '...'``
    (README.md:157-160). Filter pushes to scan; partition-prunable."""
    return df.filter(F.col(time_col) > F.to_timestamp(F.lit(lower)))


def error_analysis(df: DataFrame, status_col: str, keys: list[str], threshold: int = 400) -> DataFrame:
    """A3+P3 — error breakdown (README.md:163-167: ``SELECT name,
    httpStatusCode, COUNT(*) cnt FROM api WHERE httpStatusCode >= 400
    GROUP BY name, httpStatusCode ORDER BY cnt DESC``)."""
    return (
        df.filter(F.col(status_col) >= F.lit(threshold))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
    )


# ---------------------------------------------------------------------------
# Layer 2: driver-testdata bindings (events ≈ api; FIXTURES.md §1)
# ---------------------------------------------------------------------------


def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: ungrouped COUNT(*) (README.md:142)."""
    return count_all(load_table(spark, sf_dir, "events"))


def q_frequency_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+O2: GROUP BY name frequency (README.md:151-154)."""
    return frequency_by(load_table(spark, sf_dir, "events"), "event_type")


def q_recent_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+P1+O3: recent-20 projection (README.md:145-148).

    ``event_id`` added as deterministic tiebreak for the oracle compare.
    """
    df = load_table(spark, sf_dir, "events")
    return (
        df.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
    )


def q_time_range_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P2+P4: SELECT * over a timestamp range (README.md:157-160).

    Uses the pushdown-preserving loader: the range predicate is applied to
    the raw int64-nanos column so Parquet row-group pruning works (a plain
    filter on the converted timestamp would not push — verified via
    .explain in tests).
    """
    from ..schema import load_table_time_range

    return load_table_time_range(
        spark, sf_dir, "events", "ts", lower="2024-01-20 00:00:00"
    )


def q_error_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+P3: filtered multi-key frequency (README.md:163-167).

    ``value >= 400`` stands in for ``httpStatusCode >= 400``;
    (event_type, user_id) for (name, httpStatusCode).
    """
    return error_analysis(
        load_table(spark, sf_dir, "events"), "value", ["event_type", "user_id"], threshold=400
    )


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column projection — scan must read only these columns
    (README.md:145-146; verify via ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


ORACLE: dict[str, str] = {
    "q_count": "SELECT COUNT(*) AS cnt FROM events",
    "q_frequency_by_name": (
        "SELECT event_type, COUNT(*) AS cnt FROM events "
        "GROUP BY event_type ORDER BY cnt DESC, event_type"
    ),
    "q_recent_top20": (
        "SELECT event_id, ts, user_id, event_type FROM events "
        "ORDER BY ts DESC, event_id DESC LIMIT 20"
    ),
    "q_time_range_full_scan": (
        "SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "q_error_analysis": (
        "SELECT event_type, user_id, COUNT(*) AS cnt FROM events WHERE value >= 400 "
        "GROUP BY event_type, user_id ORDER BY cnt DESC, event_type, user_id"
    ),
    "q_projection": "SELECT event_id, event_type, value FROM events",
}

QUERIES = {
    "q_count": q_count,
    "q_frequency_by_name": q_frequency_by_name,
    "q_recent_top20": q_recent_top20,
    "q_time_range_full_scan": q_time_range_full_scan,
    "q_error_analysis": q_error_analysis,
    "q_projection": q_projection,
}
