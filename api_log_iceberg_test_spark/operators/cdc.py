"""CDC / upsert operators without a transactional table format.

Iceberg/Delta provide MERGE INTO natively; on plain tables the same
semantics compose from joins — this module provides that composition (the
guide's "anti-join + union + window" pattern) so the engine's capability
doesn't depend on the jar being present.

Scale: one shuffle on the merge key for the outer join; at 100 TB prefer
MERGE INTO on the Iceberg table (copy-on-write/merge-on-read handled by the
format); this composition is the fallback and the semantics reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: update rows whose key matches, insert the rest.

    Equivalent to ``MERGE INTO target USING updates ON t.key = u.key WHEN
    MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. Columns of
    target and updates must match.
    """
    updated_or_new = updates
    unchanged = target.join(updates.select(key), key, "left_anti")
    return unchanged.unionByName(updated_or_new)


def latest_by_key(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """Change-log compaction: keep each key's latest version (ties break on
    higher version only — supply a total order)."""
    w = Window.partitionBy(key).orderBy(F.desc(version_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    change_time_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out changed rows, append new
    versions.

    ``current`` carries (key, attrs..., valid_from, valid_to NULL=open);
    ``changes`` carries (key, attrs..., change_time). Open rows for changed
    keys get valid_to = change_time; new open rows are appended.
    """
    ch = changes.withColumnRenamed(change_time_col, "_chg_ts")
    closing = (
        current.filter(F.col("valid_to").isNull())
        .join(ch.select(key, "_chg_ts"), key)
        .withColumn("valid_to", F.col("_chg_ts"))
        .drop("_chg_ts")
    )
    untouched_open = current.filter(F.col("valid_to").isNull()).join(
        ch.select(key), key, "left_anti"
    )
    history = current.filter(F.col("valid_to").isNotNull())
    new_versions = ch.withColumn("valid_from", F.col("_chg_ts")).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    ).drop("_chg_ts")
    return history.unionByName(closing).unionByName(untouched_open).unionByName(new_versions)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff: classify every key as insert / delete / update.

    The batch analog of an Iceberg changelog scan (``table_changes`` /
    ``CALL ...create_changelog_view`` in Delta, incremental read between
    two snapshot ids in Iceberg — README.md:191-212's commit cadence is
    what creates those snapshots): given two keyed snapshots, emit one row
    per changed key with ``change_type`` in {'insert','delete','update'}
    plus the before/after values of each compared column. Unchanged keys
    are dropped — the output is the minimal change set, which is what a
    downstream incremental maintenance job consumes.

    Scale: one full outer join — a single co-partitioned shuffle on the
    key for both snapshots; the compare itself is a codegen conjunction
    with null-safe equality (``<=>``) so NULL→value and value→NULL edits
    count as updates. At 100 TB prefer the table format's native
    changelog (metadata-only); this composition is the format-free
    fallback and the semantics reference.
    """
    # presence sentinels ride the same join (not value nullability: a row
    # whose compared columns are all NULL must still register as present)
    o = old.select(key, *compare_cols).withColumn("_in_old", F.lit(1))
    n = new.select(key, *compare_cols).withColumn("_in_new", F.lit(1))
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"old_{c}")
        n = n.withColumnRenamed(c, f"new_{c}")
    j = o.join(n, key, "full_outer")
    # key presence decides insert/delete; value inequality decides update
    any_change = F.lit(False)
    for c in compare_cols:
        any_change = any_change | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(any_change, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .drop("_in_old", "_in_new")
    )
