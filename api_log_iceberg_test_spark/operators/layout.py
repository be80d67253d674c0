"""Z-order (Morton) clustering for multi-dimensional scan pruning.

The reference's table is clustered by time alone (hidden `days(time)`
partitioning, SURVEY.md §1.3), which prunes only time predicates. When a
second selective dimension exists (tenant, key range, status), engines
cluster files on a space-filling curve instead: sorting by the interleaved
Morton code bounds EVERY participating dimension within a run of rows, so
file/row-group min-max stats prune multi-dimensional predicates — this is
Iceberg's ``zorder`` rewrite strategy and Delta's ``OPTIMIZE ZORDER BY``.

The z-value here is a pure codegen expression (shift/mask/or arithmetic —
no UDFs, no HOFs), so it runs at scan speed and is byte-replicable in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_value(
    cols: list[Column | str], bits: int = 16, validate: bool = False
) -> Column:
    """Morton code interleaving ``bits`` low bits of each column.

    Bit ``i`` of column ``j`` lands at output position ``i * d + j`` — the
    canonical interleave. Inputs must already be non-negative integer
    bucket ordinals in ``[0, 2**bits)`` (bucketize floats/dates first).
    Out-of-range inputs ALIAS silently: only the low ``bits`` bits
    participate, so ordinals ``2**bits`` apart interleave identically, and
    a negative value contributes its two's-complement low bits (e.g. ``-1``
    looks like ``2**bits - 1``) — clustering quietly degrades rather than
    erroring. Pass ``validate=True`` on a first run / in tests to turn
    violations into an executor-side error instead (kept off the default
    hot path: the guard adds a branch per row and, more importantly, the
    DuckDB oracle twin :func:`zorder_sql` has no error channel to mirror
    it). The expression expands to ``bits × d`` shift-and-or terms — wide
    but branch-free and fully inside whole-stage codegen.
    """
    d = len(cols)
    if d < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * d > 63:
        raise ValueError(f"bits*dims = {bits * d} exceeds a signed 64-bit value")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(cc, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    if validate:
        ok = F.lit(True)
        for c in cols:
            cc = (F.col(c) if isinstance(c, str) else c).cast("long")
            ok = ok & (cc >= 0) & (cc < F.lit(1 << bits))
        out = F.when(ok, out).otherwise(
            F.raise_error(F.lit(f"zorder_value: input outside [0, 2**{bits})"))
        )
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton interleave as ANSI SQL text (DuckDB oracle)."""
    d = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c}::BIGINT >> {i}) & 1) << {i * d + j})")
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort rows by their Morton code.

    The write-side half of a zorder rewrite: downstream
    ``write.parquet``/Iceberg append emits files whose min-max stats are
    tight in every clustered dimension. One range exchange (sampled
    boundaries) + in-partition sort — the same cost shape as a global sort
    on one column.
    """
    zcol = "__zorder_sort_key"  # collision-safe: never a user column name
    out = df.withColumn(zcol, zorder_value(list(cols), bits))
    parts = [F.col(zcol)] if num_partitions is None else [num_partitions, F.col(zcol)]
    return out.repartitionByRange(*parts).sortWithinPartitions(zcol).drop(zcol)


def dense_ids(df: DataFrame, sort_col: str, id_col: str = "dense_id") -> DataFrame:
    """Contiguous 0-based ids in ``sort_col`` order WITHOUT a global window.

    ``row_number() OVER (ORDER BY k)`` moves the whole table through ONE
    partition — the canonical scale-killer (Spark even logs "No Partition
    Defined for Window" for it). The distributed classic instead:

    1. range-repartition on the sort key (one sampled range exchange —
       the same cost as any global sort) and sort within partitions;
    2. count rows per partition (tiny: one row per partition);
    3. prefix-sum those counts into per-partition offsets — the only
       unpartitioned window in the plan, over |partitions| rows, not |df|;
    4. broadcast-join offsets back and add the in-partition row_number
       (windowed BY partition id — parallel).

    The result is deterministic in the DATA whenever ``sort_col`` is
    unique, regardless of where the sampled range boundaries fall: ids
    are ranks, and ranks don't depend on the cut points. With duplicate
    keys, ties are broken by physical position within a range and ids
    remain dense but tie order is unspecified (same caveat as zipWithIndex).

    This is the id-assignment step of corpus preparation (stable integer
    doc ids for packing/sharding after a dedup pipeline shrinks the key
    space) and the same partition-offset trick RDD ``zipWithIndex`` uses —
    expressed entirely in DataFrame ops so Catalyst sees through it.
    """
    pid = "__dense_pid"
    rn = "__dense_rn"
    off = "__dense_offset"
    # cache pins the SAMPLED range boundaries: the frame is referenced by
    # both the count branch and the id branch, and re-evaluating the
    # exchange could re-sample different cut points (ReusedExchange usually
    # saves us, but correctness must not hinge on an optimizer rule)
    arranged = (
        df.repartitionByRange(F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .withColumn(pid, F.spark_partition_id())
        .cache()
    )
    counts = arranged.groupBy(pid).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        pid, F.coalesce(F.sum("_n").over(w), F.lit(0)).alias(off)
    )
    per_part = Window.partitionBy(pid).orderBy(sort_col)
    return (
        arranged.withColumn(rn, F.row_number().over(per_part))
        .join(F.broadcast(offsets), pid)
        .withColumn(id_col, (F.col(off) + F.col(rn) - 1).cast("long"))
        .drop(pid, rn, off)
    )


def skyline2d(pts: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """2-D Pareto frontier (maximize both columns) without a global window
    or an all-pairs join.

    The naive plans are both scale-killers: NOT EXISTS dominance is an
    O(n²) theta-join, and the classic sort-sweep (keep a row iff its y
    exceeds the running max over all strictly-greater-x rows) is a
    SinglePartition window. This uses the sweep SEMANTICS with the
    partition-offset plan of :func:`dense_ids`:

    1. collapse to one point per distinct x (``max(y)`` — anything less is
       dominated at equal x), making x unique;
    2. range-repartition on x DESC + sort within partitions (one sampled
       range exchange, the global-sort cost shape);
    3. per-partition exclusive running max of y (window BY partition id —
       parallel) and per-partition max (one row per partition);
    4. exclusive prefix-max of the per-partition maxima over the
       |partitions|-row frame (the only unpartitioned window), broadcast
       back;
    5. keep a point iff y exceeds greatest(prior partitions' max, local
       exclusive running max) — i.e. no strictly-greater-x point has ≥ y.

    Output: the frontier points (x, y). Join back on (x, y) if member ids
    are needed; the frontier is typically tiny."""
    pid, loc, pri = "__sky_pid", "__sky_loc", "__sky_prior"
    deduped = pts.groupBy(x).agg(F.max(y).alias(y))
    arranged = (
        deduped.repartitionByRange(F.col(x).desc())
        .sortWithinPartitions(F.col(x).desc())
        .withColumn(pid, F.spark_partition_id())
        .cache()  # pin sampled boundaries across the two references
    )
    per_part = arranged.groupBy(pid).agg(F.max(y).alias("_pm"))
    w_parts = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    prefix = per_part.select(pid, F.max("_pm").over(w_parts).alias("_prior_pm"))
    w_local = (
        Window.partitionBy(pid)
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        arranged.withColumn(loc, F.max(y).over(w_local))
        .join(F.broadcast(prefix), pid)
        .withColumn(pri, F.greatest(F.col(loc), F.col("_prior_pm")))
        .filter(F.col(pri).isNull() | (F.col(y) > F.col(pri)))
    )
    return out.select(x, y)


def exclusive_prefix_sum(
    df: DataFrame, order_col: str, val_col: str, out_col: str = "prefix_sum"
) -> DataFrame:
    """Exclusive running Σ``val_col`` in ``order_col`` order WITHOUT a
    global window — third member of the partition-offset family
    (:func:`dense_ids` = prefix-count, :func:`skyline2d` = prefix-max).

    ``order_col`` must be unique (dedupe/aggregate by it first — the
    callers here feed post-groupBy frames). One range exchange + a window
    BY partition id; the only unpartitioned window runs over the
    |partitions|-row per-partition totals."""
    pid, loc, off = "__pfx_pid", "__pfx_loc", "__pfx_off"
    arranged = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(pid, F.spark_partition_id())
        .cache()  # pin sampled boundaries across the two references
    )
    per = arranged.groupBy(pid).agg(F.sum(val_col).alias("_ps"))
    w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(pid, F.coalesce(F.sum("_ps").over(w), F.lit(0)).alias(off))
    w_loc = (
        Window.partitionBy(pid)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        arranged.withColumn(loc, F.coalesce(F.sum(val_col).over(w_loc), F.lit(0)))
        .join(F.broadcast(offs), pid)
        .withColumn(out_col, F.col(off) + F.col(loc))
        .drop(pid, loc, off)
    )


def exclusive_prefix_max(
    df: DataFrame, order_col: str, val_col: str, out_col: str = "prefix_max"
) -> DataFrame:
    """Exclusive running MAX of ``val_col`` in ``order_col`` order WITHOUT
    a global window — fourth member of the partition-offset family
    (:func:`dense_ids` prefix-count, :func:`skyline2d` prefix-max over a
    sort key, :func:`exclusive_prefix_sum` prefix-sum). NULL for the
    global first row (nothing precedes it), exactly like ``MAX() OVER
    (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    ``order_col`` must be unique. One range exchange + an add-only window
    BY partition id; the only unpartitioned window runs over the
    |partitions|-row per-partition maxima (``F.greatest`` skips NULLs, so
    the first partition's missing offset and a first-in-partition row's
    missing local prefix combine correctly)."""
    pid, loc, off = "__pmx_pid", "__pmx_loc", "__pmx_off"
    arranged = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(pid, F.spark_partition_id())
        .cache()  # pin sampled boundaries across the two references
    )
    per = arranged.groupBy(pid).agg(F.max(val_col).alias("_pm"))
    w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(pid, F.max("_pm").over(w).alias(off))
    w_loc = (
        Window.partitionBy(pid)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        arranged.withColumn(loc, F.max(val_col).over(w_loc))
        .join(F.broadcast(offs), pid)
        .withColumn(out_col, F.greatest(F.col(loc), F.col(off)))
        .drop(pid, loc, off)
    )
