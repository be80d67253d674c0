"""Analytic extensions beyond the reference surface (SURVEY.md §2.5, §7).

The reference has no joins, windows, set ops, or scalar functions — its
workload is single-table. A drop-in engine still needs them, and the 100 TB
north star demands they plan well. Everything here is built-in DataFrame API:
Catalyst picks broadcast-hash for the small dims (region/nation ≤ a few KB),
sort-merge + AQE skew handling for the fact-fact joins.

Oracle note: every computed column is aliased identically in the DataFrame
plan and the DuckDB SQL (driver hash-compare requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import duration_to_ms
from ..schema import load_table


# --- aggregation breadth ---------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide partial-agg over the fact table.

    Single scan → map-side partial agg → 4-group final agg. At 100 TB this
    is scan-bound; no shuffle pressure (≤ |returnflag×linestatus| groups).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase agg in Spark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (event_type, day) — grouping-set expansion."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", F.col("ts")))
        .rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(F.asc_nulls_first("event_type"), F.asc_nulls_first("day"))
    )


def q_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window() tumbling buckets in batch — the exact expression the
    streaming ingest rollup uses (streaming/windows.py), proving
    batch/stream unification of the window operator."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
        )
        .orderBy("window_start", "event_type")
    )


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations of (event_type, month)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("month", F.month("ts"))
        .cube("event_type", "month")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.asc_nulls_first("event_type"), F.asc_nulls_first("month"))
    )


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup — the batch shape of the streaming tumbling
    window (streaming variant: streaming.windows.hourly_counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("hour", "event_type")
    )


# --- joins ------------------------------------------------------------------


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small dim⋈dim⋈fact chain — nation/region are broadcast explicitly.

    At 100 TB the fact side streams; the dims are KBs. Never shuffle the
    fact table for a dimension lookup.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


def q_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact⋈fact join + agg + top-k.

    orders⋈lineitem shuffles on orderkey (co-partitioned by AQE); customer
    side filtered before the join so the build input is minimal.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (2 broadcast dims + 3 shuffle joins)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation.

    Customers (including order-less ones, via the outer join) bucketed by
    how many qualifying orders they have.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery (orders whose total quantity exceeds
    a threshold) joined back to customer — agg feeding a semi-filter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            "o_orderdate",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("l_orderkey"))
        .limit(20)
    )


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MIN subquery.

    Expressed Spark-style as the de-correlated rewrite Catalyst itself
    performs: per-key MIN aggregate joined back to the fact on
    (key, value == min). At scale both sides shuffle on l_partkey once;
    part is filtered before its join so the scan prunes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    supp = load_table(spark, sf_dir, "supplier")
    min_price = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "mp_partkey")
    )
    return (
        li.join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .drop("mp_partkey")
        .join(part, F.col("l_partkey") == part.p_partkey)
        # supplier scales with SF (unlike nation/region) — no explicit hint;
        # AQE broadcasts while it fits and shuffles past the threshold
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("min_price", 2).alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar MAX over it.

    The supplier-revenue relation is SF-scaled (|suppliers| rows), so the
    scalar MAX is NOT taken with an unpartitioned window (that funnels the
    whole relation through one task — the exact shape the registry-wide
    global-window ban exists to catch; ADVICE r05 flagged the earlier
    version as its one escapee). Instead: a 1-row ``agg(max)`` is
    broadcast-joined back on value equality — the max reduces map-side, the
    filter runs partition-parallel. The revenue frame feeding both branches
    is lazily ``localCheckpoint``-ed so the two consumers share ONE
    materialization; fp-sum recompute divergence between the max branch and
    the probe branch is impossible.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev")
    ).drop("max_rev")
    return (
        # the bounded side here is `top` (the argmax rows, ~1 per tie group),
        # not supplier (SF-scaled) — hint the side that stays small at 100 TB
        F.broadcast(top)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a non-equi correlated predicate feeding
    an aggregate — semi join on (l_orderkey = o_orderkey AND
    l_shipdate > o_orderdate), then count per priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue share)
    over a fact-dim join in a ship-date range."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-05-01 00:00:00")))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part scales with SF — AQE picks broadcast vs shuffle by runtime size
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive brand/size/quantity blocks.

    Catalyst extracts the common join key and pushes the disjunction to
    both scans (part predicates to part, quantity bounds to lineitem via
    OR-simplification) — the pattern that proves complex boolean pushdown.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # part scales with SF — AQE picks broadcast vs shuffle by runtime size
    j = li.join(part, li.l_partkey == part.p_partkey)
    block1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    block2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return j.filter(block1 | block2).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def q_rich_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-avg subquery + NOT EXISTS + group-agg.

    Customers above the positive-balance average with no URGENT order,
    counted per nation. Scalar avg broadcasts (1 row); NOT EXISTS is a
    left-anti join on the filtered orders side.
    """
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_priority_line_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + CASE-bucketed conditional counts
    per category (high/low-priority line counts by return flag)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) under a multi-key groupBy with
    scan-level NOT/IN predicates. Distinct-agg expands to a two-phase
    aggregate (partial distinct per partition, then final) — no row-level
    shuffle of the fact table."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers of 'a%'-named parts
    whose total shipped quantity exceeds a threshold. Inner IN-subqueries
    become left-semi joins; the aggregate-HAVING feeds the outer semi."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    big_suppliers = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 2000)
    )
    return (
        supp.join(
            big_suppliers, supp.s_suppkey == big_suppliers.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue from returned lineitems —
    3-way fact join + broadcast dim, grouped agg, TakeOrdered top-k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between a nation pair, split by year —
    supplier-side and customer-side nation dims both broadcast, the pair
    filter is a symmetric disjunction."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def derived_partsupp(lineitem: DataFrame) -> DataFrame:
    """Deterministic ``partsupp`` derived from the OBSERVED
    ``(l_partkey, l_suppkey)`` pairs — the driver testdata ships no
    partsupp table (VERDICT r03-r05 carried TPC-H Q9/Q11 as
    not-expressible for that reason). TPC-H guarantees every lineitem
    pair exists in partsupp, so the distinct observed pairs ARE the slice
    of partsupp the queries can touch; dbgen's seeded availqty/supplycost
    become closed-form integer arithmetic over the keys, and the DuckDB
    oracle rebuilds the identical relation row-for-row, making the real
    Q9/Q11 plans hash-verifiable. (An earlier round-6 version rebuilt the
    generator's 4-supplier ring from part × |supplier| instead — but the
    testdata's lineitem suppkeys are generated independently of any ring,
    so Q9's partsupp join silently kept only the ~4% of lineitem that
    landed on it; deriving from observed pairs makes the join a true
    enrichment with 100% lineitem coverage, and duplicate composite keys
    are impossible by construction.)

    Scale: one DISTINCT over the composite key — the same shuffle a real
    partsupp extraction from a fact table would pay; keys stay narrow.
    ``ps_supplycost`` = (arith % 19999 + 100) / 100.0 is exact IEEE
    division of small integers — bit-identical across engines.
    """
    return (
        lineitem.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                F.pmod(
                    F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 3, F.lit(9999)
                )
                + 1
            ).alias("ps_availqty"),
            (
                (
                    F.pmod(
                        F.col("ps_partkey") * 29 + F.col("ps_suppkey") * 13,
                        F.lit(19999),
                    )
                    + 100
                )
                / F.lit(100.0)
            ).alias("ps_supplycost"),
        )
    )


#: DuckDB twin of :func:`derived_partsupp` — shared by the Q9/Q11 oracles.
_PARTSUPP_CTE = """
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               (ps_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS ps_availqty,
               ((ps_partkey * 29 + ps_suppkey * 13) % 19999 + 100) / 100.0
                   AS ps_supplycost
        FROM (
            SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem
        )
    )
""".strip()


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: per-nation per-year profit on '%red%' parts — profit =
    line revenue minus supply cost of the quantity, over the 6-relation
    join tree (lineitem ⋈ part ⋈ supplier ⋈ partsupp ⋈ orders ⋈ nation).

    partsupp is :func:`derived_partsupp` (observed-pair derivation, see
    there — every filtered lineitem row survives the partsupp join, as in
    real TPC-H). Plan: part is name-filtered before its join (scan prune +
    AQE may broadcast the survivors); partsupp joins on the composite
    (partkey, suppkey) the lineitem shuffle already carries; nation is
    hinted broadcast (fixed 25 rows); the agg is |nations|×|years| groups
    — map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    # fresh lineitem load for the derivation: passing the SAME instance
    # that later joins ps trips Spark's ambiguous-self-join detection.
    # r16 (guide §3.2 reduce before the shuffle): only '%red%' partkeys can
    # survive the main join, so the pair-DISTINCT — this query's dominant
    # shuffle — now runs on the semi-filtered lineitem slice (~1/26 of
    # rows) instead of the full table. Dropping non-red pairs before vs
    # after the distinct emits the identical ps relation slice; the
    # part-side filter is the same predicate the main join applies.
    red_keys = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey")
    ps = derived_partsupp(
        load_table(spark, sf_dir, "lineitem").join(
            red_keys, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value at a supplier bloc's warehouses
    exceeds a share of the bloc's total stock value.

    Two adaptations, both forced by the driver testdata and SF sweep:
    the bloc is a nation-key range (a single TPC-H nation holds ZERO
    suppliers at sf0.001 — the result would be vacuously empty), and the
    spec's 0.0001/SF fraction becomes the scale-free equivalent
    "2x the average per-part stock value" (a fixed fraction empties the
    result at sf0.1 the same way 0.0001 would without the spec's /SF;
    measured pass/fail margins 7e-3 / 2.7e-3 / 4.8e-5 at sf0.001/0.01/0.1
    — seven orders above fp-sum noise, so engine-side summation order
    cannot flip a row). partsupp is :func:`derived_partsupp`; the bloc
    total+count is a 1-row aggregate attached via broadcast (audited
    BNLJ) — never a global window; the per-part agg shuffles on
    ps_partkey once, off a lazily checkpointed bloc frame shared by both
    branches.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    ps = derived_partsupp(load_table(spark, sf_dir, "lineitem"))
    national = ps.join(supp, ps.ps_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("_value"),
    )
    # r16 (guide §1.2 — don't scan twice what one aggregate yields): the
    # bloc total and part count now derive FROM the per-part aggregate
    # (Σ of group sums; count of groups ≡ the old countDistinct), so the
    # 24 MB national frame is consumed ONCE and the shared checkpoint
    # shrinks to the |parts|-row per-part frame. The only numeric delta is
    # _total's double-summation grouping order — bounded at ~1e-16
    # relative, seven orders below the documented smallest pass/fail
    # margin (4.8e-5 at sf0.1), and _total feeds only the threshold
    # filter; raw_value per part is byte-identical. Oracle green at
    # sf0.001/0.01 (sweep records appended this round).
    per_part = (
        national.groupBy("ps_partkey")
        .agg(F.sum("_value").alias("raw_value"))
        .localCheckpoint(eager=False)  # shared by the total + output branches
    )
    total = per_part.agg(
        F.sum("raw_value").alias("_total"),
        F.count(F.lit(1)).alias("_nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("_total") / F.col("_nparts") * 2.0)
        .select("ps_partkey", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's STANDARD-part
    revenue per year — conditional-sum ratio over a 7-table join tree
    (shuffle fact joins; nation/region hinted broadcast — fixed 25/5 rows;
    part/customer/supplier SF-scaled, so AQE sizes those joins)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part (even type-filtered) scales with SF — no hint, AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact —
    suppliers with a late line in a multi-supplier order where NO OTHER
    supplier was late (late := l_shipdate > o_orderdate proxy; the
    reference schema lacks commit/receipt dates). Two semi/anti joins with
    non-equi conjuncts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # r16 (guide §2.3 aggregate-before-shuffle, §2.4 one partitioning
    # reused): the EXISTS/NOT-EXISTS pair is evaluated as two per-order
    # distinct-supplier counts instead of a semi + anti join that
    # re-shuffled lineitem three times (l1, the full-fact l2 probe, and
    # l3 ≡ l1 recomputed). For a late line of supplier s in order o:
    #   EXISTS line with suppkey ≠ s         ⇔ |distinct suppkeys of o| ≥ 2
    #     (s itself is in o's supplier set, so any second member differs);
    #   NOT EXISTS late line with suppkey ≠ s ⇔ |distinct LATE suppkeys| = 1
    #     (s is late, so the late-supplier set is exactly {s}).
    # Row-for-row identical to the join form (verified vs the r15 plan at
    # sf0.01/sf0.1 and by the unchanged oracle): the semi/anti joins never
    # duplicated l1 rows, and the counts are per-order constants. Every
    # aggregate and join here keys on l_orderkey, so the plan establishes
    # that partitioning once; suppkeys are non-null by schema, so
    # count_distinct sees every line the != predicates saw.
    n_supp = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct("l_suppkey").alias("_ns")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("_lk")).agg(
        F.count_distinct("l_suppkey").alias("_nls")
    )
    waiting = (
        late.join(n_supp, late.l_orderkey == F.col("_ok"))
        .join(n_late, late.l_orderkey == F.col("_lk"))
        .filter((F.col("_ns") >= 2) & (F.col("_nls") == 1))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-AVG threshold — revenue from
    below-average-quantity lines of one brand, decorrelated as a per-part
    AVG aggregate joined back (both sides shuffle on l_partkey once)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("qty_lim"))
        .withColumnRenamed("l_partkey", "ap_partkey")
    )
    return (
        # brand-filtered part is 1/|brands| of an SF-scaled table — no hint
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having ≥1 high-value order."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no order above 300k — the
    complement of q_semi_join's EXISTS shape.

    r07: the original predicate ("no orders at all") was the empty set at
    every driver SF — hash-green but vacuous (0 rows proves nothing, the
    r06 `_usable_evidence_row` rule), which kept the entry permanently
    dark-queued. The 300k threshold keeps the anti-join shape and is
    non-empty at sf0.001/0.01/0.1 (3/30/308 rows).
    """
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# --- window functions --------------------------------------------------------


def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER top-3 per key — the scalable 'top-N per group' idiom
    (shuffle once on the partition key; no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value", "rn")
        .orderBy("event_type", "rn")
    )


def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth over one window spec: ntile, percent_rank,
    cume_dist, dense_rank, lag, lead — all share a single sort/exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    ).orderBy("event_id")


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame moving average (ROWS BETWEEN 3 PRECEDING AND CURRENT):
    the sliding-frame counterpart of q_running_total's unbounded frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("mavg"),
    ).orderBy("event_id")


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user ordered by event time (analytic frame).

    Accumulates on an exact decimal grid: each value quantizes to 1e-6
    units (floor(x·1e6+0.5), IEEE-identical in both engines), the
    running SUM runs over DECIMAL(38,0) units — exact integers, so the
    total is independent of summation ORDER — and the 4dp output comes
    from the same explicit floor quantization. The r07 sf1.0 sweep
    caught the fp version flipping 25 rounding boundaries (Spark's
    sequential running sum vs DuckDB's segment-tree association differ
    by ulps; at 1M rows some cumsum always lands within an ulp of a
    half boundary). Exactness is also the 100 TB property: an
    association-dependent running total isn't reproducible across
    repartitionings or resumes; the grid sum is.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    units = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.floor(F.sum(units).over(w).cast("double") / 1e2 + F.lit(0.5))
            / 1e4
        ).alias("running_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative sum.

    Batch shape of session windows; the streaming variant is
    ``streaming.sessionize`` (applyInPandasWithState). Scales: one shuffle on
    user_id, everything else window-local.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Compare at microsecond precision: ts.cast("long") floors to whole
    # seconds, so a true gap in (1800s, 1801s) would split sessions in the
    # (fractional-epoch) oracle but not here. unix_micros matches DuckDB's
    # epoch_us exactly. cast("timestamp_ltz") first: NTZ-typed parquet
    # (isAdjustedToUTC=false) is rejected by unix_micros; the cast is a no-op
    # on LTZ and only the gap (a difference) is used, so tz offsets cancel.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = ts_us - F.lag(ts_us).over(w)
    sess = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ).withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


# --- set operations -----------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL over (user, day) sets: purchase-days with no error by
    the same user on the same day.

    r07: the original user-grain version ("purchasers who never erred")
    was the empty set at every driver SF — the user universe is dense, so
    every purchaser also errs eventually. Day grain keeps the set-op
    shape and is non-empty at sf0.001/0.01/0.1 (105/1018/10471 rows).
    Both sides are DISTINCT projections, so EXCEPT ALL ≡ EXCEPT; the ALL
    variant is kept to exercise Spark's exceptAll operator.
    """
    ev = load_table(spark, sf_dir, "events")
    pday = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("day")
    )
    eday = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.to_date("ts").alias("day")
    )
    # day serialized as yyyy-MM-dd text: DATE surfaces as python date in
    # Spark vs datetime64 in DuckDB's fetchdf and the raw-value hash
    # compares dtypes (driver-window-policy: scalar, engine-stable cols)
    return (
        pday.distinct()
        .exceptAll(eday.distinct())
        .select("user_id", F.date_format("day", "yyyy-MM-dd").alias("day"))
        .orderBy("user_id", "day")
    )


def q_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered streams then re-aggregate."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") >= 300).select("event_type")
    b = ev.filter(F.col("event_type") == "signup").select("event_type")
    return (
        a.unionAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


# --- scalar-function surface ---------------------------------------------------


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events ``props`` column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


def q_duration_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-string parse (the reference stores requestTime as string,
    README.md:183-184). Round-trip: format events.value as "<v>ms" then
    parse back with :func:`functions.duration_to_ms` — oracle is the
    identity, so the parse expression itself is what's under test.
    """
    ev = load_table(spark, sf_dir, "events")
    dur = F.concat(F.col("value").cast("string"), F.lit("ms"))
    return ev.select("event_id", F.round(duration_to_ms(dur), 6).alias("request_ms"))


def q_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar batch: one row per event with derived cols."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.length("props").alias("props_len"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.round(F.sqrt("value"), 6).alias("value_sqrt"),
        F.round(F.ln(F.col("value") + 1), 6).alias("value_ln1p"),
    )


# --- as-of join (custom operator the reference lacks; SURVEY.md §7) -----------


def _asof_tagged(ev: DataFrame, carry_ts: bool = False) -> DataFrame:
    """Shared scaffold for the as-of family: purchases as the left side,
    signup/click as the right side, unioned with a marker and typed NULL
    padding so one window pass per direction resolves every match. With
    ``carry_ts`` the right-side event time is also carried (needed by the
    nearest direction to compare |Δt|); ``r_ts``/``r_event_id`` are null on
    exactly the same rows, so paired last-IGNORE-NULLS picks stay
    row-consistent."""
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    right = ev.filter(F.col("event_type").isin("signup", "click")).select(
        "user_id", "ts", F.col("event_id").alias("r_event_id")
    )
    ts_type = ev.schema["ts"].dataType
    lcols = [
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("is_left"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("r_event_id"),
    ]
    rcols = [
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("r_event_id"),
    ]
    if carry_ts:
        lcols.append(F.lit(None).cast(ts_type).alias("r_ts"))
        rcols.append(F.col("ts").alias("r_ts"))
    return left.select(*lcols).unionByName(right.select(*rcols))


def _asof_window(direction: str):
    """The per-direction window. Tie-break asymmetry is deliberate and
    lives here only: backward takes the MAX id among equal-ts rights (the
    last one laid down), forward the MIN (the first one coming up); right
    rows sort before left rows at equal ts in both, so ties count as
    matches."""
    if direction == "backward":
        order = [F.asc("ts"), F.asc("is_left"), F.asc("r_event_id")]
    else:
        order = [F.desc("ts"), F.asc("is_left"), F.desc("r_event_id")]
    return (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent prior-or-equal
    signup/click event.

    Spark has no ASOF JOIN operator; the scalable composition is the
    union-marker trick: union both sides tagged, one window sort per user,
    ``last(right, ignorenulls)`` carries the latest right-side row forward —
    one shuffle on the join key, no range-explode, no pair blowup. (DuckDB
    oracle uses its native ASOF JOIN.)
    """
    tagged = _asof_tagged(load_table(spark, sf_dir, "events"))
    w = _asof_window("backward")
    matched = tagged.withColumn("matched_r", F.last("r_event_id", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("is_left") == 1)
        .select("user_id", "event_id", F.col("matched_r").alias("prior_event_id"))
        .orderBy("user_id", "event_id")
    )


# --- approx / percentile aggregates & catalog introspection -------------------


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    `quantile_cont`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx count-distinct — rows-only (sketch values are
    implementation-specific); exactness envelope asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


def q_limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: bare LIMIT (README.md:74,160 `SELECT * ... LIMIT n`) — rows-only
    (any-100-rows is not value-comparable by design)."""
    return load_table(spark, sf_dir, "events").limit(100)


def q_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: SHOW TABLES introspection (README.md:137-139)."""
    from ..catalog import show_tables

    return show_tables(spark, sf_dir)


# --- oracle SQL ---------------------------------------------------------------

ORACLE: dict[str, str] = {
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_base_price,
               SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               AVG(l_quantity) AS avg_qty,
               AVG(l_extendedprice) AS avg_price,
               AVG(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q_rollup_daily": """
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY ROLLUP (event_type, day)
        ORDER BY event_type NULLS FIRST, day NULLS FIRST
    """,
    "q_tumbling_window_batch": """
        SELECT to_timestamp((epoch_us(ts) // 21600000000) * 21600)::TIMESTAMP AS window_start,
               event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    "q_cube_counts": """
        SELECT event_type, EXTRACT(month FROM ts) AS month, COUNT(*) AS cnt
        FROM events
        GROUP BY CUBE (event_type, month)
        ORDER BY event_type NULLS FIRST, month NULLS FIRST
    """,
    "q_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
               ROUND(AVG(value), 6) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type
    """,
    "q_broadcast_dim_join": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "q_revenue_topk": """
        SELECT l_orderkey, o_orderdate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "q_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "q_customer_order_histogram": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) t GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q_large_orders": """
        SELECT c_custkey, c_name, l_orderkey, o_orderdate,
               ROUND(total_qty, 2) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, l_orderkey LIMIT 20
    """,
    "q_min_price_supplier": """
        SELECT DISTINCT p_partkey, p_name, s_name,
               ROUND(l_extendedprice, 2) AS min_price
        FROM part, lineitem, supplier
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size <= 15
          AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                                 FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        ORDER BY p_partkey, s_name
    """,
    "q_top_supplier_revenue": """
        WITH revenue AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        ), ranked AS (
            SELECT *, MAX(total_revenue) OVER () AS max_rev FROM revenue
        )
        SELECT s_suppkey, s_name, ROUND(total_revenue, 4) AS total_revenue
        FROM ranked JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = max_rev
        ORDER BY s_suppkey
    """,
    "q_late_ship_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_promo_revenue_pct": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-05-01 00:00:00'
    """,
    "q_disjunctive_revenue": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
    """,
    "q_rich_quiet_customers": """
        SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "q_priority_line_buckets": """
        SELECT l_returnflag,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_supplier_part_counts": """
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 9, 13)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    "q_bulk_part_suppliers": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            GROUP BY l_suppkey HAVING SUM(l_quantity) > 2000)
        ORDER BY s_suppkey
    """,
    "q_returned_item_customers": """
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q_nation_trade_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l_shipdate)::INT AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q_product_profit": f"""
        WITH {_PARTSUPP_CTE}
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
                   l_extendedprice * (1 - l_discount)
                       - ps_supplycost * l_quantity AS amount
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    "q_important_stock": f"""
        WITH {_PARTSUPP_CTE},
        national AS (
            SELECT ps_partkey, ps_supplycost * ps_availqty AS _value
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_nationkey < 13
        )
        SELECT ps_partkey, ROUND(SUM(_value), 2) AS part_value
        FROM national
        GROUP BY ps_partkey
        HAVING SUM(_value) > (SELECT SUM(_value) / COUNT(DISTINCT ps_partkey)
                                     * 2.0
                              FROM national)
        ORDER BY part_value DESC, ps_partkey
    """,
    "q_market_share": """
        SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
               ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        GROUP BY o_year ORDER BY o_year
    """,
    "q_waiting_suppliers": """
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > o_orderdate
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate)
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey LIMIT 20
    """,
    "q_small_qty_revenue": """
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l JOIN part ON l.l_partkey = p_partkey
        WHERE p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    "q_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "q_topn_per_group": """
        SELECT event_type, event_id, value, rn FROM (
            SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM events) t
        WHERE rn <= 3 ORDER BY event_type, rn
    """,
    "q_window_rank_suite": """
        SELECT event_id, event_type, value,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               DENSE_RANK() OVER w AS drank,
               LAG(value, 1) OVER w AS prev_value,
               LEAD(value, 1) OVER w AS next_value
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        ORDER BY event_id
    """,
    "q_moving_avg": """
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mavg
        FROM events ORDER BY event_id
    """,
    "q_running_total": """
        SELECT user_id, event_id, ts,
               FLOOR(CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) / 1e2 + 0.5) / 1e4
                     AS running_value
        FROM events
    """,
    "q_sessionize": """
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    "q_set_ops": """
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day FROM
        (SELECT DISTINCT user_id, ts::DATE AS day
         FROM events WHERE event_type = 'purchase'
         EXCEPT ALL
         SELECT DISTINCT user_id, ts::DATE AS day
         FROM events WHERE event_type = 'error') t
        ORDER BY user_id, day
    """,
    "q_union_counts": """
        SELECT event_type, COUNT(*) AS cnt FROM (
            SELECT event_type FROM events WHERE value >= 300
            UNION ALL
            SELECT event_type FROM events WHERE event_type = 'signup') t
        GROUP BY event_type ORDER BY event_type
    """,
    "q_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
        ORDER BY event_id
    """,
    "q_duration_parse_roundtrip": """
        SELECT event_id, ROUND(value, 6) AS request_ms FROM events
    """,
    "q_string_date_math": """
        SELECT event_id,
               UPPER(event_type) AS type_upper,
               LENGTH(props) AS props_len,
               EXTRACT(year FROM ts) AS y,
               EXTRACT(month FROM ts) AS m,
               EXTRACT(day FROM ts) AS d,
               EXTRACT(hour FROM ts) AS h,
               ROUND(SQRT(value), 6) AS value_sqrt,
               ROUND(LN(value + 1), 6) AS value_ln1p
        FROM events
    """,
    "q_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.9), 6) AS p90,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q_show_tables": """
        SELECT table_name FROM information_schema.tables
        WHERE table_name IN ('region','nation','customer','supplier','part',
                             'orders','lineitem','events','documents','embeddings')
        ORDER BY table_name
    """,
    "q_asof_join": """
        SELECT l.user_id, l.event_id, r.r_event_id AS prior_event_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS r_event_id FROM events
                        WHERE event_type IN ('signup','click')) r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.user_id, l.event_id
    """,
}

QUERIES = {
    "q_pricing_summary": q_pricing_summary,
    "q_distinct_users": q_distinct_users,
    "q_rollup_daily": q_rollup_daily,
    "q_hourly_rollup": q_hourly_rollup,
    "q_broadcast_dim_join": q_broadcast_dim_join,
    "q_revenue_topk": q_revenue_topk,
    "q_local_supplier_volume": q_local_supplier_volume,
    "q_customer_order_histogram": q_customer_order_histogram,
    "q_large_orders": q_large_orders,
    "q_min_price_supplier": q_min_price_supplier,
    "q_top_supplier_revenue": q_top_supplier_revenue,
    "q_late_ship_priority": q_late_ship_priority,
    "q_priority_line_buckets": q_priority_line_buckets,
    "q_supplier_part_counts": q_supplier_part_counts,
    "q_bulk_part_suppliers": q_bulk_part_suppliers,
    "q_small_qty_revenue": q_small_qty_revenue,
    "q_returned_item_customers": q_returned_item_customers,
    "q_nation_trade_volume": q_nation_trade_volume,
    "q_market_share": q_market_share,
    # round 6: Q9/Q11 over the deterministically derived partsupp
    "q_product_profit": q_product_profit,
    "q_important_stock": q_important_stock,
    "q_waiting_suppliers": q_waiting_suppliers,
    "q_promo_revenue_pct": q_promo_revenue_pct,
    "q_disjunctive_revenue": q_disjunctive_revenue,
    "q_rich_quiet_customers": q_rich_quiet_customers,
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_topn_per_group": q_topn_per_group,
    "q_window_rank_suite": q_window_rank_suite,
    "q_moving_avg": q_moving_avg,
    "q_running_total": q_running_total,
    "q_sessionize": q_sessionize,
    "q_set_ops": q_set_ops,
    "q_union_counts": q_union_counts,
    "q_json_extract": q_json_extract,
    "q_duration_parse_roundtrip": q_duration_parse_roundtrip,
    "q_string_date_math": q_string_date_math,
    "q_asof_join": q_asof_join,
    "q_tumbling_window_batch": q_tumbling_window_batch,
    "q_cube_counts": q_cube_counts,
    "q_percentiles": q_percentiles,
    "q_approx_distinct": q_approx_distinct,
    "q_limit_scan": q_limit_scan,
    "q_show_tables": q_show_tables,
}


# --- product-analytics companions to sessionization -------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per signup-day cohort, the fraction of users
    whose first signup is followed by a purchase within 7 days.

    The classic event-sequence query (sessionize's companion): one shuffle
    keys users, the purchase join stays on the same key, the cohort agg is
    combinable. NTZ-safe — only same-type timestamp comparisons and
    interval arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    per_user = (
        signups.join(purchases, "user_id", "left")
        .groupBy("user_id", "signup_ts")
        .agg(
            F.max(
                F.when(
                    (F.col("p_ts") >= F.col("signup_ts"))
                    & (
                        F.col("p_ts")
                        <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
                    ),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return (
        per_user.groupBy(F.date_trunc("day", F.col("signup_ts")).alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum("converted").cast("long").alias("n_converted_7d"),
            F.round(
                F.sum("converted") / F.count(F.lit(1)).cast("double"), 6
            ).alias("conv_rate"),
        )
        .orderBy("cohort_day")
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users cohorted by first-signup week, counted
    as retained in week N if they emit ANY event N weeks later (N ≤ 4).

    Distinct-user counting per (cohort, offset) cell — the matrix every
    growth dashboard draws. Scale: both aggs are partial-combinable; the
    activity join shuffles on user_id once.
    """
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("signup_day"))
    )
    activity = ev.select("user_id", F.to_date("ts").alias("act_day"))
    return (
        signups.join(activity, "user_id")
        .withColumn(
            "week_offset",
            F.floor(F.datediff(F.col("act_day"), F.col("signup_day")) / 7).cast(
                "long"
            ),
        )
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") <= 4))
        .groupBy(
            F.date_trunc("week", F.col("signup_day")).alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


ORACLE["q_funnel_conversion"] = """
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
    per_user AS (
        SELECT s.user_id, s.signup_ts,
               MAX(CASE WHEN p.p_ts >= s.signup_ts
                         AND p.p_ts <= s.signup_ts + INTERVAL 7 DAY
                        THEN 1 ELSE 0 END) AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id
        GROUP BY s.user_id, s.signup_ts
    )
    SELECT date_trunc('day', signup_ts) AS cohort_day,
           COUNT(*) AS n_signups,
           SUM(converted)::BIGINT AS n_converted_7d,
           ROUND(SUM(converted) / COUNT(*)::DOUBLE, 6) AS conv_rate
    FROM per_user GROUP BY 1 ORDER BY 1
"""

ORACLE["q_retention_cohorts"] = """
    WITH s AS (
        SELECT user_id, MIN(ts)::DATE AS signup_day FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    a AS (SELECT user_id, ts::DATE AS act_day FROM events),
    j AS (
        SELECT s.user_id, s.signup_day,
               (date_diff('day', s.signup_day, a.act_day) // 7) AS week_offset
        FROM s JOIN a ON s.user_id = a.user_id
        WHERE date_diff('day', s.signup_day, a.act_day) >= 0
          AND date_diff('day', s.signup_day, a.act_day) <= 34
    )
    SELECT date_trunc('week', signup_day)::TIMESTAMP AS cohort_week,
           week_offset, COUNT(DISTINCT user_id) AS n_active
    FROM j WHERE week_offset BETWEEN 0 AND 4
    GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset
"""

QUERIES["q_funnel_conversion"] = q_funnel_conversion
QUERIES["q_retention_cohorts"] = q_retention_cohorts


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecasting revenue change — a pure scan-side
    filter + single combinable agg. Every predicate pushes to the parquet
    scan; the only exchange is the 1-row partial-agg merge. (Q9/Q11 are
    the two TPC-H shapes this suite omits: the testdata ships no partsupp
    table, and ps_supplycost/ps_availqty cannot be faithfully synthesized.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


ORACLE["q_forecast_revenue"] = """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

QUERIES["q_forecast_revenue"] = q_forecast_revenue


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the user's FIRST signup/click
    at-or-after it (pandas merge_asof direction='forward'; kdb aj's dual).

    Same scalable union-marker composition as the backward variant —
    mirrored window: descending event time, right rows before left rows at
    equal ts (ties count as at-or-after), ``r_event_id DESC`` so equal-ts
    right rows resolve to the minimum id deterministically. One shuffle on
    the join key; a nearest-direction join composes from the backward +
    forward picks by |Δt|.
    """
    tagged = _asof_tagged(load_table(spark, sf_dir, "events"))
    w = _asof_window("forward")
    matched = tagged.withColumn(
        "matched_r", F.last("r_event_id", ignorenulls=True).over(w)
    )
    return (
        matched.filter(F.col("is_left") == 1)
        .select("user_id", "event_id", F.col("matched_r").alias("next_event_id"))
        .orderBy("user_id", "event_id")
    )


ORACLE["q_asof_join_forward"] = """
    WITH l AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, ts, event_id AS r_event_id FROM events
        WHERE event_type IN ('signup', 'click')
    ),
    tagged AS (
        SELECT user_id, ts, 1 AS is_left, event_id, NULL::BIGINT AS r_event_id FROM l
        UNION ALL
        SELECT user_id, ts, 0, NULL::BIGINT, r_event_id FROM r
    ),
    m AS (
        SELECT *,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, is_left ASC, r_event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS next_event_id
        FROM tagged
    )
    SELECT user_id, event_id, next_event_id
    FROM m WHERE is_left = 1 ORDER BY user_id, event_id
"""

QUERIES["q_asof_join_forward"] = q_asof_join_forward


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (merge_asof direction='nearest'): for each
    purchase, whichever signup/click is closer in time, looking both ways;
    |Δt| ties resolve backward.

    Composes the backward and forward picks as two windows over ONE tagged
    union — same partition key, so one shuffle and two in-partition sorts,
    still no range explode. Per direction the carried (ts, id) columns are
    null on exactly the same rows, so paired last-IGNORE-NULLS picks stay
    row-consistent. NTZ-safe: |Δt| uses the cast-to-LTZ epoch trick.
    """
    tagged = _asof_tagged(load_table(spark, sf_dir, "events"), carry_ts=True)
    wb = _asof_window("backward")
    wf = _asof_window("forward")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))
    m = (
        tagged.withColumn("b_id", F.last("r_event_id", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last("r_ts", ignorenulls=True).over(wb))
        .withColumn("f_id", F.last("r_event_id", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.last("r_ts", ignorenulls=True).over(wf))
        .filter(F.col("is_left") == 1)
    )
    db = us("ts") - us("b_ts")
    df_ = us("f_ts") - us("ts")
    nearest = (
        F.when(F.col("b_id").isNull(), F.col("f_id"))
        .when(F.col("f_id").isNull(), F.col("b_id"))
        .when(df_ < db, F.col("f_id"))
        .otherwise(F.col("b_id"))
    )
    direction = (
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None).cast("string"))
        .when(F.col("b_id").isNull(), "forward")
        .when(F.col("f_id").isNull(), "backward")
        .when(df_ < db, "forward")
        .otherwise("backward")
    )
    return m.select(
        "user_id",
        "event_id",
        nearest.alias("nearest_event_id"),
        direction.alias("direction"),
    ).orderBy("user_id", "event_id")


ORACLE["q_asof_join_nearest"] = """
    WITH l AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, ts, ts AS r_ts, event_id AS r_event_id FROM events
        WHERE event_type IN ('signup', 'click')
    ),
    tagged AS (
        SELECT user_id, ts, 1 AS is_left, event_id,
               NULL::TIMESTAMP AS r_ts, NULL::BIGINT AS r_event_id FROM l
        UNION ALL
        SELECT user_id, ts, 0, NULL::BIGINT, r_ts, r_event_id FROM r
    ),
    m AS (
        SELECT *,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER wb AS b_id,
               LAST_VALUE(r_ts IGNORE NULLS) OVER wb AS b_ts,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER wf AS f_id,
               LAST_VALUE(r_ts IGNORE NULLS) OVER wf AS f_ts
        FROM tagged
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_left, r_event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts DESC, is_left ASC, r_event_id DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CASE WHEN b_id IS NULL THEN f_id
                WHEN f_id IS NULL THEN b_id
                WHEN epoch_us(f_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(b_ts)
                     THEN f_id ELSE b_id END AS nearest_event_id,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN b_id IS NULL THEN 'forward'
                WHEN f_id IS NULL THEN 'backward'
                WHEN epoch_us(f_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(b_ts)
                     THEN 'forward' ELSE 'backward' END AS direction
    FROM m WHERE is_left = 1 ORDER BY user_id, event_id
"""

QUERIES["q_asof_join_nearest"] = q_asof_join_nearest


def q_equiheight_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height (decile) histogram of event values — the profiling
    companion to q_value_histogram's equi-width buckets.

    NOT the naive NTILE-over-global-sort plan (a single-partition window —
    wrong at any scale): decile boundaries come from one combinable exact
    `percentile` aggregate, broadcast back, and the bucket id is a codegen
    sum of 9 comparisons at scan speed. Boundary ties land in the lower
    bucket in both engines, so counts are deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    probs = [i / 10.0 for i in range(1, 10)]
    bounds = ev.agg(
        *[
            F.expr(f"percentile(value, {p})").alias(f"b{i}")
            for i, p in enumerate(probs, 1)
        ]
    )
    j = ev.crossJoin(F.broadcast(bounds))
    bucket = sum(
        [F.when(F.col("value") > F.col(f"b{i}"), 1).otherwise(0) for i in range(1, 10)],
        F.lit(0),
    ).cast("long")
    return (
        j.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


ORACLE["q_equiheight_histogram"] = """
    WITH b AS (
        SELECT quantile_cont(value, 0.1) AS b1, quantile_cont(value, 0.2) AS b2,
               quantile_cont(value, 0.3) AS b3, quantile_cont(value, 0.4) AS b4,
               quantile_cont(value, 0.5) AS b5, quantile_cont(value, 0.6) AS b6,
               quantile_cont(value, 0.7) AS b7, quantile_cont(value, 0.8) AS b8,
               quantile_cont(value, 0.9) AS b9
        FROM events
    )
    SELECT (CASE WHEN value > b1 THEN 1 ELSE 0 END
          + CASE WHEN value > b2 THEN 1 ELSE 0 END
          + CASE WHEN value > b3 THEN 1 ELSE 0 END
          + CASE WHEN value > b4 THEN 1 ELSE 0 END
          + CASE WHEN value > b5 THEN 1 ELSE 0 END
          + CASE WHEN value > b6 THEN 1 ELSE 0 END
          + CASE WHEN value > b7 THEN 1 ELSE 0 END
          + CASE WHEN value > b8 THEN 1 ELSE 0 END
          + CASE WHEN value > b9 THEN 1 ELSE 0 END)::BIGINT AS bucket,
           COUNT(*) AS cnt,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM events CROSS JOIN b
    GROUP BY 1 ORDER BY 1
"""

QUERIES["q_equiheight_histogram"] = q_equiheight_histogram


def q_hopping_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window() with a slide — hopping/sliding windows in batch, the
    exact expression the streaming sliding rollup uses (each event lands in
    size/slide = 3 windows). Spark explodes each row into its 3 windows at
    scan speed; the shuffle carries (window, event_type) partial counts, so
    the 3× expansion collapses map-side before the exchange.

    Oracle: window starts are epoch-aligned multiples of the slide, so the
    3 covering windows of ts are (epoch//slide - k)*slide for k in 0..2.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .orderBy("window_start", "event_type")
    )


ORACLE["q_hopping_window_batch"] = """
    WITH h AS (
        -- epoch_us, not epoch(..)::BIGINT: the BIGINT cast ROUNDS fractional
        -- seconds, shifting events within 0.5s below a boundary into the
        -- wrong bucket; integer microseconds floor-divide exactly
        SELECT event_type,
               to_timestamp(((epoch_us(ts) // 7200000000) - t.off) * 7200)::TIMESTAMP
                   AS window_start
        FROM events CROSS JOIN unnest([0, 1, 2]) AS t(off)
    )
    SELECT window_start, event_type, COUNT(*) AS cnt
    FROM h GROUP BY 1, 2 ORDER BY window_start, event_type
"""

QUERIES["q_hopping_window_batch"] = q_hopping_window_batch


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) robust moments per event type — the
    outlier-resistant profiling aggregate a quality pipeline uses before
    setting filter thresholds.

    Plan: one exact-percentile aggregate per group (combinable, |groups|
    rows), broadcast back, clamp in a codegen projection, re-aggregate.
    Two scans of the fact table, zero non-broadcast joins. At 100 TB swap
    `percentile` for `approx_percentile` (KLL-backed, same plan shape) —
    exact kept here for the differential oracle.

    NULL values are excluded up front (explicit disposition — Spark and
    DuckDB happen to agree that least/greatest skip NULLs, but the filter
    makes winsorization over non-null values an invariant, not a
    coincidence).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = ev.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("v"),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count("v").alias("n_vals"),
            F.round(F.min("p05"), 6).alias("p05"),
            F.round(F.min("p95"), 6).alias("p95"),
            F.round(F.avg("v"), 4).alias("wins_mean"),
            F.round(F.stddev_samp("v"), 4).alias("wins_sd"),
        )
        .orderBy("event_type")
    )


ORACLE["q_winsorized_stats"] = """
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    c AS (
        SELECT e.event_type, b.p05, b.p95,
               least(greatest(value, b.p05), b.p95) AS v
        FROM events e JOIN b USING (event_type)
        WHERE e.value IS NOT NULL
    )
    SELECT event_type,
           COUNT(v) AS n_vals,
           ROUND(MIN(p05), 6) AS p05,
           ROUND(MIN(p95), 6) AS p95,
           ROUND(AVG(v), 4) AS wins_mean,
           ROUND(stddev_samp(v), 4) AS wins_sd
    FROM c GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_winsorized_stats"] = q_winsorized_stats


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: flag events whose value deviates
    > 2.5 sample-sd from the trailing-100-event mean within its type.

    The batch shape of a streaming anomaly monitor. The frame is ROWS-based
    (100 PRECEDING .. 1 PRECEDING — the current row is excluded so it
    cannot mask its own anomaly). Warm-up rows (< 30 trailing events) and
    zero-variance frames are excluded explicitly in both engines — division
    by zero is engine-defined, never relied on. Deterministic: the sort key
    (ts, event_id) is unique.

    NOT the naive sliding-frame aggregate: Spark's WindowExec recomputes
    the whole 100-row buffer per row (no retraction), an O(n·frame)
    constant factor that matters at 100 TB. The O(n) formulation keeps
    cumulative Σv and Σv² and retracts with lag(·, frame+1):
    frame_sum[i] = S[i-1] − S[i-101]. This is also MORE cross-engine
    deterministic than per-frame stddev: cumulative window sums accumulate
    in sort order — the identical sequential double additions in both
    engines — so the oracle matches bitwise, not just within rounding.
    Cancellation audit: |S| ≤ 2e4·500 = 1e7 (values), ≤ 5e9 (squares) ⇒
    retraction error ≤ 1e-16·5e9 = 5e-7 absolute on frame sums ~1e6+ —
    nine orders below the 4dp rounding.

    Scale: one event_type shuffle, one in-partition sort shared by the
    cumulative and lag window passes; partition parallelism is
    |types|-bounded — at 100 TB re-key to (type, day) with a per-day
    warm-up carry.
    """
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = wo.rowsBetween(Window.unboundedPreceding, 0)
    # ts stays in the projection: the lag pass re-uses the same
    # (ts, event_id) window ordering, hence the same exchange + sort
    cum = ev.select(
        "event_id",
        "event_type",
        "value",
        "ts",
        F.row_number().over(wo).alias("rn"),
        F.sum("value").over(w_cum).alias("s1"),
        F.sum(F.col("value") * F.col("value")).over(w_cum).alias("s2"),
    )
    fs1 = F.coalesce(F.lag("s1", 1).over(wo), F.lit(0.0)) - F.coalesce(
        F.lag("s1", 101).over(wo), F.lit(0.0)
    )
    fs2 = F.coalesce(F.lag("s2", 1).over(wo), F.lit(0.0)) - F.coalesce(
        F.lag("s2", 101).over(wo), F.lit(0.0)
    )
    n = F.least(F.col("rn") - 1, F.lit(101 - 1))
    scored = cum.select(
        "event_id",
        "event_type",
        "value",
        n.alias("n_trail"),
        fs1.alias("fs1"),
        fs2.alias("fs2"),
    ).select(
        "event_id",
        "event_type",
        "value",
        "n_trail",
        (F.col("fs1") / F.col("n_trail")).alias("mu"),
        (
            (F.col("fs2") - F.col("fs1") * F.col("fs1") / F.col("n_trail"))
            / (F.col("n_trail") - 1)
        ).alias("var"),
    )
    return (
        scored.filter((F.col("n_trail") >= 30) & (F.col("var") > 0))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(
                (F.col("value") - F.col("mu")) / F.sqrt(F.col("var")), 4
            ).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.5)
        .orderBy("event_id")
    )


ORACLE["q_rolling_zscore"] = """
    WITH c AS (
        SELECT event_id, event_type, value,
               row_number() OVER wo AS rn,
               SUM(value) OVER wc AS s1,
               SUM(value * value) OVER wc AS s2
        FROM events
        WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id),
               wc AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
    ),
    f AS (
        SELECT event_id, event_type, value,
               LEAST(rn - 1, 100) AS n_trail,
               COALESCE(lag(s1, 1) OVER wo, 0.0)
                 - COALESCE(lag(s1, 101) OVER wo, 0.0) AS fs1,
               COALESCE(lag(s2, 1) OVER wo, 0.0)
                 - COALESCE(lag(s2, 101) OVER wo, 0.0) AS fs2
        FROM c
        WINDOW wo AS (PARTITION BY event_type ORDER BY rn)
    ),
    s AS (
        SELECT event_id, event_type, value, n_trail,
               fs1 / n_trail AS mu,
               (fs2 - fs1 * fs1 / n_trail) / (n_trail - 1) AS var
        FROM f
    )
    SELECT event_id, event_type,
           ROUND(value, 6) AS value,
           ROUND((value - mu) / sqrt(var), 4) AS zscore
    FROM s
    WHERE n_trail >= 30 AND var > 0
      AND abs(ROUND((value - mu) / sqrt(var), 4)) > 2.5
    ORDER BY event_id
"""

QUERIES["q_rolling_zscore"] = q_rolling_zscore


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type — open/close via row_number over the
    unique (ts, event_id) order, NOT max_by/arg_min (whose tie behavior is
    engine-defined). One shuffle on (event_type, day); both window passes
    and the final aggregation reuse that single exchange.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    w_asc = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = ev.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return (
        marked.groupBy("event_type", "day")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


ORACLE["q_ohlc_bars"] = """
    WITH m AS (
        SELECT event_type, date_trunc('day', ts) AS day, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, day,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           COUNT(*) AS n_events
    FROM m GROUP BY event_type, day ORDER BY event_type, day
"""

QUERIES["q_ohlc_bars"] = q_ohlc_bars


def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window in batch — Spark's native gap-merge session
    operator (the same expression `streaming.windows.session_window_counts`
    uses with a watermark), complementing q_sessionize's hand-rolled
    lag+cumsum formulation. Session end = last event + gap; an event
    exactly `gap` after its predecessor MERGES (Spark's window-overlap
    test is inclusive at the boundary — pinned by
    tests/test_round4_ops.py::test_session_window_gap_boundary, and the
    oracle replays `delta > gap` at microsecond precision).

    One shuffle on user_id; the gap-merge happens inside the session-window
    aggregation, state bounded per key.

    total_value accumulates on the exact 1e-6 decimal grid (same idiom
    as q_running_total — the r07 sf1.0 sweep caught the fp SUM flipping
    4 half-boundaries at 2dp: partial-merge association differs between
    engines by ulps, and with ~955k sessions some sum always lands on a
    boundary).
    """
    ev = load_table(spark, sf_dir, "events")
    units = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.floor(F.sum(units).cast("double") / 1e4 + F.lit(0.5)) / 1e2
            ).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


ORACLE["q_session_window_batch"] = """
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           FLOOR(CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT))
                 AS DOUBLE) / 1e4 + 0.5) / 1e2 AS total_value
    FROM g GROUP BY user_id, sid ORDER BY user_id, session_start
"""

QUERIES["q_session_window_batch"] = q_session_window_batch


def q_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend: regr_slope/intercept/r2 of event value against
    days-since-2024-01-01 — the linear-regression aggregate family
    completing the corr/covar statistical breadth. The regressor is
    anchored to a fixed epoch (not raw microseconds) so the moment sums
    don't catastrophically cancel.

    One combinable aggregate per group — map-side partials carry the five
    moment sums, so the shuffle is |groups| rows at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = 1704067200000000  # epoch_us('2024-01-01 00:00:00' UTC)
    x = (F.unix_micros(F.col("ts").cast("timestamp_ltz")) - F.lit(anchor)) / (
        86400.0 * 1e6
    )
    return (
        ev.select("event_type", F.col("value").alias("y"), x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("regr_slope(y, x)"), 6).alias("slope_per_day"),
            F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
            F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


ORACLE["q_regression_trend"] = """
    WITH b AS (
        SELECT event_type, value AS y,
               (epoch_us(ts) - 1704067200000000) / (86400.0 * 1e6) AS x
        FROM events
    )
    SELECT event_type, COUNT(*) AS n,
           ROUND(regr_slope(y, x), 6) AS slope_per_day,
           ROUND(regr_intercept(y, x), 4) AS intercept,
           ROUND(regr_r2(y, x), 6) AS r2
    FROM b GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_regression_trend"] = q_regression_trend


def q_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: hourly event counts per type
    over the complete global hour spine, absent hours as explicit zeros —
    the densification step before any windowed time-series model.

    Plan: the hour spine is generated from ONE min/max aggregate row
    (sequence + explode — |hours| rows, no fact-table shuffle), cross-
    joined with the |types|-row dimension, then left-joined to the counts.
    The spine side is broadcast — the fact table is only touched by the
    count aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    return (
        grid.join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select(
            "hour", "event_type", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
        .orderBy("hour", "event_type")
    )


ORACLE["q_resample_hourly"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    grid AS (
        SELECT hour, event_type
        FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
    )
    SELECT g.hour, g.event_type, COALESCE(h.cnt, 0) AS cnt
    FROM grid g LEFT JOIN hourly h USING (hour, event_type)
    ORDER BY hour, event_type
"""

QUERIES["q_resample_hourly"] = q_resample_hourly


def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new vs cumulative distinct users — the growth metric windows
    can't express directly (COUNT DISTINCT isn't a window function in
    either engine). The scalable identity: cumulative distinct at day d =
    Σ users whose FIRST day ≤ d, so one per-user min-day agg + a |days|-row
    running sum replaces any distinct-over-window state.

    The running-sum window is unpartitioned but runs over |days| post-agg
    rows only — bounded at any fact scale.
    """
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily_new = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily_new.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


ORACLE["q_cumulative_distinct"] = """
    WITH fd AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS day
        FROM events GROUP BY user_id
    ),
    dn AS (SELECT day, COUNT(*) AS new_users FROM fd GROUP BY day)
    SELECT day, new_users,
           SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT
               AS cum_users
    FROM dn ORDER BY day
"""

QUERIES["q_cumulative_distinct"] = q_cumulative_distinct


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outliers (Iglewicz–Hoaglin modified z-score):
    flag events with 0.6745·|x − median| / MAD > 3.5 within their type —
    the robust-statistics complement to q_winsorized_stats (median/MAD
    have a 50% breakdown point; mean/sd break at one extreme point).

    Two exact-percentile aggregates (median of values, then median of
    absolute deviations), both combinable and broadcast back — the fact
    table never shuffles. The threshold applies to the QUANTIZED score so
    borderline membership can't diverge between engines. Zero-MAD groups
    (>50% identical values) are excluded explicitly.

    Quantization note (found by the r06 sf0.1 sweep): the raw scores are
    bit-identical across engines, but engine ROUND disagrees within an
    ulp of a half boundary — Spark rounds the double's exact decimal
    expansion while DuckDB multiplies first (3.8522499999999997 → 3.8522
    vs 3.8523). The score is therefore quantized as explicit IEEE
    arithmetic, ``floor(x·10⁴ + 0.5)/10⁴``, written identically in both
    engines — identical inputs through identical IEEE ops cannot split.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            (
                F.floor(
                    F.lit(0.6745)
                    * (F.col("value") - F.col("med"))
                    / F.col("mad")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("mod_zscore"),
        )
        .filter(F.abs(F.col("mod_zscore")) > 3.5)
        .orderBy("event_id")
    )


ORACLE["q_anomaly_mad"] = """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
        WHERE e.value IS NOT NULL
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT event_id, d.event_type,
           ROUND(value, 6) AS value,
           FLOOR(0.6745 * (value - med) / mad * 10000 + 0.5) / 10000
               AS mod_zscore
    FROM dev d JOIN mad USING (event_type)
    WHERE mad > 0
      AND abs(FLOOR(0.6745 * (value - med) / mad * 10000 + 0.5) / 10000) > 3.5
    ORDER BY event_id
"""

QUERIES["q_anomaly_mad"] = q_anomaly_mad


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series feature engineering: per event type's daily totals,
    emit lag-1, lag-7, day-over-day delta, and 7-day trailing mean — the
    standard supervised-learning feature block a forecasting pipeline
    materializes. Windowed over the |types|×|days| daily aggregate (tiny
    at any fact scale), so the heavy table is touched only by one
    combinable agg.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("total"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        "day",
        "total",
        F.lag("total", 1).over(w).alias("lag_1"),
        F.lag("total", 7).over(w).alias("lag_7"),
        F.round(F.col("total") - F.lag("total", 1).over(w), 4).alias("delta_1"),
        F.round(F.avg("total").over(w7), 4).alias("ma_7"),
    ).orderBy("event_type", "day")


ORACLE["q_lag_features"] = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               ROUND(SUM(value), 4) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total,
           lag(total, 1) OVER w AS lag_1,
           lag(total, 7) OVER w AS lag_7,
           ROUND(total - lag(total, 1) OVER w, 4) AS delta_1,
           ROUND(AVG(total) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS ma_7
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
"""

QUERIES["q_lag_features"] = q_lag_features


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase latency distribution — the funnel companion
    answering "how fast do converters convert": per signup cohort day,
    count of converters and p25/p50/p90 of the conversion delay in hours.

    Delay = first purchase AT-OR-AFTER the user's first signup (µs-exact;
    the LTZ cast makes unix_micros accept the NTZ storage and offsets
    cancel in the difference under the fixed-offset UTC session). One
    user_id shuffle for the two min-aggs + join; percentile over the
    per-user one-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", us.alias("s_us"), F.col("ts"))
        .groupBy("user_id")
        .agg(F.min("s_us").alias("s_us"), F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us"))
    )
    delay = (
        s.join(p, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_us").alias("first_p_us"), F.min("s_us").alias("su"))
        .select(
            F.date_trunc("day", "signup_ts").alias("cohort_day"),
            ((F.col("first_p_us") - F.col("su")) / 3.6e9).alias("delay_h"),
        )
    )
    return (
        delay.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_converters"),
            F.round(F.expr("percentile(delay_h, 0.25)"), 4).alias("p25_h"),
            F.round(F.expr("percentile(delay_h, 0.5)"), 4).alias("p50_h"),
            F.round(F.expr("percentile(delay_h, 0.9)"), 4).alias("p90_h"),
        )
        .orderBy("cohort_day")
    )


ORACLE["q_conversion_latency"] = """
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS s_us, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, epoch_us(ts) AS p_us FROM events
        WHERE event_type = 'purchase'
    ),
    d AS (
        SELECT s.user_id, MIN(s.signup_ts) AS signup_ts,
               MIN(p.p_us) AS first_p_us, MIN(s.s_us) AS su
        FROM s JOIN p ON s.user_id = p.user_id AND p.p_us >= s.s_us
        GROUP BY s.user_id
    ),
    delay AS (
        SELECT date_trunc('day', signup_ts) AS cohort_day,
               (first_p_us - su) / 3.6e9 AS delay_h
        FROM d
    )
    SELECT cohort_day,
           COUNT(*) AS n_converters,
           ROUND(quantile_cont(delay_h, 0.25), 4) AS p25_h,
           ROUND(quantile_cont(delay_h, 0.5), 4) AS p50_h,
           ROUND(quantile_cont(delay_h, 0.9), 4) AS p90_h
    FROM delay GROUP BY cohort_day ORDER BY cohort_day
"""

QUERIES["q_conversion_latency"] = q_conversion_latency


def q_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts maximizing total quantity while MINIMIZING
    net revenue — the high-volume / weakest-monetization tradeoff set
    (skyline operator, Börzsönyi et al. 2001) that no single ORDER BY can
    answer. Minimization enters skyline2d (a both-maximize operator) as
    the negated column; anti-correlated dims also make the frontier
    non-trivially sized (the correlated qty/revenue pair collapses to 2
    points — the vacuous-evidence trap VERDICT r03 flagged).

    Executes layout.skyline2d: sort-sweep semantics on the partition-offset
    plan — per-x dedupe, one range exchange, partitioned running max, and a
    |partitions|-row prefix — versus the oracle's O(n²) NOT EXISTS
    dominance test, which is the spec, not the plan."""
    from ..operators import layout

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("tot_qty"),
        (-F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)).alias(
            "neg_revenue"
        ),
    )
    return (
        layout.skyline2d(per_part, "tot_qty", "neg_revenue")
        .select("tot_qty", (-F.col("neg_revenue")).alias("revenue"))
        .orderBy(F.desc("tot_qty"))
    )


ORACLE["q_skyline_frontier"] = """
    WITH per AS (
        SELECT l_partkey,
               ROUND(SUM(l_quantity), 2) AS tot_qty,
               -ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS neg_revenue
        FROM lineitem GROUP BY l_partkey
    ),
    pts AS (SELECT tot_qty, MAX(neg_revenue) AS neg_revenue FROM per GROUP BY tot_qty)
    SELECT tot_qty, -neg_revenue AS revenue FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.tot_qty > p.tot_qty AND q.neg_revenue >= p.neg_revenue
    )
    ORDER BY tot_qty DESC
"""

QUERIES["q_skyline_frontier"] = q_skyline_frontier


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 5-fold assignment: within each language
    stratum, folds go round-robin by doc_id rank, so every (lang, fold)
    cell is balanced to ±1 doc — the split discipline for held-out eval
    on heterogeneous corpora (language imbalance can't leak into folds).

    Scale: one partitioned window per stratum (parallel across langs);
    nothing global. Skewed strata parallelize further by sub-bucketing the
    window key if one language dominates the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.pmod(F.row_number().over(w) - 1, F.lit(5)).cast("int").alias("fold"),
        )
        .orderBy("doc_id")
    )


ORACLE["q_stratified_kfold"] = """
    SELECT doc_id, lang,
           CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 5 AS INT) AS fold
    FROM documents ORDER BY doc_id
"""

QUERIES["q_stratified_kfold"] = q_stratified_kfold


def q_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly mean value per event type with LINEAR INTERPOLATION
    across missing hours (nearest-value extrapolation at the edges) — the
    step after densification (q_resample_hourly) that windowed models and
    downsampled dashboards actually consume; ~6% of grid cells are empty at
    this event rate, so the interpolation path is genuinely exercised.

    Plan: grid = broadcast spine×types (no fact shuffle); the neighbor
    search is two ignore-nulls windows per type over the GRID (|hours|·
    |types| rows, not the fact table), using the spine's positional index
    so no timestamp arithmetic (and no NTZ pitfalls) enters the math.
    Frame discipline (r11): the NEXT-neighbor lookup is a prefix frame
    over a DESCENDING sort, not ``rowsBetween(1, unboundedFollowing)`` —
    Spark's UnboundedFollowingWindowFunctionFrame re-aggregates from the
    current row to the partition end for EVERY row (O(n²) per
    partition; harmless at an hourly spine, catastrophic at a
    second-level one). Both passes share the one hash exchange on
    event_type; the desc pass only adds a re-sort."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.posexplode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "idx", "hour"
        )
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    j = grid.join(F.broadcast(hourly), ["hour", "event_type"], "left")
    w_prec = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # strict-successor prefix frame on the DESC sort: the rows already
    # seen are exactly idx' > idx, and last() is the nearest of them
    w_foll = (
        Window.partitionBy("event_type")
        .orderBy(F.col("idx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    present_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    prev_v = F.last("v", ignorenulls=True).over(w_prec)
    prev_i = F.last(present_idx, ignorenulls=True).over(w_prec)
    next_v = F.last("v", ignorenulls=True).over(w_foll)
    next_i = F.last(present_idx, ignorenulls=True).over(w_foll)
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.round(
                prev_v
                + (next_v - prev_v)
                * (F.col("idx") - prev_i)
                / (next_i - prev_i),
                6,
            ),
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return (
        j.select(
            "hour",
            "event_type",
            filled.alias("value"),
            F.col("v").isNull().alias("was_gap"),
        )
        .orderBy("hour", "event_type")
    )


ORACLE["q_interpolate_gaps"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               ROUND(AVG(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    grid AS (
        SELECT s.hour,
               date_diff('hour', b.h0, s.hour) AS idx,
               t.event_type
        FROM spine s
        CROSS JOIN bounds b
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ),
    j AS (
        SELECT g.hour, g.idx, g.event_type, h.v FROM grid g
        LEFT JOIN hourly h USING (hour, event_type)
    ),
    nb AS (
        SELECT hour, idx, event_type, v,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_i,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY idx
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY idx
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_i
        FROM j
    )
    SELECT hour, event_type,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    ROUND(prev_v + (next_v - prev_v) * (idx - prev_i)
                          / (next_i - prev_i), 6)
                ELSE COALESCE(prev_v, next_v) END AS value,
           (v IS NULL) AS was_gap
    FROM nb ORDER BY hour, event_type
"""

QUERIES["q_interpolate_gaps"] = q_interpolate_gaps
