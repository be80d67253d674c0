"""Z-order layout: Morton-code correctness and clustering properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import layout


def _morton2(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_value_matches_reference_bits(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 65535] for b in [0, 2, 7, 100, 65535]]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", layout.zorder_value(["a", "b"])).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton2(a, b), (a, b)


def test_zorder_three_dims_and_bounds(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["x", "y", "z"])
    (val,) = df.select(layout.zorder_value(["x", "y", "z"], bits=4).alias("v")).first()
    ref = 0
    for i in range(4):
        ref |= ((1 >> i) & 1) << (3 * i)
        ref |= ((2 >> i) & 1) << (3 * i + 1)
        ref |= ((3 >> i) & 1) << (3 * i + 2)
    assert val == ref
    with pytest.raises(ValueError):
        layout.zorder_value(["x"])
    with pytest.raises(ValueError):
        layout.zorder_value(["x", "y"], bits=32)


def test_cluster_by_zorder_sorts_partitions(spark):
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") * 7 % 64).alias("b")
    )
    out = layout.cluster_by_zorder(df, ["a", "b"], bits=6, num_partitions=4)
    # rows within each partition must be Morton-sorted, partitions disjoint
    import pandas as pd

    def check(it):
        def morton(a, b, bits=6):  # local: workers can't import test modules
            out = 0
            for i in range(bits):
                out |= ((int(a) >> i) & 1) << (2 * i)
                out |= ((int(b) >> i) & 1) << (2 * i + 1)
            return out

        for pdf in it:
            if len(pdf):
                z = [morton(a, b) for a, b in zip(pdf["a"], pdf["b"])]
                yield pd.DataFrame(
                    {
                        "lo": [z[0]],
                        "hi": [z[-1]],
                        "sorted": [all(x <= y for x, y in zip(z, z[1:]))],
                    }
                )

    parts = out.mapInPandas(check, "lo long, hi long, sorted boolean").collect()
    assert all(p["sorted"] for p in parts)
    spans = sorted((p["lo"], p["hi"]) for p in parts)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2  # range partitions don't overlap


def test_zorder_bucket_bounds_both_dims(spark, sf_dir):
    from api_log_iceberg_test_spark.operators.registry import q_zorder_stats

    rows = q_zorder_stats(spark, sf_dir).collect()
    assert rows, "expected non-empty bucket stats"
    for r in rows:
        # top-8-of-16 z-prefix leaves 4 low bits per dim: span <= 15
        assert r["pk_max"] - r["pk_min"] <= 15
        assert r["sk_max"] - r["sk_min"] <= 15


# --- dense ids --------------------------------------------------------------


def test_dense_ids_contiguous_in_sort_order(spark):
    """Shuffled multi-partition input gets exactly rank-order ids 0..n-1."""
    import random

    vals = list(range(0, 400, 3))
    rng = random.Random(7)
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(7)
    got = {r["k"]: r["dense_id"] for r in layout.dense_ids(df, "k").collect()}
    for rank, v in enumerate(sorted(vals)):
        assert got[v] == rank, (v, got[v], rank)


def test_dense_ids_duplicate_keys_stay_dense(spark):
    """With ties the per-key order is unspecified but ids must still be a
    permutation of 0..n-1 and respect key order between groups."""
    rows = [(k,) for k in [5, 1, 5, 3, 1, 1, 9]]
    df = spark.createDataFrame(rows, ["k"]).repartition(3)
    out = layout.dense_ids(df, "k").collect()
    ids = sorted(r["dense_id"] for r in out)
    assert ids == list(range(len(rows)))
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r["dense_id"])
    # ids of a smaller key all precede ids of a larger key
    assert max(by_key[1]) < min(by_key[3])
    assert max(by_key[3]) < min(by_key[5])
    assert max(by_key[5]) < by_key[9][0]


def test_dense_ids_plan_has_no_corpus_global_window(spark):
    """The only SinglePartition window may sit over the per-partition count
    aggregate (|partitions| rows) — the corpus-side window must be
    partitioned by the physical partition id, and the offsets join must
    broadcast."""
    df = spark.range(1000).withColumnRenamed("id", "k").repartition(8)
    plan = layout.dense_ids(df, "k")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "hashpartitioning(__dense_pid" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# --- 2-D skyline ------------------------------------------------------------


def _sky_ref(points):
    """Brute-force Pareto frontier (maximize both), after per-x max-y dedupe."""
    best = {}
    for x, y in points:
        if x not in best or y > best[x]:
            best[x] = y
    pts = list(best.items())
    return sorted(
        (x, y)
        for x, y in pts
        if not any(qx > x and qy >= y for qx, qy in pts)
    )


def test_skyline_matches_bruteforce_random(spark):
    import random

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(300)]
        df = spark.createDataFrame(pts, ["x", "y"]).repartition(6)
        got = sorted((r["x"], r["y"]) for r in layout.skyline2d(df).collect())
        assert got == _sky_ref(pts), f"seed {seed}"


def test_skyline_edge_shapes(spark):
    # all points on a rising diagonal: only the top corner survives
    df = spark.createDataFrame([(i, i) for i in range(10)], ["x", "y"])
    assert [(r["x"], r["y"]) for r in layout.skyline2d(df).collect()] == [(9, 9)]
    # falling diagonal: every point is on the frontier
    df = spark.createDataFrame([(i, 9 - i) for i in range(10)], ["x", "y"])
    assert sorted((r["x"], r["y"]) for r in layout.skyline2d(df).collect()) == [
        (i, 9 - i) for i in range(10)
    ]
    # duplicate x keeps only the max y
    df = spark.createDataFrame([(1, 5), (1, 9), (0, 100)], ["x", "y"])
    assert sorted((r["x"], r["y"]) for r in layout.skyline2d(df).collect()) == [
        (0, 100),
        (1, 9),
    ]


def test_exclusive_prefix_max_matches_global_window(spark):
    """r12: the partition-offset running max must equal the semantic spec
    MAX() OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING) — NULL first row, plateaus through out-of-order values —
    on shuffled input across many partitions."""
    import random

    from pyspark.sql import functions as F

    for seed in (5, 23):
        rng = random.Random(seed)
        rows = [(k, rng.randint(-50, 50)) for k in rng.sample(range(1000), 300)]
        df = spark.createDataFrame(rows, ["k", "v"]).repartition(7)
        got = {
            r["k"]: r["pm"]
            for r in layout.exclusive_prefix_max(df, "k", "v", "pm").collect()
        }
        best, want = None, {}
        for k, v in sorted(rows):
            want[k] = best
            best = v if best is None else max(best, v)
        assert got == want, f"seed {seed}"


def test_range_bucket_ids_deterministic_ordered_and_tie_safe(spark):
    """r13 (VERDICT r12 #3): the family's bucketing comes from LITERAL cut
    points, so bucket ids must be (a) monotone non-decreasing in the key,
    (b) identical for equal keys (ties never split across buckets, unlike
    repartitionByRange), and (c) identical across re-evaluations without
    any cache in the plan."""
    import random

    rng = random.Random(7)
    rows = [(k,) for k in rng.choices(range(200), k=500)]
    df = spark.createDataFrame(rows, ["k"])
    out = layout.range_bucket_ids(df, "k", bucket_col="b")
    got = [(r["k"], r["b"]) for r in out.collect()]
    by_key = {}
    for k, b in got:
        by_key.setdefault(k, set()).add(b)
    split = {k: bs for k, bs in by_key.items() if len(bs) > 1}
    assert not split, f"equal keys split across buckets: {split}"
    ordered = sorted((k, next(iter(bs))) for k, bs in by_key.items())
    buckets = [b for _, b in ordered]
    assert buckets == sorted(buckets), "bucket ids not monotone in key"
    # re-evaluation agrees (no cache to pin — ids are pure expressions)
    assert sorted(got) == sorted((r["k"], r["b"]) for r in out.collect())


def test_layout_family_plans_are_cache_free(spark):
    """The partition-offset family must NOT cache the arranged corpus
    (VERDICT r12 watch item 2 / ADVICE r12: MEMORY_AND_DISK pinning of a
    100 TB frame, never unpersisted). Literal-boundary bucketing makes
    re-evaluation safe, so any InMemoryTableScan reappearing in these
    plans is a regression."""
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], ["k", "v"])
    plans = {
        "dense_ids": layout.dense_ids(df, "k"),
        "prefix_sum": layout.exclusive_prefix_sum(df, "k", "v"),
        "prefix_max": layout.exclusive_prefix_max(df, "k", "v"),
        "skyline": layout.skyline2d(df, "k", "v"),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "InMemoryTableScan" not in plan, f"{name} caches: {plan}"


def test_dense_ids_output_invariant_under_stale_boundaries(spark):
    """Precomputed (even badly unbalanced) boundaries only affect task
    BALANCE, never output: ids are ranks and ranks don't depend on the
    cut points. This is the reuse contract for repeated 100 TB jobs —
    compute range_boundaries once, pass it daily."""
    rows = [(k,) for k in range(0, 400, 2)]
    df = spark.createDataFrame(rows, ["k"])
    want = {r["k"]: r["dense_id"] for r in layout.dense_ids(df, "k").collect()}
    for cuts in ([], [3], [100, 200, 300], [1, 2, 3, 4, 5], [399]):
        got = {
            r["k"]: r["dense_id"]
            for r in layout.dense_ids(df, "k", boundaries=cuts).collect()
        }
        assert got == want, f"boundaries {cuts} changed the output"


def test_exclusive_prefix_max_struct_key_literals(spark):
    """Struct order keys (q_watermark_accounting's (arr_us, eid) arrival
    key) must survive the literal-boundary path: _key_literal builds a
    field-name-carrying struct literal and the when-cascade compares it
    against the struct column (lexicographic Spark struct ordering)."""
    from pyspark.sql import functions as F

    rows = [(i, (i * 37) % 101, float(i % 13)) for i in range(101)]
    df = spark.createDataFrame(rows, ["a", "b", "v"]).select(
        F.struct(F.col("b").alias("hi"), F.col("a").alias("lo")).alias("key"),
        "a",
        "b",
        "v",
    )
    out = layout.exclusive_prefix_max(df, "key", "v", "pm")
    got = {(r["b"], r["a"]): r["pm"] for r in out.collect()}
    best, want = None, {}
    for b, a, v in sorted((b, a, v) for a, b, v in rows):
        want[(b, a)] = best
        best = v if best is None else max(best, v)
    assert got == want


def test_skyline_output_invariant_under_stale_boundaries(spark):
    """skyline2d's boundaries= reuse contract (VERDICT r13 #4): stale or
    badly unbalanced cut points only affect task balance — the frontier
    is a pure function of the points."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(0, 500), float(rng.randrange(0, 500))) for _ in range(300)]
    df = spark.createDataFrame(rows, ["x", "y"])
    want = {(r["x"], r["y"]) for r in layout.skyline2d(df, "x", "y").collect()}
    assert want  # non-degenerate frontier
    for cuts in ([], [3], [100, 250, 400], [1, 2, 3, 4, 5], [499]):
        got = {
            (r["x"], r["y"])
            for r in layout.skyline2d(df, "x", "y", boundaries=cuts).collect()
        }
        assert got == want, f"boundaries {cuts} changed the frontier"


def test_bucket_ordinal_tree_matches_linear_count(spark):
    """The balanced when-tree computes exactly the satisfied-cut count the
    r13 linear cascade computed, for every key position (below, equal,
    between, above, NULL) and every cut-list size including 0/1/pow2±1."""
    from pyspark.sql import functions as F

    for m in (0, 1, 2, 3, 4, 7, 8, 9, 31):
        cuts = [10 * (i + 1) for i in range(m)]  # 10, 20, ... 10m
        keys = [None] + list(range(0, 10 * m + 15, 5))
        df = spark.createDataFrame([(k,) for k in keys], "k int")
        out = df.select(
            "k",
            layout._bucket_ordinal(
                F.col("k"), cuts, df.schema["k"].dataType
            ).alias("b"),
        ).collect()
        for r in out:
            want = 0 if r["k"] is None else sum(1 for c in cuts if r["k"] >= c)
            assert r["b"] == want, (m, r["k"], r["b"], want)
