"""Chunking / sequence-packing semantics and closure properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import chunking, text
from api_log_iceberg_test_spark.schema import load_table


def test_chunk_reassembly_closure(spark, sf_dir):
    """Joining a doc's chunk texts back with spaces reproduces the
    normalized text, and chunk token counts sum to the doc token count."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.chunk_documents(docs, max_tokens=32)
    # collect_list after orderBy does NOT survive the groupBy shuffle —
    # collect structs and sort by chunk_idx inside the row instead
    re = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias("rejoined"),
            F.sum("n_chunk_tokens").alias("n_total"),
        )
    )
    orig = docs.select(
        "doc_id",
        text.norm_text("text").alias("norm"),
        text.token_count("text").alias("n_tokens"),
    )
    bad = (
        re.join(orig, "doc_id")
        .where((F.col("rejoined") != F.col("norm")) | (F.col("n_total") != F.col("n_tokens")))
        .count()
    )
    assert bad == 0


def test_chunk_sizes(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(70))), (2, "a b"), (3, "solo"),
         (4, ""), (5, "   ")],
        ["doc_id", "text"],
    )
    out = chunking.chunk_documents(df, max_tokens=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # blank / whitespace-only docs yield ZERO chunks (no phantom empty chunk)
    assert 4 not in by_doc and 5 not in by_doc
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [32, 32, 6]
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [2]
    assert [r["n_chunk_tokens"] for r in by_doc[3]] == [1]


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = chunking.pack_sequences(docs, budget=512, num_buckets=8)
    rows = packed.orderBy("bucket", "doc_id").collect()
    seen = {}
    for r in rows:
        # bin is determined by the start offset
        assert r["bin_id"] == (r["cum_tokens"] - r["n_tokens"]) // 512
        prev = seen.get(r["bucket"])
        if prev is not None:
            # cumulative sum and bin ids are monotone within a bucket
            assert r["cum_tokens"] == prev["cum_tokens"] + r["n_tokens"]
            assert r["bin_id"] >= prev["bin_id"]
        else:
            assert r["cum_tokens"] == r["n_tokens"]
            assert r["bin_id"] == 0
        seen[r["bucket"]] = r


def test_pack_window_is_partitioned(spark, sf_dir):
    """The packing window must never collapse to a single partition (the
    100 TB failure mode) — it is partitioned by bucket."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        chunking.pack_sequences(docs, budget=512, num_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(bucket" in plan


def test_chunking_plan_has_no_exchange(spark, sf_dir):
    """Chunking is a per-row fan-out: the physical plan must contain NO
    Exchange — chunks inherit the scan's partitioning at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        chunking.chunk_documents(docs, max_tokens=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_pack_batches_exact_budget_invariant(spark, sf_dir):
    """Round 6: every (bucket, bin) except each bucket's tail bin holds
    EXACTLY `budget` tokens; per-bucket token totals are conserved; doc
    counts decompose into full + partial."""
    docs = load_table(spark, sf_dir, "documents")
    budget = 512
    rows = chunking.pack_batches(docs, budget=budget, num_buckets=8).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    totals = {
        r["bucket"]: r["tot"]
        for r in docs.select(
            (F.col("doc_id") % 8).alias("bucket"),
            text.token_count("text").cast("long").alias("n"),
        )
        .groupBy("bucket")
        .agg(F.sum("n").alias("tot"))
        .collect()
    }
    for bucket, bins in by_bucket.items():
        bins.sort(key=lambda r: r["bin_id"])
        # contiguous bin ids from 0
        assert [r["bin_id"] for r in bins] == list(range(len(bins)))
        for r in bins[:-1]:
            assert r["n_tokens_bin"] == budget, r
        assert 0 < bins[-1]["n_tokens_bin"] <= budget
        assert sum(r["n_tokens_bin"] for r in bins) == totals[bucket]
        for r in bins:
            assert r["n_docs"] == r["n_full_docs"] + r["n_partial_docs"]
            assert r["first_doc"] <= r["last_doc"]


def test_pack_batches_consistent_with_pack_sequences(spark, sf_dir):
    """A document's pack_sequences bin (the bin its START offset falls in)
    must appear as one of the bins pack_batches spreads it over, and a
    fully-contained doc must be counted full in exactly that bin."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = {
        (r["bucket"], r["doc_id"]): r["bin_id"]
        for r in chunking.pack_sequences(docs, budget=512, num_buckets=8).collect()
        if r["n_tokens"] > 0
    }
    v2 = chunking.pack_batches(docs, budget=512, num_buckets=8).collect()
    spans = {}
    for r in v2:
        spans.setdefault(r["bucket"], {})[r["bin_id"]] = (
            r["first_doc"],
            r["last_doc"],
        )
    for (bucket, doc_id), bin_id in v1.items():
        lo, hi = spans[bucket][bin_id]
        assert lo <= doc_id <= hi, (bucket, doc_id, bin_id)
