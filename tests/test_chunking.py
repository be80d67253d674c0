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
