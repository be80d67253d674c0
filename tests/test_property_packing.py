"""Property-based armor for the packing family (round 6).

``pack_batches`` claims exact concat-and-chunk semantics: per hash
bucket, documents laid end-to-end in id order, the token stream cut into
exact ``budget``-token bins, each document contributing a segment to
every bin it overlaps. These tests replay random corpora — token counts
biased toward bin boundaries (0, 1, budget-1, budget, budget+1,
2·budget) — through an independent Python accumulator and require the
DataFrame plan to agree cell-for-cell, including the full/partial doc
split and the conservation invariants.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from api_log_iceberg_test_spark.operators import chunking

_BUDGET = 16
_BUCKETS = 3

# token counts hugging the bin edges, plus blanks (must vanish entirely)
_counts = st.one_of(
    st.integers(0, 2 * _BUDGET + 2),
    st.sampled_from([0, 1, _BUDGET - 1, _BUDGET, _BUDGET + 1, 2 * _BUDGET]),
)
_corpora = st.lists(_counts, min_size=1, max_size=24)

_counter = itertools.count()


def _ref_pack(counts: list[int]) -> dict[tuple[int, int], dict]:
    """Sequential accumulator: the obviously-correct O(n·bins) packing."""
    out: dict[tuple[int, int], dict] = {}
    offset: dict[int, int] = {}
    for doc_id, n in enumerate(counts):
        if n == 0:
            continue
        bucket = doc_id % _BUCKETS
        start = offset.get(bucket, 0)
        end = start + n
        offset[bucket] = end
        for bin_id in range(start // _BUDGET, (end - 1) // _BUDGET + 1):
            lo, hi = bin_id * _BUDGET, (bin_id + 1) * _BUDGET
            cell = out.setdefault(
                (bucket, bin_id),
                {"n_docs": 0, "n_tokens_bin": 0, "n_full_docs": 0,
                 "n_partial_docs": 0, "first_doc": doc_id, "last_doc": doc_id},
            )
            cell["n_docs"] += 1
            cell["n_tokens_bin"] += min(end, hi) - max(start, lo)
            if start >= lo and end <= hi:
                cell["n_full_docs"] += 1
            else:
                cell["n_partial_docs"] += 1
            cell["first_doc"] = min(cell["first_doc"], doc_id)
            cell["last_doc"] = max(cell["last_doc"], doc_id)
    return out


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpora)
def test_pack_batches_matches_sequential_reference(spark, counts):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(counts)],
        "doc_id long, text string",
    )
    got = {
        (r["bucket"], r["bin_id"]): {
            "n_docs": r["n_docs"],
            "n_tokens_bin": r["n_tokens_bin"],
            "n_full_docs": r["n_full_docs"],
            "n_partial_docs": r["n_partial_docs"],
            "first_doc": r["first_doc"],
            "last_doc": r["last_doc"],
        }
        for r in chunking.pack_batches(
            docs, budget=_BUDGET, num_buckets=_BUCKETS
        ).collect()
    }
    assert got == _ref_pack(counts)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpora)
def test_pack_batches_conservation(spark, counts):
    """Tokens are conserved per bucket, every non-tail bin is exactly full,
    and bin ids are contiguous from 0 — independent of the reference."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(counts)],
        "doc_id long, text string",
    )
    rows = chunking.pack_batches(docs, budget=_BUDGET, num_buckets=_BUCKETS).collect()
    per_bucket: dict[int, list] = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], []).append(r)
    want_totals: dict[int, int] = {}
    for doc_id, n in enumerate(counts):
        want_totals[doc_id % _BUCKETS] = want_totals.get(doc_id % _BUCKETS, 0) + n
    for bucket, bins in per_bucket.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert [r["bin_id"] for r in bins] == list(range(len(bins)))
        assert all(r["n_tokens_bin"] == _BUDGET for r in bins[:-1])
        assert 0 < bins[-1]["n_tokens_bin"] <= _BUDGET
        assert sum(r["n_tokens_bin"] for r in bins) == want_totals[bucket]
    empty_buckets = {
        b for b, tot in want_totals.items() if tot == 0
    }
    assert empty_buckets.isdisjoint(per_bucket)
