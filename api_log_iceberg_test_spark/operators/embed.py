"""Embedding generation: the documents → vectors stage of a training-data
pipeline, as Arrow-batched ``mapInPandas`` plumbing.

A real deployment swaps ``_encode_batch`` for a model call (sentence
encoder on GPU executors); everything around it — Arrow batch transfer,
schema contract, partition-level batching, determinism under retry — is
the production shape and is what's tested. The stub encoder is
deterministic (md5-derived, like :mod:`.multimodal`'s decode stub) so the
DuckDB oracle replays it EXACTLY, giving the plumbing a hash-level
differential test instead of a smoke test.

Scale: one Python worker round-trip per Arrow batch (not per row); the
projection is narrow (doc_id + text in, doc_id + dims out) and shuffles
nothing. Batch size follows spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: stub dimensionality: 8 dims fit in one md5 (16 bytes -> 8 byte-pairs
#: unused; we use the first 8 bytes, one per dim)
DIM = 8


def _encode_text(text: str) -> list[float]:
    """Deterministic fake encoder: dim d = byte d of md5(text), scaled to
    [-1, 1]. Replace with a model forward pass in production. Raw doubles —
    rounding happens in the Spark projection so both engines round with
    the same SQL ROUND semantics."""
    h = hashlib.md5(text.encode("utf-8")).hexdigest()
    return [int(h[2 * d : 2 * d + 2], 16) / 255.0 * 2.0 - 1.0 for d in range(DIM)]


def embed_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, d0..d7) — one row per document, one column per dimension.

    Wide scalar columns (not an array) so every value is individually
    hash-comparable by the differential oracle.
    """
    out_schema = f"{id_col} long, " + ", ".join(f"d{d} double" for d in range(DIM))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col]
            if not texts.isna().any():
                # r15 fast path: no NULLs in the batch (the common case) —
                # one md5 per row concatenated into a single buffer, then
                # ONE vectorized slice+affine over the whole batch instead
                # of 8 Python float ops per row (guide §4.2: per-row Python
                # work inside the boundary → one numpy expression).
                # Values are bit-identical: same md5 bytes, and the
                # elementwise /255*2-1 is the same IEEE double op sequence
                # the scalar loop performed.
                buf = b"".join(
                    hashlib.md5(t.encode("utf-8")).digest() for t in texts
                )
                mat = (
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(-1, 16)[:, :DIM]
                    .astype(np.float64)
                    / 255.0
                    * 2.0
                    - 1.0
                )
                out = {id_col: pdf[id_col].to_numpy()}
                for d in range(DIM):
                    out[f"d{d}"] = mat[:, d]
                yield pd.DataFrame(out)
                continue
            # NULL text → NULL embedding row (matches the oracle's
            # md5(NULL) = NULL), not an executor crash. Nullable Float64
            # extension arrays carry the None through Arrow as true nulls
            # (a NaN in a float64 column would NOT be null).
            vecs = [None if t is None else _encode_text(t) for t in pdf[text_col]]
            out = {id_col: pdf[id_col].to_numpy()}
            for d in range(DIM):
                out[f"d{d}"] = pd.array(
                    [None if v is None else v[d] for v in vecs], dtype="Float64"
                )
            yield pd.DataFrame(out)

    from pyspark.sql import functions as F

    raw = df.select(id_col, text_col).mapInPandas(encode, out_schema)
    return raw.select(
        id_col, *[F.round(f"d{d}", 6).alias(f"d{d}") for d in range(DIM)]
    )
