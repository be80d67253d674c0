"""Interleaved A/B: embed fast-path inner loop vs np.frombuffer vectorization.

Both arms run the FULL q_chunk_embed_pool shape (chunk -> mapInPandas encode
-> byte pooling) inside one session, alternating old,new,old,new... so host
stripes hit both arms equally. Also verifies the two encoders produce
bit-identical frames once per run.

Usage: python tools/ab_embed_vec.py <sf_dir> <rounds>
"""

from __future__ import annotations

import hashlib
import os
import statistics
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from api_log_iceberg_test_spark.operators import chunking, embed  # noqa: E402
from api_log_iceberg_test_spark.schema import fan_out, load_table  # noqa: E402
from api_log_iceberg_test_spark.session import build_session  # noqa: E402

DIM = embed.DIM


def encode_old(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """r15-committed fast path: per-row md5 + per-dim Python inner loop."""
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        texts = pdf["chunk_text"]
        mat = np.empty((len(texts), DIM), dtype=np.float64)
        for i, t in enumerate(texts):
            h = hashlib.md5(t.encode("utf-8")).digest()
            for d in range(DIM):
                mat[i, d] = h[d] / 255.0 * 2.0 - 1.0
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        for d in range(DIM):
            out[f"d{d}"] = mat[:, d]
        yield pd.DataFrame(out)


def encode_new(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized affine map: one md5 per row (unavoidable), then
    frombuffer -> float64 matrix ops (identical IEEE op order: /255*2-1)."""
    import numpy as np

    md5 = hashlib.md5
    for pdf in batches:
        if not len(pdf):
            continue
        texts = pdf["chunk_text"]
        buf = b"".join(md5(t.encode("utf-8")).digest()[:DIM] for t in texts)
        mat = (
            np.frombuffer(buf, dtype=np.uint8)
            .reshape(-1, DIM)
            .astype(np.float64)
        )
        mat = mat / 255.0 * 2.0 - 1.0
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        for d in range(DIM):
            out[f"d{d}"] = mat[:, d]
        yield pd.DataFrame(out)


def pipeline(spark, sf_dir, fn):
    out_schema = "doc_id long, " + ", ".join(f"d{d} double" for d in range(DIM))
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    chunks = chunking.chunk_documents(docs, max_tokens=32)
    raw = chunks.select("doc_id", "chunk_text").mapInPandas(fn, out_schema)
    emb = raw.select(
        "doc_id", *[F.round(f"d{d}", 6).alias(f"d{d}") for d in range(DIM)]
    )
    as_bytes = emb.select(
        "doc_id",
        *[
            F.round((F.col(f"d{d}") + 1) * 127.5).cast("long").alias(f"b{d}")
            for d in range(DIM)
        ],
    )
    return (
        as_bytes.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            *[
                F.round(F.avg(f"b{d}")).cast("long").alias(f"d{d}")
                for d in range(DIM)
            ],
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    spark = build_session(app_name="ab-embed-vec")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(256_000_000).selectExpr("sum(id * 3 + 1)").collect()
    print(f"probe_start {time.time() - t0:.3f}", flush=True)

    # parity check: bit-identical output frames
    a = pipeline(spark, sf_dir, encode_old).collect()
    b = pipeline(spark, sf_dir, encode_new).collect()
    assert a == b, "encoder outputs differ"
    print(f"parity OK over {len(a)} pooled docs", flush=True)

    old_t, new_t = [], []
    for _ in range(rounds):
        for arm, fn, acc in (("old", encode_old, old_t), ("new", encode_new, new_t)):
            t0 = time.time()
            pipeline(spark, sf_dir, fn).write.mode("overwrite").format(
                "noop"
            ).save()
            acc.append(round(time.time() - t0, 3))
    print(
        f"chunk_embed_pool: old={old_t} med={statistics.median(old_t):.3f} | "
        f"new={new_t} med={statistics.median(new_t):.3f}",
        flush=True,
    )

    t0 = time.time()
    spark.range(256_000_000).selectExpr("sum(id * 3 + 1)").collect()
    print(f"probe_end {time.time() - t0:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
