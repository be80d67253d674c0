"""Derive a local sf1.0 testdata set (10x sf0.1) for differential sweeps.

The driver ships sf0.001/0.01/0.1 only; the r06 sf0.1 sweep proved each
10x data step surfaces a new cross-engine numeric class (q_anomaly_mad's
ROUND flip), so round 7 needs sf1.0 (VERDICT r06 #1). The driver's
generator recipe isn't available — this tool derives sf1.0 from sf0.1 by
deterministic replication:

- every fact/dim row is copied K=10 times; replica k>0 gets key offsets
  (stride 10_000_000, far above any sf0.1 key) applied consistently to
  both sides of every FK, so referential integrity holds and joins stay
  within a replica (the same selectivity shape as sharded data);
- numeric measures get a deterministic hash-jitter (splitmix64 of
  (key, k, field)) so replicas don't produce degenerate 10x-identical
  sums/quantiles — the sweep's whole point is NEW fp/rounding boundaries;
- timestamps shift by replica-dependent sub-day offsets so date-boundary
  groupings and range-filter fractions are exercised without escaping the
  fixed query windows;
- document text gets a replica-suffix token (n_chars recomputed), and
  embeddings get per-component jitter;
- nation/region stay fixed (TPC-H dims are SF-invariant);
- output is written with the SOURCE arrow schema, so Spark and DuckDB
  see exactly the field types the driver's files carry.

Correctness of the sweep does NOT depend on matching the driver's
distribution: both engines read the SAME derived files, so any
divergence is a real cross-engine arithmetic difference.

--decorrelate mode (VERDICT r07 #2): the default text derivation makes
every replica a near-duplicate of its source doc (a trailing
" replica{k}" token barely moves Jaccard), so every doc sits in a
10-member near-dup cluster and EXACT pair oracles go quadratic in
cluster size — that is why the HEAVY pair/graph families were denylisted
from the sf1.0 differential. Decorrelation replaces the trailing token
with a per-token replica suffix (token → token + "xk"): a BIJECTIVE
token mapping, so within one replica every pairwise Jaccard is EXACTLY
the sf0.1 value (shingle sets map 1:1), while across replicas shingle
sets are disjoint (different suffixes) — the pair graph becomes 10
independent copies of sf0.1's, i.e. pairs scale LINEARLY with SF.
Embeddings get a per-replica dimension permutation + sign flips: an
orthogonal transform, so within-replica cosines are preserved (the same
component products, reordered) while cross-replica cosines collapse to
noise (E=0, sd≈1/√64) far below every near-dup threshold. All other
tables derive exactly as the default mode. Output lands in
.localdata/sf1.0dx so both derivations coexist; sweep records tag as
sweep_sf1.0dx.jsonl.

Usage: python tools/make_sf1.py [out_dir] [--decorrelate]
       (default out_dir .localdata/sf1.0, or .localdata/sf1.0dx
        under --decorrelate)
Deterministic — rerunning reproduces byte-identical tables.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = 10
STRIDE = 10_000_000

_KEY_COLS = {
    "c_custkey",
    "s_suppkey",
    "p_partkey",
    "o_orderkey",
    "o_custkey",
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "event_id",
    "user_id",
    "doc_id",
    "vec_id",
}


def _mix(*cols: np.ndarray) -> np.ndarray:
    """splitmix64-style vectorized hash of equal-length int arrays →
    uint64; deterministic, no RNG state."""
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        h = h + c.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return h


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 hash → uniform [0,1) double."""
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _scaled(table: str, cols: dict[str, np.ndarray], k: int, key: str) -> dict:
    """One replica of one table: key offsets + per-field jitter."""
    out = dict(cols)
    if k == 0:
        return out
    off = np.int64(k * STRIDE)
    for c in out:
        if c in _KEY_COLS:
            out[c] = out[c] + off
    base = cols[key].astype(np.int64)

    def u(tag: int) -> np.ndarray:
        return _unit(_mix(base, np.full(len(base), k * 131 + tag, np.int64)))

    if table == "customer":
        out["c_acctbal"] = np.round(cols["c_acctbal"] * (0.95 + 0.1 * u(1)), 2)
    elif table == "supplier":
        out["s_acctbal"] = np.round(cols["s_acctbal"] * (0.95 + 0.1 * u(1)), 2)
    elif table == "part":
        out["p_retailprice"] = np.round(
            cols["p_retailprice"] * (0.95 + 0.1 * u(1)), 2
        )
    elif table == "orders":
        out["o_totalprice"] = np.round(
            cols["o_totalprice"] * (0.95 + 0.1 * u(1)), 2
        )
        # sub-day shift: exercises date-boundary groupings, keeps the
        # fixed query windows' selectivity shape
        out["o_orderdate"] = cols["o_orderdate"] + (
            (u(2) * 86_400_000_000).astype("timedelta64[us]")
        )
    elif table == "lineitem":
        out["l_quantity"] = np.maximum(
            1.0, cols["l_quantity"] + np.floor(u(1) * 7.0) - 3.0
        )
        out["l_extendedprice"] = np.round(
            cols["l_extendedprice"] * (0.95 + 0.1 * u(2)), 2
        )
        out["l_discount"] = np.round(
            np.clip(cols["l_discount"] + (u(3) - 0.5) * 0.02, 0.0, 0.1), 2
        )
        out["l_tax"] = np.round(
            np.clip(cols["l_tax"] + (u(4) - 0.5) * 0.02, 0.0, 0.08), 2
        )
        out["l_shipdate"] = cols["l_shipdate"] + (
            (u(5) * 86_400_000_000).astype("timedelta64[us]")
        )
    elif table == "events":
        out["value"] = np.round(cols["value"] * (0.9 + 0.2 * u(1)), 6)
        out["ts"] = cols["ts"] + ((u(2) * 3_600_000_000).astype("timedelta64[us]"))
    return out


def main() -> None:
    decorrelate = "--decorrelate" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1.0dx" if decorrelate else "sf1.0",
    )
    os.makedirs(out_dir, exist_ok=True)

    for t in ("nation", "region"):  # SF-invariant dims: straight copy
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{out_dir}/{t}.parquet")
        print(t, "copied")

    keyed = {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey",
        "events": "event_id",
    }
    for t, key in keyed.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        schema = src.schema
        cols = {
            f.name: src.column(f.name).to_numpy(zero_copy_only=False)
            for f in schema
        }
        parts = []
        for k in range(K):
            rep = _scaled(t, cols, k, key)
            parts.append(
                pa.table(
                    {f.name: pa.array(rep[f.name], type=f.type) for f in schema},
                    schema=schema,
                )
            )
        pq.write_table(pa.concat_tables(parts), f"{out_dir}/{t}.parquet")
        print(t, K * len(src), "rows")

    # documents: replica-suffix token so replicas are near- (not exact-)
    # duplicates; n_chars recomputed to stay = len(text)
    src = pq.read_table(f"{SRC}/documents.parquet")
    schema = src.schema
    ids = src.column("doc_id").to_numpy()
    txt = src.column("text").to_pylist()
    lang = src.column("lang").to_pylist()
    source = src.column("source").to_pylist()
    parts = []
    for k in range(K):
        if k == 0:
            t2, id2 = txt, ids
        elif decorrelate:
            # bijective per-token suffix: within-replica Jaccard is
            # EXACTLY sf0.1's, cross-replica shingle overlap is zero —
            # the pair graph scales linearly instead of quadratically
            suf = f"x{k}"
            t2 = [" ".join(w + suf for w in s.split()) for s in txt]
            id2 = ids + np.int64(k * STRIDE)
        else:
            t2 = [s + f" replica{k}" for s in txt]
            id2 = ids + np.int64(k * STRIDE)
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(id2, type=pa.int64()),
                    "text": pa.array(t2, type=pa.string()),
                    "lang": pa.array(lang, type=pa.string()),
                    "source": pa.array(source, type=pa.string()),
                    "n_chars": pa.array(
                        [len(s) for s in t2], type=pa.int64()
                    ),
                },
                schema=schema,
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")
    print("documents", K * len(src), "rows")

    # embeddings: per-component jitter, labels kept
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    schema = src.schema
    ids = src.column("vec_id").to_numpy()
    vecs = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    labels = src.column("label").to_numpy()
    parts = []
    for k in range(K):
        if k == 0:
            v2, id2 = vecs, ids
        elif decorrelate:
            # orthogonal per-replica transform (dimension permutation +
            # sign flips): within-replica cosines preserved exactly —
            # the same component products, reordered — cross-replica
            # cosines collapse to noise (E=0, sd≈1/√dim)
            dim = vecs.shape[1]
            hp = _mix(
                np.arange(dim, dtype=np.int64),
                np.full(dim, k * 7919 + 13, np.int64),
            )
            perm = np.argsort(hp)
            signs = np.where(
                _mix(
                    np.arange(dim, dtype=np.int64),
                    np.full(dim, k * 104729 + 29, np.int64),
                )
                % np.uint64(2)
                == 0,
                np.float32(1.0),
                np.float32(-1.0),
            )
            v2 = (vecs[:, perm] * signs[None, :]).astype(np.float32)
            id2 = ids + np.int64(k * STRIDE)
        else:
            jit = _unit(
                _mix(
                    np.repeat(ids, vecs.shape[1]).astype(np.int64),
                    np.tile(
                        np.arange(vecs.shape[1], dtype=np.int64), len(ids)
                    )
                    + k * 1009,
                )
            ).reshape(vecs.shape)
            v2 = (vecs * (0.9 + 0.2 * jit)).astype(np.float32)
            id2 = ids + np.int64(k * STRIDE)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(id2, type=pa.int64()),
                    "embedding": pa.array(
                        [row.tolist() for row in v2],
                        type=schema.field("embedding").type,
                    ),
                    "label": pa.array(labels, type=pa.int32()),
                },
                schema=schema,
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")
    print("embeddings", K * len(src), "rows")
    print("done:", out_dir)


if __name__ == "__main__":
    main()
