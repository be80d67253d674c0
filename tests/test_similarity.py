"""Similarity search: brute-force exactness on crafted vectors, IVF recall
vs brute force on the embeddings table."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.operators import similarity
from api_log_iceberg_test_spark.schema import load_table


def test_bruteforce_topk_exact(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = vecs.filter("vec_id = 0")
    out = similarity.cosine_topk_bruteforce(vecs, q, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(1, 1), (2, 2)]
    assert out[0]["cosine"] > 0.99


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF is exact when probing all cells; recall degrades monotonically
    as nprobe shrinks (testdata clusters are loose: ~0.4 at nprobe=2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    cents = similarity.compute_centroids(emb)

    def recall(nprobe: int) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.cosine_topk_ivf(
                emb, queries, cents, k=5, nprobe=nprobe
            ).collect()
        }
        return len(truth & approx) / len(truth)

    assert recall(10) == 1.0  # all cells probed ⇒ identical to brute force
    r2, r4 = recall(2), recall(4)
    assert r4 >= r2 >= 0.3, (r2, r4)


def test_numpy_topk_matches_expression_path(spark, sf_dir):
    """The BLAS mapInPandas variant must return the same neighbor sets as
    the sequential expression variant; cosines agree to fp tolerance."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    fast = similarity.cosine_topk_numpy(emb, queries, k=5).collect()
    assert len(exact) == len(fast)
    truth = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in fast}
    # identical pair sets (ULP cosine drift can't flip non-tied rankings on
    # this corpus), cosines equal to 1e-6
    assert truth.keys() == got.keys()
    for key, cos in truth.items():
        assert abs(cos - got[key]) < 1e-6, (key, cos, got[key])


def test_hyperplane_lsh_precision_and_recall(spark):
    """LSH pairs must be a subset of exact pairs (exact verification ⇒
    precision 1.0); planted near-dup pairs (cos ≥ 0.95) must be recovered
    (banding capture ≈ 0.997 at these params)."""
    import numpy as np

    rng = np.random.default_rng(42)
    dim, n_base, n_planted = 16, 100, 10
    base = rng.standard_normal((n_base, dim))
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    # planted: tiny perturbation of base[i] => cosine ≈ 1
    for j in range(n_planted):
        v = base[j] + 0.01 * rng.standard_normal(dim)
        rows.append((n_base + j, v.tolist()))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(vecs, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.hyperplane_lsh_pairs(vecs, threshold=0.9).collect()
    }
    assert lsh <= exact  # precision 1.0 by construction
    planted = {(j, n_base + j) for j in range(n_planted)}
    assert planted <= exact
    recall = len(lsh & planted) / len(planted)
    assert recall >= 0.9, recall


def test_kmeans_recovers_planted_blobs(spark):
    """Three well-separated blobs → k=3 recovers the exact partition;
    every vector ends on its nearest final centroid; runs are identical."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + 0.1 * rng.standard_normal(3)).tolist()))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])

    out = {r["vec_id"]: r["cluster"] for r in similarity.kmeans_assign(vecs, k=3).collect()}
    # same blob ⇒ same cluster, different blob ⇒ different cluster
    for i in range(90):
        assert out[i] == out[i % 3]
    assert len({out[0], out[1], out[2]}) == 3
    # deterministic
    out2 = {r["vec_id"]: r["cluster"] for r in similarity.kmeans_assign(vecs, k=3).collect()}
    assert out == out2


def test_kmeans_assignment_is_nearest_final_centroid(spark, sf_dir):
    """Lloyd's invariant at convergence on real embeddings: each vector's
    cluster minimizes squared distance to the final per-cluster mean."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    assign = similarity.kmeans_assign(emb, k=4, max_iter=20)
    rows = (
        emb.join(assign, "vec_id")
        .select("vec_id", "embedding", "cluster")
        .collect()
    )
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(np.array(r["embedding"], dtype=float))
    cents = {c: np.mean(vs, axis=0) for c, vs in by_cluster.items()}
    for r in rows:
        v = np.array(r["embedding"], dtype=float)
        dists = {c: float(((v - m) ** 2).sum()) for c, m in cents.items()}
        best = min(dists, key=lambda c: (dists[c], c))
        assert dists[r["cluster"]] <= dists[best] + 1e-9


def test_neardup_pairs_symmetric_free(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    pairs = similarity.embedding_neardup_pairs(vecs, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]


def test_l2_normalize_unit_norm_and_cosine_equivalence(spark, sf_dir):
    """l2_normalize yields unit vectors, and cosine(a, b) equals the plain
    dot product of the normalized copies (the retrieval pre-step it
    exists for); zero vectors pass through."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    n = emb.select(
        "vec_id", similarity.l2_normalize(F.col("embedding")).alias("nv"), "embedding"
    )
    norms = n.select(
        F.sqrt(
            F.aggregate(
                "nv", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("norm")
    ).collect()
    for r in norms:
        assert abs(r["norm"] - 1.0) < 1e-9
    a = n.limit(1).select(
        F.col("nv").alias("nv_a"), F.col("embedding").alias("e_a")
    )
    pairs = a.crossJoin(n.select(F.col("nv").alias("nv_b"), F.col("embedding").alias("e_b")))
    chk = pairs.select(
        F.aggregate(
            F.zip_with("nv_a", "nv_b", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot_norm"),
        similarity.cosine("e_a", "e_b").alias("cos"),
    ).collect()
    for r in chk:
        assert abs(r["dot_norm"] - r["cos"]) < 1e-9

    zero = spark.createDataFrame([(1, [0.0] * 4)], ["id", "v"])
    z = zero.select(similarity.l2_normalize(F.col("v")).alias("nv")).collect()[0]
    assert list(z["nv"]) == [0.0, 0.0, 0.0, 0.0]


def test_embed_documents_null_text_yields_null_row(spark):
    """NULL text must produce a NULL embedding row (matching the oracle's
    md5(NULL)), not an executor crash."""
    from api_log_iceberg_test_spark.operators import embed  # noqa: PLC0415

    df = spark.createDataFrame([(1, "hello world"), (2, None)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in embed.embed_documents(df).collect()}
    assert out[1]["d0"] is not None
    assert all(out[2][f"d{d}"] is None for d in range(8))


def test_zero_vector_does_not_abort(spark):
    """One all-zero embedding must not ANSI-abort cosine or quantization
    jobs; its similarities are 0 and its quantized vector is all zeros."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.0])],
        ["vec_id", "embedding"],
    )
    top = similarity.cosine_topk_bruteforce(df, df.where("vec_id < 2"), k=2).collect()
    assert top, "job aborted or empty"
    zero_scores = [r["cosine"] for r in top if r["query_id"] == 1]
    assert zero_scores and all(s == 0.0 for s in zero_scores)

    q = {r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()}
    assert list(q[1]["q"]) == [0, 0, 0]

    pairs = similarity.embedding_neardup_pairs(df, threshold=0.9).collect()
    assert all({r["id_a"], r["id_b"]} != {0, 1} for r in pairs)


def test_cosine_topk_numpy_empty_queries(spark):
    from api_log_iceberg_test_spark.schema import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = similarity.cosine_topk_numpy(emb, emb.where("vec_id < 0"), k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank",
    ]


def test_pq_rerank_recall_vs_exact(spark, sf_dir):
    from api_log_iceberg_test_spark.schema import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter("vec_id < 10")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_numpy(emb, qs, k=10).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_pq(emb, qs, k=10, rerank=160).collect()
    }
    # near-random synthetic embeddings are PQ's worst case (cosine gaps sit
    # at the noise floor); 0.85 measured ≥0.93 at sf0.01 with rerank=16k
    assert len(exact & got) / len(exact) >= 0.85


def test_pq_planted_clusters_exact_and_deterministic(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    cents = rng.normal(size=(10, 64))
    rows = [
        (i, (cents[i % 10] + 0.05 * rng.normal(size=64)).tolist())
        for i in range(500)
    ]
    pl = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = pl.filter("vec_id < 10")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_numpy(pl, qs, k=10).collect()
    }
    a = similarity.cosine_topk_pq(pl, qs, k=10, rerank=40).collect()
    b = similarity.cosine_topk_pq(pl, qs, k=10, rerank=40).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    got = {(r.query_id, r.neighbor_id) for r in a}
    assert got == exact  # structured data: PQ+rerank recovers exact top-k
    # reranked scores are true cosines: spot-check against the exact path
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.cosine_topk_numpy(pl, qs, k=10).collect()
    }
    for r in a:
        assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.score) < 1e-6


def test_pq_empty_queries(spark):
    pl = spark.createDataFrame(
        [(1, [0.1] * 64)], "vec_id long, embedding array<double>"
    )
    out = similarity.cosine_topk_pq(pl, pl.filter("vec_id < 0"), k=5)
    assert out.count() == 0


def test_neardup_projection_pruning_is_lossless(spark):
    # pruned bucketed join must equal the unpruned theta join exactly,
    # including pairs whose projections straddle a bucket boundary
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 8))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows += [
        (100 + i, (base[i] + 1e-4 * rng.normal(size=8)).tolist())
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for t in (0.999, 0.8):
        got = {
            (r.id_a, r.id_b, r.cosine)
            for r in similarity.embedding_neardup_pairs(df, threshold=t).collect()
        }
        brute = (
            df.alias("x")
            .join(df.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
            .select(
                F.col("x.vec_id").alias("id_a"),
                F.col("y.vec_id").alias("id_b"),
                F.round(
                    F.expr(
                        "aggregate(zip_with(x.embedding, y.embedding, (p,q)->p*q), 0D, (acc,v)->acc+v)"
                        " / (sqrt(aggregate(transform(x.embedding, p->p*p), 0D, (acc,v)->acc+v))"
                        " * sqrt(aggregate(transform(y.embedding, p->p*p), 0D, (acc,v)->acc+v)))"
                    ),
                    6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= t)
        )
        ref = {(r.id_a, r.id_b, r.cosine) for r in brute.collect()}
        assert got == ref, f"threshold {t}"


def test_neardup_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [0.0] * 8), (3, [1.0] + [0.0] * 7)],
        "vec_id long, embedding array<double>",
    )
    # zero vectors define cos := 0 -> no pairs at positive thresholds
    assert similarity.embedding_neardup_pairs(df, threshold=0.5).count() == 0


def test_rrf_fuse_formula_and_missing_ids(spark):
    """RRF score is Σ 1/(60+rank) with 0 for a missing list, and the fused
    order follows the formula, not either input order."""
    from api_log_iceberg_test_spark.operators import similarity

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    dense = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank_lex"], r["rank_dense"])
        for r in similarity.rrf_fuse({"lex": lex, "dense": dense}, topk=10).collect()
    }
    assert out[3] == (round(1 / 63 + 1 / 61, 6), 3, 1)  # both lists
    assert out[1] == (round(1 / 61, 6), 1, None)
    assert out[4] == (round(1 / 62, 6), None, 2)
    # doc 3 (in both) must outrank every single-list doc here
    best = max(out, key=lambda k: out[k][0])
    assert best == 3
