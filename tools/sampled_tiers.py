"""Bounded sampled-exact cross-engine tiers for pair queries whose FULL
all-pairs oracle cannot fit the sweep's 20-minute box at sf1.0.

VERDICT r08 #3: ``q_embedding_neardup`` is intrinsically all-pairs at
threshold 0.42 — eps = sqrt(2-2t) ≈ 1.08 disables its lossless 1-D
projection pruning, so the full sf1.0dx corpus (20k vectors → 200M
candidate pairs) DNFs in DuckDB. The sampled tier keeps the EXACT
threshold-0.42 semantics on a deterministic stratified sample:

* stratification is by ORIGINAL vector — the predicate hashes
  ``vec_id % 10_000_000`` (the sf1.0dx replica derivation adds
  k*10_000_000 to replica k's keys, tools/make_sf1.py), so sampling an
  original keeps ALL TEN of its replicas, preserving the decorrelated
  derivation's within-replica near-dup structure;
* the hash is the repo's standard multiplicative residue
  (``(orig * 2654435761) % 1000 < 200`` → 20% of originals, ~4k
  vectors, ~8M exact pairs — minutes in both engines), mod-reduced
  before the multiply like q_train_sample so 100 TB-scale ids cannot
  overflow;
* a qualifying pair survives iff BOTH endpoints' originals are sampled
  (capture probability 4% per within-replica pair), and every surviving
  pair's cosine is the exact full-corpus value: sampling restricts the
  input set, it never perturbs arithmetic. Measured at sf1.0dx: 2000
  qualifying pairs — the ~175 expected within-replica structure pairs
  plus the 3.4-sigma tail of the ~7.2M cross-replica noise cosines
  (sd ≈ 1/sqrt(64) puts 0.42 at 3.4 sigma → ~4e-4 of pairs), which are
  equally legitimate exact-threshold semantics and make the tier a
  STRONGER boundary exercise than the planted structure alone.

Both engines apply the IDENTICAL predicate and the identical cosine/
threshold text as the registered full-corpus forms, so a MATCH here is
real threshold-0.42 evidence at sf1.0 scale. The full-corpus oracle
remains the driver gate at sf0.01 and the sweep record at sf0.1; the
LSH twin stays the recall-traded 100 TB path.
"""

from __future__ import annotations

_SAMPLE_PRED_SQL = "((vec_id % 10000000) * 2654435761) % 1000 < 200"


def _neardup_sampled_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from api_log_iceberg_test_spark.operators import similarity
    from api_log_iceberg_test_spark.schema import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if emb.schema["embedding"].dataType.simpleString() != "array<double>":
        emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    keep = (
        F.pmod(
            F.pmod(F.col("vec_id"), F.lit(10_000_000)) * F.lit(2654435761),
            F.lit(1000),
        )
        < 200
    )
    return similarity.embedding_neardup_pairs(
        emb.filter(keep), threshold=0.42
    ).orderBy("id_a", "id_b")


_NEARDUP_SAMPLED_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_SAMPLE_PRED_SQL}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.42
    ORDER BY id_a, id_b
"""

#: sweep hook: name -> {spark, oracle, tier}; applied only at sf1.0*
#: dirs (smaller SFs run the affordable full-corpus oracle as before)
SAMPLED_TIERS = {
    "q_embedding_neardup": {
        "spark": _neardup_sampled_spark,
        "oracle": _NEARDUP_SAMPLED_ORACLE,
        "tier": "sampled-exact-20pct-of-originals",
    },
}
