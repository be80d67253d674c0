"""Interleaved A/B harness for round-15 operator changes.

The bench host stripes unpredictably (probe 0.23-5.2 s within minutes), so
sequential before/after runs are unusable. This alternates OLD (HEAD,
imported from a renamed package copy under /tmp/oldpkg/old_ailts) and NEW
(working tree) implementations of the same DataFrame pipeline inside ONE
session — A,B,A,B,... so host drift hits both arms equally. Reports
per-arm samples and medians.

Usage: python tools/ab_r15.py <sf_dir> <rounds> <case1,case2,...|all>
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg")

from pyspark.sql import functions as F  # noqa: E402

from api_log_iceberg_test_spark.session import build_session  # noqa: E402
from api_log_iceberg_test_spark.schema import load_table  # noqa: E402


def main() -> None:
    sf_dir, rounds, which = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    spark = build_session(app_name="ab-r15")
    spark.sparkContext.setLogLevel("ERROR")

    import old_ailts.operators.dedup as od
    import old_ailts.operators.graph as og
    import old_ailts.operators.tfidf as ot
    from api_log_iceberg_test_spark.operators import dedup as nd
    from api_log_iceberg_test_spark.operators import graph as ng
    from api_log_iceberg_test_spark.operators import tfidf as nt

    docs = lambda: load_table(spark, sf_dir, "documents")  # noqa: E731
    ev = lambda: load_table(spark, sf_dir, "events")  # noqa: E731

    def comp(mod):
        return lambda: mod.connected_components(
            mod.ngram_jaccard_pairs(docs(), threshold=0.5)
        ).orderBy("doc_id")

    def pr(mod):
        def f():
            edges = (
                ng.transition_edges(ev())
                if mod is ng
                else og.transition_edges(ev())
            )
            return (
                mod.pagerank(edges, k=10, damping=0.85)
                .select("node", F.round("rank", 6).alias("rank"))
                .orderBy("node")
            )

        return f

    CASES = {
        "jaccard": (
            lambda: od.ngram_jaccard_pairs(docs(), threshold=0.5).orderBy(
                "doc_a", "doc_b"
            ),
            lambda: nd.ngram_jaccard_pairs(docs(), threshold=0.5).orderBy(
                "doc_a", "doc_b"
            ),
        ),
        "minhash": (
            lambda: od.minhash_lsh_pairs(docs(), threshold=0.5).orderBy(
                "doc_a", "doc_b"
            ),
            lambda: nd.minhash_lsh_pairs(docs(), threshold=0.5).orderBy(
                "doc_a", "doc_b"
            ),
        ),
        "components": (comp(od), comp(nd)),
        "star": (
            lambda: od.connected_components_star(
                od.ngram_jaccard_pairs(docs(), threshold=0.5)
            ).orderBy("doc_id"),
            lambda: nd.connected_components_star(
                nd.ngram_jaccard_pairs(docs(), threshold=0.5)
            ).orderBy("doc_id"),
        ),
        "pagerank": (pr(og), pr(ng)),
        "tfidf": (
            lambda: ot.tfidf_top_terms(docs(), k=3).orderBy("doc_id", "rank"),
            lambda: nt.tfidf_top_terms(docs(), k=3).orderBy("doc_id", "rank"),
        ),
        "bm25": (
            lambda: ot.bm25_topk(docs(), ["spark", "window", "merge"], k=25),
            lambda: nt.bm25_topk(docs(), ["spark", "window", "merge"], k=25),
        ),
        "sweep": (
            lambda: od.lsh_param_sweep(docs(), threshold=0.5),
            lambda: nd.lsh_param_sweep(docs(), threshold=0.5),
        ),
    }
    names = list(CASES) if which == "all" else which.split(",")

    # warm-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(build) -> float:
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    for name in names:
        old_b, new_b = CASES[name]
        run(old_b)  # cold both arms once (codegen compile)
        run(new_b)
        olds, news = [], []
        for _ in range(rounds):
            olds.append(run(old_b))
            news.append(run(new_b))
        print(
            f"{name}: old={olds} median={statistics.median(olds):.3f} | "
            f"new={news} median={statistics.median(news):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
