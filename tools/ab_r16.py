"""Whole-query interleaved A/B for round 16: the r15-final package (git
archive of commit 7ac1406 under /tmp/oldpkg_r16/old16) vs the working tree,
alternating old,new,old,new inside one session so host stripes hit both
arms equally. Unlike ab_r15_queries.py this assembles the FULL query map
(reference surface + analytics + sql_surface + operator registry) from both
packages, so TPC-H entries are A/B-able too.

Usage: python tools/ab_r16.py <sf_dir> <rounds> q1,q2,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg_r16")

from api_log_iceberg_test_spark.session import build_session  # noqa: E402


def _assemble(pkg: str) -> dict:
    import importlib

    out: dict = {}
    for mod in ("queries.api_logs", "queries.analytics", "queries.sql_surface"):
        m = importlib.import_module(f"{pkg}.{mod}")
        out.update(getattr(m, "QUERIES", {}))
    reg = importlib.import_module(f"{pkg}.operators.registry")
    for d in ("QUERIES", "QUERIES_TAIL", "QUERIES_LATE"):
        out.update(getattr(reg, d, {}))
    return out


def main() -> None:
    sf_dir, rounds, names = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")
    spark = build_session(app_name="ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    old_qs = _assemble("old16")
    new_qs = _assemble("api_log_iceberg_test_spark")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    def probe() -> float:
        t0 = time.time()
        spark.range(256_000_000, numPartitions=32).selectExpr(
            "sum(pmod(xxhash64(id), 1000003))"
        ).collect()
        return round(time.time() - t0, 3)

    print(f"probe_start {probe()}", flush=True)

    def run(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    for name in names:
        of, nf = old_qs[name], new_qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        run(of)
        run(nf)
        olds, news = [], []
        for _ in range(rounds):
            olds.append(run(of))
            news.append(run(nf))
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{name}: old={olds} med={mo:.3f} | new={news} med={mn:.3f} "
            f"| ratio={mn / mo:.3f}",
            flush=True,
        )
    print(f"probe_end {probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
