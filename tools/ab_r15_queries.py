"""Whole-query interleaved A/B for round 15: r14 registry (package copy of
commit e5d7e8d under /tmp/oldpkg/old_ailts) vs the working tree, alternating
old,new,old,new inside one session so host stripes hit both arms equally.

Usage: python tools/ab_r15_queries.py <sf_dir> <rounds> q1,q2,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg")

from api_log_iceberg_test_spark.session import build_session  # noqa: E402


def _lookup(reg, name):
    for d in ("QUERIES", "QUERIES_TAIL", "QUERIES_LATE"):
        m = getattr(reg, d, {})
        if name in m:
            return m[name]
    raise KeyError(name)


def main() -> None:
    sf_dir, rounds, names = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")
    spark = build_session(app_name="ab-r15-queries")
    spark.sparkContext.setLogLevel("ERROR")
    import old_ailts.operators.registry as old_reg
    from api_log_iceberg_test_spark.operators import registry as new_reg

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
        of, nf = _lookup(old_reg, name), _lookup(new_reg, name)
        run(of)
        run(nf)
        olds, news = [], []
        for _ in range(rounds):
            olds.append(run(of))
            news.append(run(nf))
        print(
            f"{name}: old={olds} med={statistics.median(olds):.3f} | "
            f"new={news} med={statistics.median(news):.3f}",
            flush=True,
        )
    print(f"probe_end {probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
