"""Time individual queries with the bench methodology (noop sink, warm
session, cold + N steady passes). Usage:

    python tools/time_query.py <sf_dir> <repeats> q1,q2,...

Prints one line per query: name, cold, steady samples, median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_log_iceberg_test_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir, repeats, names = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")
    spark = build_session(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    qs["q_count"](spark, sf_dir).collect()
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        print(
            f"{name}: cold={cold:.3f} steady={runs} median={statistics.median(runs):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
