"""Per-stage profile of a query run, via the local Spark UI REST API.

Runs each named query once warm, then once profiled: snapshots
/api/v1/applications/<app>/stages before and after the profiled pass and
prints every NEW completed stage with its task count, executor run time,
input/shuffle bytes. This is the guide-§1 "where is the time going"
evidence without needing the live UI.

Usage: python tools/stage_profile.py <sf_dir> q1,q2,...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_log_iceberg_test_spark.session import build_session  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2].split(",")
    spark = build_session(app_name="stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    qs["q_count"](spark, sf_dir).collect()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        before = {s["stageId"] for s in _rest(spark, "stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        stages = [
            s
            for s in _rest(spark, "stages")
            if s["stageId"] not in before and s["status"] == "COMPLETE"
        ]
        stages.sort(key=lambda s: s["stageId"])
        tot_exec = sum(s["executorRunTime"] for s in stages)
        print(f"\n=== {name}: wall={wall:.3f}s stages={len(stages)} "
              f"executor_total={tot_exec / 1000:.3f}s")
        for s in stages:
            print(
                f"  stage {s['stageId']:>5} tasks={s['numTasks']:>3} "
                f"exec={s['executorRunTime'] / 1000:>7.3f}s "
                f"in={s['inputBytes'] >> 20:>5}MB "
                f"sr={s['shuffleReadBytes'] >> 20:>4}MB "
                f"sw={s['shuffleWriteBytes'] >> 20:>4}MB  "
                f"{s['name'][:70]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
