"""A/B: linear when-cascade vs balanced when-tree bucket-id lookup.

VERDICT r13 scale watch: the r13 `range_bucket_ids` derived the bucket id as
a linear cascade (Σ ``key >= cut_i``) — O(k) comparisons per row, a codegen-
size risk at cluster-scale k (Spark splits >64KB generated methods, then
degrades toward interpreted evaluation). r14 replaced it with a balanced
when-tree (binary search over the sorted literal cuts, ~log₂k comparisons
per row). This tool measures both forms on the same synthetic frame at
several k and verifies they compute the identical function.

Usage: python tools/ab_bucket_tree.py [n_rows]
Appends one JSON line per (k, form) to tools/ab_bucket_tree.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_log_iceberg_test_spark.operators import layout  # noqa: E402


def cascade(key: Column, cuts: list, dtype) -> Column:
    """The r13 linear form, kept here as the A/B reference."""
    b: Column = F.lit(0)
    for c in cuts:
        b = b + F.when(key >= layout._key_literal(c).cast(dtype), 1).otherwise(0)
    return b


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # First finding of this A/B: under the DEFAULT driver stack the r13
    # cascade does not even ANALYZE at k=256 — the left-deep chain of 255
    # nested Add(CaseWhen(...)) nodes overflows the analyzer's recursion
    # (java.lang.StackOverflowError in ColumnResolutionHelper). The
    # balanced tree's depth is log2(k) and analyzes fine. A wide -Xss lets
    # the cascade run so its EXECUTION cost can be measured too; per-form
    # failures are recorded rather than aborting the A/B.
    stack = os.environ.get("AB_DRIVER_STACK", "-Xss512m")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_bucket_tree")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", stack)
        .config("spark.executor.extraJavaOptions", stack)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # multiplicative-hash keys: uniform, deterministic, no RNG state
    df = (
        spark.range(n_rows)
        .select(((F.col("id") * F.lit(2654435761)) % F.lit(1_000_000_007)).alias("k"))
    )
    dtype = df.schema["k"].dataType
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_bucket_tree.jsonl")
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(out_path, "a") as out:
        for k in (256, 2048, 4096):
            step = 1_000_000_007 // k
            cuts = [step * (i + 1) for i in range(k - 1)]
            sums = {}
            for name, fn in (("cascade", cascade), ("tree", layout._bucket_ordinal)):
                rec = {"ts": stamp, "n_rows": n_rows, "k": k, "form": name,
                       "stack": stack}
                try:
                    expr = fn(F.col("k"), cuts, dtype).alias("b")
                    times = []
                    for rep in range(3):
                        t0 = time.time()
                        row = df.select(expr).agg(F.sum("b").alias("s")).collect()[0]
                        times.append(round(time.time() - t0, 3))
                    sums[name] = row["s"]
                    rec.update(
                        times_sec=times,
                        median_sec=statistics.median(times),
                        checksum=row["s"],
                    )
                except Exception as e:  # e.g. analyzer StackOverflowError
                    rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
                out.write(json.dumps(rec) + "\n")
                print(json.dumps(rec))
            if len(sums) == 2:
                assert sums["cascade"] == sums["tree"], (
                    f"forms diverge at k={k}: {sums}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
