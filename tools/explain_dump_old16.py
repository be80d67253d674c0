"""Dump AQE-final plans for the ROUND-15 snapshot package (the r16
"before" arm: git archive of commit 7ac1406 under /tmp/oldpkg_r16/old16),
so plans/r16/<q>_before.txt reflects exactly what the working tree changed.

Usage: python tools/explain_dump_old16.py <sf_dir> <tag> q1,q2,...
Writes plans/<tag>/<q>_before.txt. Same execute-then-explain discipline as
explain_dump.py (the final adaptive plan is the evidence, not the initial
tree).
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg_r16")

from api_log_iceberg_test_spark.session import build_session  # noqa: E402


def _assemble(pkg: str) -> dict:
    out: dict = {}
    for mod in ("queries.api_logs", "queries.analytics", "queries.sql_surface"):
        m = importlib.import_module(f"{pkg}.{mod}")
        out.update(getattr(m, "QUERIES", {}))
    reg = importlib.import_module(f"{pkg}.operators.registry")
    for d in ("QUERIES", "QUERIES_TAIL", "QUERIES_LATE"):
        out.update(getattr(reg, d, {}))
    return out


def main() -> None:
    sf_dir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="explain-dump-old16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _assemble("old16")
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_before.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
