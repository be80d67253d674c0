"""Layout-invariance sweep: every oracled query run under two deliberately
different PHYSICAL configurations (scan split size + shuffle partition
count), results compared exactly.

Why: the r07 sf1.0 sweep showed fp-sum ASSOCIATION differences flip
ROUND boundaries across engines. The same class exists WITHIN one
engine: a partial-aggregate merge tree depends on scan splits, shuffle
partitions, and task completion order, so an association-dependent
result can differ between cluster layouts — which would make the
driver's value-hash gate flaky and, at 100 TB, make results depend on
executor count. A query that passes this sweep is layout-stable at the
tested data; one that fails needs the exact-grid treatment
(COVERAGE.md r07) or an explicit non-determinism contract.

Usage: python tools/sweep_layout.py <sf_dir> [--only n1,n2]
Appends JSONL to layout_<tag>.jsonl next to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_differential import HEAVY  # same pair-quadratic denylist

#: two layouts chosen to maximize physical-plan divergence: tiny scan
#: splits + prime shuffle count vs big splits + default-ish count
CONFIGS = [
    {"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
     "spark.sql.shuffle.partitions": "7",
     "spark.default.parallelism": "5"},
    {"spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
     "spark.sql.shuffle.partitions": "64",
     "spark.default.parallelism": "16"},
]


def _run_all(sf_dir: str, conf: dict, names: list[str], scratch: str) -> dict:
    # the py4j JVM is shared across sequential sessions, so driver heap
    # must be fixed BEFORE the first session — sf1.0 OOMs the 1g default
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 12g pyspark-shell")
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]")
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")
    import __spark_entry__ as em
    from tests.oracle import _canon

    qs = em.queries()
    out = {}
    # per-query append+flush to a per-config scratch file: a crash or OOM
    # in a LATER query/config (the sf1.0 risk the heap note above
    # documents) must not discard hours of already-finished results
    with open(scratch, "a") as ckpt:
        for name in names:
            t0 = time.time()
            try:
                df = _canon(qs[name](spark, sf_dir).toPandas())
                out[name] = {"rows": len(df), "repr": df.to_csv(index=False)}
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": f"{type(e).__name__}: {e}"}
            out[name]["sec"] = round(time.time() - t0, 2)
            ckpt.write(json.dumps({"q": name, **out[name]}) + "\n")
            ckpt.flush()
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — a dead gateway must not mask results
        pass
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    import __spark_entry__ as em
    from tools.replay_tiers import REPLAY_TIERS

    qs, osql = em.queries(), em.oracle_sql()
    # layout invariance is a SELF-compare across two physical configs —
    # no oracle needed — so the deterministic rows-only entries with
    # replay/certify tiers participate too (r10/r11). Tiers flagged
    # layout_stable=False (randomized KLL compaction) are excluded even
    # under --only: their instability is CONTRACT, not a defect — the
    # rank-bound certify tier is their correctness evidence.
    eligible = set(osql) | {
        n for n, t in REPLAY_TIERS.items() if t.get("layout_stable", True)
    }
    if only:
        # explicit --only overrides the HEAVY denylist: the caller opts in
        # knowingly (e.g. pair families on the decorrelated sf1.0dx tier,
        # where their cost is linear)
        names = [n for n in sorted(qs) if n in eligible and n in only]
    else:
        names = [n for n in sorted(qs) if n in eligible and n not in HEAVY]
    print(f"layout sweep: {len(names)} queries x {len(CONFIGS)} configs", flush=True)
    tag = os.path.basename(sf_dir.rstrip("/"))
    here = os.path.dirname(os.path.abspath(__file__))
    runs = [
        _run_all(sf_dir, conf, names, os.path.join(here, f"layout_{tag}.config{i}.scratch.jsonl"))
        for i, conf in enumerate(CONFIGS)
    ]
    log_path = os.path.join(here, f"layout_{tag}.jsonl")
    bad = []
    with open(log_path, "a") as log:
        for name in names:
            a, b = runs[0][name], runs[1][name]
            ok = a.get("repr") == b.get("repr") and "error" not in a and "error" not in b
            row = {"q": name, "stable": ok,
                   "sec": [a["sec"], b["sec"]]}
            if not ok:
                row["detail"] = {
                    "rows": [a.get("rows"), b.get("rows")],
                    "errors": [a.get("error"), b.get("error")],
                }
                bad.append(name)
                print("LAYOUT-UNSTABLE", name, row["detail"], flush=True)
            log.write(json.dumps(row) + "\n")
    for i in range(len(CONFIGS)):  # scratch only matters if we died mid-sweep
        scratch = os.path.join(here, f"layout_{tag}.config{i}.scratch.jsonl")
        if os.path.exists(scratch):
            os.remove(scratch)
    print("LAYOUT SWEEP DONE", sf_dir, "queries:", len(names), "unstable:", bad)


if __name__ == "__main__":
    main()
