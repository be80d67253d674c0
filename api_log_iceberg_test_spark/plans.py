"""Physical-plan audit utilities.

The 100-TB discipline this repo follows (pushdown reaches the scan, small
sides broadcast, windows stay partitioned, Python stays off hot paths) is
enforced by tests/test_plans.py; this module is the same inspection logic
as a reusable API, so a pipeline can assert its own plan properties at
deploy time — the programmatic form of eyeballing ``.explain("formatted")``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain string (same text as .explain('formatted'))."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _codegen_subtrees(df: DataFrame) -> int:
    """WholeStageCodegen span count. Under AQE the spans exist only in the
    FINAL adaptive plan, which materializes on first execution — before
    that this reports 0 (pass ``execute=True`` to audit_plan to force it
    with a noop write)."""
    spark = df.sparkSession
    text = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def audit_plan(df: DataFrame, execute: bool = False) -> dict[str, Any]:
    """Extract the scale-relevant facts from a physical plan.

    Returns a dict with:

    * ``scans``: list of {``read_schema``, ``pushed_filters``} per scan —
      is column pruning and predicate pushdown actually happening;
    * ``joins``: counts per physical strategy (broadcast-hash, sort-merge,
      nested-loop/cartesian — the last two are usually red flags);
    * ``exchanges``: number of Exchange nodes (each is a shuffle);
    * ``windows``: Window node count, and
      ``has_single_partition_exchange``: whether ANY operator serializes
      through one task (unpartitioned window / global limit staging);
    * ``python_eval``: True if any row-at-a-time Python evaluation node is
      present (Arrow/pandas nodes are NOT counted — they're the sanctioned
      path);
    * ``codegen_subtrees``: number of WholeStageCodegen spans (from the
      codegen explain mode — the formatted mode omits ids under AQE);
      fewer, wider spans mean more of the plan runs as generated JVM code.

    Counting is done on the numbered detail entries ("(n) NodeName"), so
    tree echoes and the adaptive Initial Plan section don't double-count.
    ``execute=True`` collects the frame once first, so the audit reads the
    FINAL adaptive plan (codegen spans, AQE join demotions) instead of the
    initial one — use on test-scale data only. (A noop sink wouldn't do:
    writes plan a SEPARATE command execution, leaving this frame's own
    adaptive plan unfinalized.)
    """
    if execute:
        df.collect()
    plan = formatted_plan(df)
    # a finalized AQE plan prints BOTH trees ("Final Plan" + "Initial
    # Plan") with separately-numbered detail entries — count only the ids
    # that appear in the final tree, or everything when no AQE sections
    fin = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.S)
    live_ids = set(re.findall(r"\((\d+)\)", fin.group(1))) if fin else None

    def node(name: str) -> int:
        entries = re.findall(rf"\((\d+)\) {name}\b", plan)
        return len([i for i in entries if live_ids is None or i in live_ids])

    scans = []
    for m in re.finditer(r"\((\d+)\) Scan [^\n]*\n(?:[^\n]*\n)*?(?=\n\(|\Z)", plan):
        if live_ids is not None and m.group(1) not in live_ids:
            continue
        block = m.group(0)
        rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        scans.append(
            {
                "read_schema": [c.split(":")[0] for c in rs.group(1).split(",") if c]
                if rs
                else [],
                "pushed_filters": [f.strip() for f in pf.group(1).split(",") if f.strip()]
                if pf
                else [],
            }
        )
    return {
        "scans": scans,
        "joins": {
            "broadcast_hash": node("BroadcastHashJoin"),
            "sort_merge": node("SortMergeJoin"),
            "shuffled_hash": node("ShuffledHashJoin"),
            "nested_loop": node("BroadcastNestedLoopJoin") + node("CartesianProduct"),
        },
        "exchanges": node("Exchange"),
        "windows": node("Window"),
        "has_single_partition_exchange": "SinglePartition" in plan,
        "python_eval": "BatchEvalPython" in plan,
        "codegen_subtrees": _codegen_subtrees(df),
    }
