"""10x scaling report: per-query steady-time ratios between an sf0.1
bench record and an sf1.0 one (same host, quiet runs).

The 100 TB question — "does any operator go super-linear when the data
grows and the cores don't?" — gets a measured answer: on a FIXED
local[32] box, 10x the rows should cost at most ~10x the time for a
scan-bound linear operator (usually much less: fixed per-query overhead
— session, planning, task launch — dominates sub-second sf0.1 times).
A ratio WELL past 10x flags super-linear work (pair explosion, ranks
growing past memory, a broadcast flipping to shuffle) — exactly what
must not survive to a 1000-executor cluster.

Probe times ride along so a contended run can be discounted (see
tools/probe_normalize.py: the probe factor is the upper envelope of
load-attributable slowdown).

Usage: python tools/scaling_report.py [sf01_idx sf10_idx]
       (bench_history.jsonl indices; defaults: latest sf=0.1 and
        latest sf=1.0 records)
       python tools/scaling_report.py --compare-sf 1.0
       (same-SF cross-ROUND comparison: the two most recent records at
        that SF, per-query ratios judged against the probe envelope —
        turns the one-off sf1.0 measurement into a standing cadence
        with a variance band, VERDICT r09 #2)

Measured (r09, sf1.0dx via the dx-sf1.0 symlink, quiet host, repeats=2):
139 queries, 10x-data ratio p10/median/p90 = 1.05/1.91/5.60 — fixed
per-query overhead dominates at sf0.1, so most queries are strongly
sub-linear in wall time. ONE flag: q_range_join_nearby_events at 41.9x
(0.67s -> 28.2s) — verified OUTPUT-BOUND, not a plan flaw: the time
window is fixed while row density grows 10x, so qualifying pairs grow
quadratically in density (measured 458,535 -> 46,109,978 pairs =
100.6x), and 100.6x output in 41.9x time is 0.44x per-pair cost. At
100 TB the operator's cost is driven by the pair budget the caller
chooses (band width / time radius), which is the correct contract for
a range join; a count-only consumer collapses the pairs map-side
(3.8s at sf1.0dx).

Re-measured (r13, quiet pair: sf0.1 headline 12.51s probe 0.42 /
dx-sf1.0 headline 67.94s probe 0.524, post cache-retirement layout
family): 142 queries, ratio p10/median/p90 = 1.12/1.98/5.23; the single
>10x flag is still q_range_join_nearby_events (43.6x, the documented
output-bound case above). No new super-linear operator appeared across
the round's plan changes.

Re-measured (r14, quiet pair: sf0.1 headline 15.47s probe 0.325 /
dx-sf1.0 headline 68.16s probe 0.345, post when-tree bucket lookup +
\\z anchors): 143 queries, ratio p10/median/p90 = 1.02/1.92/4.53; the
single >10x flag is unchanged (q_range_join_nearby_events 44.0x,
output-bound). Cross-round sf1.0 compare vs r13's 67.94s: median
per-query ratio 1.01 over 142 common entries, none past the probe
envelope — the round's plan changes are flat at 10x data. The new
q_lineterm_tokens scales 0.90s -> 3.60s (4.0x for 10x rows).
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def compare_same_sf(rows: list[dict], sf: float) -> None:
    """Cross-round, same-SF comparison of the two latest records.

    The probe-factor rule (tools/probe_normalize.py) applied pairwise:
    a per-query ratio between two runs is load-attributable while it
    stays inside the runs' probe-factor ratio envelope; ratios past the
    envelope (with margin) name real tree changes. repeats=1 records
    are noisier — prefer repeats>=2 for reference levels.
    """
    at = [r for r in rows if r.get("sf") == sf and r.get("repeats", 1) >= 2]
    if len(at) < 2:
        print(f"need >=2 records at sf={sf} with repeats>=2; have {len(at)}")
        return
    a, b = at[-2], at[-1]
    probe_ratio = b["calib_probe_sec"] / a["calib_probe_sec"]
    print(
        f"sf={sf} prev: headline {a['value']}s loadavg {a['loadavg_1m']} "
        f"probe {a['calib_probe_sec']}s | latest: headline {b['value']}s "
        f"loadavg {b['loadavg_1m']} probe {b['calib_probe_sec']}s | "
        f"probe envelope {probe_ratio:.2f}x"
    )
    ratios = {
        q: b["queries"][q] / t
        for q, t in a["queries"].items()
        if q in b["queries"] and t >= 0.1
    }
    vals = sorted(ratios.values())
    print(
        f"{len(vals)} queries; latest/prev ratio "
        f"p10 {vals[int(0.1 * len(vals))]:.2f} / "
        f"median {statistics.median(vals):.2f} / "
        f"p90 {vals[int(0.9 * len(vals)) - 1]:.2f}"
    )
    # 1.25 margin over the envelope before a delta names a real change
    # (sub-second queries carry scheduling noise the probe can't see)
    flag = max(probe_ratio, 1 / probe_ratio) * 1.25
    over = {
        q: round(r, 2) for q, r in ratios.items() if r > flag and b["queries"][q] > 1.0
    }
    print(
        f"past the envelope (> {flag:.2f}x and >1s at {sf}):",
        dict(sorted(over.items(), key=lambda kv: -kv[1])) or "none",
    )
    baskets = sorted(k for k in b if k.startswith("total_") and k in a)
    for k in baskets:
        print(f"  {k}: {a[k]} -> {b[k]}")


def main() -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.jsonl",
    )
    rows = [json.loads(x) for x in open(path) if x.strip()]
    if "--compare-sf" in sys.argv:
        compare_same_sf(rows, float(sys.argv[sys.argv.index("--compare-sf") + 1]))
        return
    if len(sys.argv) > 2:
        a, b = rows[int(sys.argv[1])], rows[int(sys.argv[2])]
    else:
        a = next(r for r in reversed(rows) if r.get("sf") == 0.1)
        b = next(r for r in reversed(rows) if r.get("sf") == 1.0)
    print(
        f"sf0.1: headline {a['value']}s loadavg {a['loadavg_1m']} "
        f"probe {a['calib_probe_sec']}s\n"
        f"sf1.0: headline {b['value']}s loadavg {b['loadavg_1m']} "
        f"probe {b['calib_probe_sec']}s"
    )
    ratios = {}
    for q, t1 in a["queries"].items():
        t10 = b["queries"].get(q)
        # sub-100ms sf0.1 times are all fixed overhead; their ratio says
        # nothing about data scaling
        if t10 is None or t1 < 0.1:
            continue
        ratios[q] = t10 / t1
    vals = sorted(ratios.values())
    print(
        f"{len(vals)} queries; 10x-data time ratio "
        f"p10 {vals[int(0.1 * len(vals))]:.2f} / "
        f"median {statistics.median(vals):.2f} / "
        f"p90 {vals[int(0.9 * len(vals)) - 1]:.2f}"
    )
    over = {q: round(r, 1) for q, r in ratios.items() if r > 10.0}
    print(
        "super-linear (>10x):",
        dict(sorted(over.items(), key=lambda kv: -kv[1])) or "none",
    )
    top = sorted(
        ((b["queries"][q], q) for q in ratios), reverse=True
    )[:8]
    print("slowest at sf1.0:", [(q, t) for t, q in top])


if __name__ == "__main__":
    main()
