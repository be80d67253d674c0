"""Validate the bench calibration probe across the host-load band.

VERDICT r08 #7: the probe (a fixed constant-cost in-memory aggregate
timed at bench start/end) claims to measure THIS run's host contention
so judges can normalize cross-round comparisons instead of reasoning
from the raw ~3x loadavg rule of thumb. This tool checks that claim on
real data: given two bench_history.jsonl records — one quiet, one
deliberately contended — it divides each run's per-query MEDIAN steady
times by that run's mean probe, and reports the distribution of
  ratio(q) = (t_contended(q) / probe_contended) / (t_quiet(q) / probe_quiet)
If the probe captures contention, ratios concentrate near 1.0 even when
the RAW times differ by the full load factor.

Usage: python tools/probe_normalize.py [quiet_idx contended_idx]
       (indices into bench_history.jsonl, default -2 -1)

Measured conclusion (r09, 16 spinners on 32 cores): probe factor 1.57x,
raw per-query slowdowns p10/p50/p90 = 0.94/1.12/1.44 (headline 1.48x),
probe-normalized median 0.71. The probe saturates every core; the
median sf0.1 query does not — so the probe factor is the UPPER ENVELOPE
of load-attributable slowdown (one cache-bound outlier at 2.52x
excepted), and dividing every query by it overcorrects. Judges should
treat a cross-round regression as load-attributable only up to the
run's probe factor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def load(idx_quiet: int, idx_cont: int):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.jsonl",
    )
    rows = [json.loads(x) for x in open(path) if x.strip()]
    return rows[idx_quiet], rows[idx_cont]


def main() -> None:
    iq, ic = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (-2, -1)
    quiet, cont = load(iq, ic)

    def probe(r: dict) -> float:
        return (r["calib_probe_sec"] + r["calib_probe_end_sec"]) / 2.0

    pq, pc = probe(quiet), probe(cont)
    print(
        f"quiet:     loadavg {quiet['loadavg_1m']}, probe {pq:.3f}s\n"
        f"contended: loadavg {cont['loadavg_1m']}, probe {pc:.3f}s\n"
        f"probe load factor: {pc / pq:.2f}x"
    )
    ratios = {}
    for q, tq in quiet["queries"].items():
        tc = cont["queries"].get(q)
        # sub-200ms steady times are scheduler-noise-dominated; they can't
        # test a load model (a 50ms query measures jitter, not contention)
        if tc is None or tq < 0.2 or tc < 0.2:
            continue
        ratios[q] = (tc / pc) / (tq / pq)
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    lo, hi = vals[int(0.1 * len(vals))], vals[int(0.9 * len(vals)) - 1]
    raw = statistics.median(
        cont["queries"][q] / quiet["queries"][q] for q in ratios
    )
    print(
        f"{len(vals)} queries >=0.2s on both runs\n"
        f"raw contended/quiet median: {raw:.2f}x\n"
        f"probe-normalized ratio: median {med:.2f}, p10-p90 [{lo:.2f}, {hi:.2f}]"
    )
    worst = sorted(ratios.items(), key=lambda kv: abs(kv[1] - 1), reverse=True)[:5]
    print("farthest from 1.0:", {k: round(v, 2) for k, v in worst})


if __name__ == "__main__":
    main()
