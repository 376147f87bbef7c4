"""Aggregate sweep results: success rates, makespan CIs, plots.

Reference parity: ``experiments/python/metrics/Statistics.py`` (aggregate
plots across num_robots) + ``ComputeCI.py`` (95% CI with inf-robust
variants).

Usage:
  python -m mpc_cbf_tpu.apps.statistics --results /tmp/sweep.jsonl \
      [--plot /tmp/stats.png]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np

from mpc_cbf_tpu.utils.metrics import ci95_with_inf


def load_rows(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def aggregate(rows):
    """Group by (controller, num_robots); returns sorted summary dicts."""
    groups = defaultdict(list)
    for r in rows:
        groups[(r.get("controller", "?"), r["num_robots"])].append(r)
    out = []
    for (ctrl, R), g in sorted(groups.items()):
        mk = np.asarray([r["makespan"] for r in g], dtype=float)
        mean, half = ci95_with_inf(mk[None])  # row-wise API (ComputeCI parity)
        mean, half = mean[0], half[0]
        out.append({
            "controller": ctrl, "num_robots": R, "n": len(g),
            "success_rate": sum(r["success"] for r in g) / len(g),
            "makespan_mean": float(mean), "makespan_ci95": float(half),
        })
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True, help="sweep JSONL file")
    p.add_argument("--plot", default=None)
    args = p.parse_args(argv)

    summary = aggregate(load_rows(args.results))
    hdr = f"{'controller':>14} {'R':>3} {'n':>3} {'success':>8} {'makespan':>9} {'ci95':>7}"
    print(hdr)
    for s in summary:
        print(f"{s['controller']:>14} {s['num_robots']:>3} {s['n']:>3} "
              f"{s['success_rate']:>8.2f} {s['makespan_mean']:>9.2f} "
              f"{s['makespan_ci95']:>7.2f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ctrls = sorted({s["controller"] for s in summary})
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.5))
        for c in ctrls:
            pts = [s for s in summary if s["controller"] == c]
            R = [s["num_robots"] for s in pts]
            ax1.plot(R, [s["success_rate"] for s in pts], "o-", label=c)
            ax2.errorbar(R, [s["makespan_mean"] for s in pts],
                         yerr=[s["makespan_ci95"] for s in pts],
                         fmt="o-", capsize=3, label=c)
        ax1.set_xlabel("num robots"); ax1.set_ylabel("success rate")
        ax1.set_ylim(-0.05, 1.05); ax1.grid(alpha=0.3); ax1.legend(fontsize=8)
        ax2.set_xlabel("num robots"); ax2.set_ylabel("makespan [s]")
        ax2.grid(alpha=0.3)
        fig.savefig(args.plot, dpi=130, bbox_inches="tight")
        print(args.plot)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
