#!/usr/bin/env python
"""Measure the same-code bench anchor (VERDICT r7 ask #2).

Re-runs a PRIOR round's committed bench in a git worktree under
current host conditions and records the per-query and total drift
against the numbers that round committed in its BENCH_DETAIL.json.
Because the code is identical, any systematic ratio is host Spark-path
throughput drift — the quantity to divide out before calling a
round-over-round bench delta a plan regression. bench.py embeds the
resulting BENCH_ANCHOR.json in every subsequent bench artifact.

Protocol (same as any bench run): no other Spark session may run
while this measures.

Usage: python scripts/bench_anchor.py [commit]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# round-10 driver bench commit: its BENCH_DETAIL.json carries the
# per-query numbers the driver measured on the code at exactly that
# commit (all 311 headline queries — full overlap with current rounds,
# vs 128 for the older r7 anchor 15b547f).
DEFAULT_COMMIT = "7dd8cf0"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    commit = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_COMMIT
    full = subprocess.run(["git", "rev-parse", commit], cwd=REPO,
                          capture_output=True, text=True,
                          check=True).stdout.strip()
    wt = f"/tmp/bench_anchor_{full[:12]}"
    subprocess.run(["git", "worktree", "add", "--detach", wt, full],
                   cwd=REPO, check=True)
    try:
        with open(os.path.join(wt, "BENCH_DETAIL.json")) as f:
            recorded = json.load(f)
        env = dict(os.environ)
        subprocess.run([sys.executable, "bench.py"], cwd=wt, env=env,
                       check=True,
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        with open(os.path.join(wt, "BENCH_DETAIL.json")) as f:
            rebench = json.load(f)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, check=True)

    rec_q, new_q = recorded["queries"], rebench["queries"]
    common = sorted(set(rec_q) & set(new_q))
    rec_total = round(sum(rec_q[q] for q in common), 4)
    new_total = round(sum(new_q[q] for q in common), 4)
    anchor = {
        "anchor_commit": full[:12],
        "n_common_queries": len(common),
        "recorded_total_sec": rec_total,
        "rebench_total_sec": new_total,
        "drift_ratio": round(new_total / rec_total, 4),
        "recorded_cpu_ref_sec": recorded.get("cpu_ref_sec"),
        "rebench_cpu_ref_sec": rebench.get("cpu_ref_sec"),
        "recorded_cpu_ref_par_sec": recorded.get("cpu_ref_par_sec"),
        "rebench_cpu_ref_par_sec": rebench.get("cpu_ref_par_sec"),
        "per_query_ratio": {
            q: round(new_q[q] / rec_q[q], 4) if rec_q[q] else None
            for q in common},
    }
    out = os.path.join(REPO, "BENCH_ANCHOR.json")
    with open(out, "w") as f:
        json.dump(anchor, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in anchor.items()
                      if k != "per_query_ratio"}))


if __name__ == "__main__":
    main()
