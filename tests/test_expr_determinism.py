"""Two-seed expr-fingerprint determinism gate (VERDICT r14 ask #1).

The r14 TE/Granger IN-list flip (commit 8ed16cc) was one instance of a
CLASS: any query builder that iterates a Python set/dict of strings
into plan text (IN-lists, unrolled unions, generated column lists)
produces an ANALYZED plan whose expression order follows
PYTHONHASHSEED, making the expr fingerprint flaky across sessions.
The repo-wide audit (r15) found every IN-list/column-list constant is
a tuple/list and the two known set-comprehension sites are sorted();
this test PINS that state: regenerate expr hashes in two SEPARATE
subprocesses (fresh interpreter — PYTHONHASHSEED only binds at
startup — and fresh JVM, which is what exposed the
MultiCommutativeOp Class-hashCode ordering) under different seeds and
require all 408 to agree with each other AND with the committed
snapshot.

Cost: the two subprocesses run CONCURRENTLY and compute analyzed-plan
hashes only (no optimization/physical planning), ~4-5 min wall.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SEEDS = ("101", "202")


def test_expr_hashes_identical_across_hashseeds(tmp_path, sf_oracle):
    procs = []
    for seed in SEEDS:
        out = tmp_path / f"expr_{seed}.json"
        env = dict(
            os.environ,
            PYTHONHASHSEED=seed,
            SPARK_GRAFT_TEST_SF=sf_oracle,
            SPARK_GRAFT_TEST_CPUS="8",
        )
        procs.append((seed, out, subprocess.Popen(
            [sys.executable,
             str(REPO / "scripts" / "expr_fingerprints.py"), str(out)],
            env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)))
    for seed, out, p in procs:
        rc = p.wait(timeout=3600)
        assert rc == 0, f"expr_fingerprints.py failed under seed {seed}"
    hashes = {seed: json.loads(out.read_text())["expr"]
              for seed, out, _ in procs}
    a, b = (hashes[s] for s in SEEDS)
    assert sorted(a) == sorted(b)
    flaky = sorted(n for n in a if a[n] != b[n])
    assert flaky == [], (
        "expr fingerprints differ between PYTHONHASHSEED runs — these "
        "query builders leak Python hash order into plan text (check "
        f"set/dict iteration feeding F.expr/SQL/column lists): {flaky}")
    committed = json.loads(
        (REPO / "PLAN_FINGERPRINTS.json").read_text())["queries"]
    stale = sorted(n for n in a if committed.get(n, {}).get("expr") != a[n])
    assert stale == [], (
        "seed-stable expr hashes disagree with the committed snapshot "
        f"(regenerate PLAN_FINGERPRINTS.json?): {stale}")
