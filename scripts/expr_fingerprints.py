#!/usr/bin/env python
"""Dump expression-only fingerprints for every registered query.

Support script for the two-seed determinism gate (VERDICT r14 ask #1):
``tests/test_expr_determinism.py`` runs this twice in SEPARATE
subprocesses with different ``PYTHONHASHSEED`` values and asserts all
expr hashes are identical between the two runs (and equal to the
committed ``PLAN_FINGERPRINTS.json``). Any query builder that iterates
a Python set/dict of strings into plan text (IN-lists, unrolled
unions, generated column lists) flips its ANALYZED plan between seeds
and fails here — the class of bug the r14 TE/Granger IN-list fix
(commit 8ed16cc) was one instance of. A separate process per seed is
essential: PYTHONHASHSEED only takes effect at interpreter start, and
JVM-side ordering hazards (the MultiCommutativeOp Class-hashCode
ordering planfp.py documents) only vary across JVMs.

Computes ONLY the expr hash (analyzed logical plan — no optimization,
no physical planning), so a full-registry pass is several times
cheaper than scripts/gen_plan_fingerprints.py.

Usage: python scripts/expr_fingerprints.py OUT.json
"""

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from impractical_impala_spark.planfp import expression_fingerprint  # noqa: E402
from impractical_impala_spark.registry import all_queries  # noqa: E402
from impractical_impala_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def main() -> None:
    out_path = Path(sys.argv[1])
    # own managed-table warehouse per process: concurrent seed runs
    # must not race on ./spark-warehouse (bucketed_join_segments
    # saveAsTable hits LOCATION_ALREADY_EXISTS otherwise)
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE_DIR",
                          tempfile.mkdtemp(prefix="iis-wh-"))
    spark = get_spark("expr-fingerprints",
                      cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {}
    for i, (name, q) in enumerate(sorted(qs.items()), 1):
        # same clean-cache discipline as fingerprint_query: a prior
        # query's .cache() must not substitute fragments of this plan
        spark.catalog.clearCache()
        out[name] = expression_fingerprint(q.build(spark, SF_DIR))
        if i % 50 == 0:
            print(f"  {i}/{len(qs)}", file=sys.stderr)
    doc = {"hashseed": os.environ.get("PYTHONHASHSEED", "random"),
           "sf_dir": os.path.basename(SF_DIR.rstrip("/")),
           "spark": spark.version,
           "expr": out}
    out_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out_path} for {len(out)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
