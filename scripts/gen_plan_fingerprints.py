#!/usr/bin/env python
"""Generate PLAN_FINGERPRINTS.json: one strategy-time plan-shape
fingerprint per registered query (impractical_impala_spark/planfp.py).
Regenerate whenever a query's plan legitimately changes; CI
(tests/test_plan_fingerprints.py) fails on any drift from the committed
snapshot."""

import json
import os
import sys
from pathlib import Path

# Anchor both the import path and the output path to the repo root, not
# the CWD (ADVICE r11: run from elsewhere, the old CWD-relative version
# silently wrote a snapshot nowhere CI looks).
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from impractical_impala_spark.planfp import fingerprint_query  # noqa: E402
from impractical_impala_spark.registry import all_queries  # noqa: E402
from impractical_impala_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("plan-fingerprints",
                      cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {}
    for i, (name, q) in enumerate(sorted(qs.items()), 1):
        out[name] = fingerprint_query(spark, q.build, SF_DIR)
        if i % 50 == 0:
            print(f"  {i}/{len(qs)}", file=sys.stderr)
    doc = {
        "note": "per registered query: 'shape' = strategy-time "
                "plan-shape counts, 'expr' = sha256 of the ANALYZED "
                "logical plan's expressions (VERDICT r13 ask #1 — trips "
                "on expression-only edits the shape counts cannot see; "
                "analyzed, not optimized/canonicalized: planfp.py:129 "
                "documents the JVM-order hazards in later stages); "
                "regenerate with python scripts/gen_plan_fingerprints.py",
        "sf_dir": os.path.basename(SF_DIR.rstrip("/")),
        "spark": spark.version,
        "queries": out,
    }
    with open(REPO / "PLAN_FINGERPRINTS.json", "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {REPO / 'PLAN_FINGERPRINTS.json'} for {len(out)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
