#!/usr/bin/env python
"""Pre-verify queries exactly the way the correctness driver does:
through ``__spark_entry__.queries()`` / ``oracle_sql()`` (NOT the
registry or pytest), comparing each Spark result against its DuckDB
oracle at sf0.01 and emitting CORRECTNESS-SHAPED rows.

The value comparison here is rtol/atol 1e-9, so the field is named
``values_match`` — NOT ``hash_match`` — because the real driver's
hash_match is an exact-content check (ADVICE r12: sim rows must never
be confusable with driver hash evidence; window.py reads only
CORRECTNESS_r*.json, and these rows carry no hash_match key at all).
``values_exact`` reports the strict no-tolerance comparison as a
secondary signal.

Usage:
    python scripts/driver_sim.py                # the computed window
    python scripts/driver_sim.py name1 name2    # specific queries
    SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 python scripts/driver_sim.py

Exit status is non-zero if any row is not hash-green, so this can gate
a round close.
"""

import json
import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from oracle_harness import _normalize, run_duckdb

    from impractical_impala_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        from impractical_impala_spark.queries import WINDOW
        names = list(WINDOW)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"not in queries(): {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    bad: list[str] = []
    for i, name in enumerate(names, 1):
        row = {"rows_match": None, "schema_match": None,
               "values_match": None, "values_exact": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            got = qs[name](spark, sf).toPandas()
            row["spark_rows"] = len(got)
            if name not in oracles:
                row["err"] = "no_oracle"
            else:
                want = run_duckdb(oracles[name], sf)
                row["oracle_rows"] = len(want)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = sorted(got.columns) == sorted(
                    want.columns)
                if row["rows_match"] and row["schema_match"]:
                    g, w = _normalize(got), _normalize(want)
                    row["values_match"] = _values_equal(g, w)
                    row["values_exact"] = _values_equal(
                        g, w, rtol=0.0, atol=0.0)
                else:
                    row["values_match"] = False
                    row["values_exact"] = False
        except Exception as exc:  # noqa: BLE001 — driver records errors
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = row
        green = row["values_match"] is True
        if not green:
            bad.append(name)
        print(f"[{i:3d}/{len(names)}] {'PASS' if green else 'FAIL'} {name}",
              file=sys.stderr)
    spark.stop()

    json.dump(out, sys.stdout, indent=1)
    print()
    if bad:
        print(f"NOT GREEN ({len(bad)}): {bad}", file=sys.stderr)
        return 1
    print(f"all {len(names)} values-green at {sf}", file=sys.stderr)
    return 0


def _values_equal(g: list[tuple], w: list[tuple],
                  rtol: float = 1e-9, atol: float = 1e-9) -> bool:
    if len(g) != len(w):
        return False
    for rg, rw in zip(g, w):
        if len(rg) != len(rw):
            return False
        for a, b in zip(rg, rw):
            if a is None or b is None:
                if a is not b:
                    return False
            elif isinstance(a, float) or isinstance(b, float):
                try:
                    fa, fb = float(a), float(b)
                except (TypeError, ValueError):
                    return False
                if math.isnan(fa) != math.isnan(fb):
                    return False
                if not math.isnan(fa) and not math.isclose(
                        fa, fb, rel_tol=rtol, abs_tol=atol):
                    return False
            elif a != b:
                return False
    return True


if __name__ == "__main__":
    sys.exit(main())
