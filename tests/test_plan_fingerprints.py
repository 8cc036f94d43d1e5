"""Plan-shape regression gate (VERDICT r9/r10 ask #5): every registered
query's strategy-time physical-plan fingerprint must match the
committed PLAN_FINGERPRINTS.json byte for byte. A broadcast silently
demoting to sort-merge, a new Exchange, or an Arrow kernel degrading to
row-at-a-time Python now fails CI like a hash mismatch — wall-clock
bench numbers are too noisy (+-60% single-shot at sf0.1) to be the
sensor for plan regressions.

On a LEGITIMATE plan change (you improved a query), regenerate with
``python scripts/gen_plan_fingerprints.py`` and commit the diff — the
diff itself is then the reviewable evidence of what changed.
"""

import json
from pathlib import Path

import pytest

from impractical_impala_spark.planfp import fingerprint_query
from impractical_impala_spark.registry import all_queries

REPO = Path(__file__).resolve().parent.parent
_Q = all_queries()


def _committed() -> dict:
    return json.loads((REPO / "PLAN_FINGERPRINTS.json").read_text())


def test_snapshot_environment_matches_live(spark, sf_oracle):
    """ADVICE r11: join-strategy counts depend on data scale and Spark
    version. If the committed snapshot was generated against a
    different dataset or Spark, fail HERE with one clear config message
    instead of surfacing as hundreds of per-query 'plan drifted'
    failures."""
    snap = _committed()
    live_sf = Path(sf_oracle.rstrip("/")).name
    assert snap["sf_dir"] == live_sf, (
        f"PLAN_FINGERPRINTS.json was generated against sf_dir="
        f"{snap['sf_dir']!r} but this run uses {live_sf!r} "
        "(SPARK_GRAFT_TEST_SF mismatch) — per-query comparisons would "
        "be meaningless; regenerate or fix the env")
    assert snap["spark"] == spark.version, (
        f"PLAN_FINGERPRINTS.json was generated on Spark "
        f"{snap['spark']} but this session is {spark.version} — "
        "plan shapes are version-dependent; regenerate the snapshot")


def test_snapshot_covers_exactly_the_registry():
    snap = _committed()
    assert sorted(snap["queries"]) == sorted(_Q), (
        "PLAN_FINGERPRINTS.json rows diverge from the registry — "
        "run python scripts/gen_plan_fingerprints.py")


@pytest.mark.parametrize("name", sorted(_Q))
def test_plan_fingerprint_unchanged(name, spark, sf_oracle):
    want = _committed()["queries"][name]
    got = fingerprint_query(spark, _Q[name].build, sf_oracle)
    assert got == want, (
        f"{name}: plan shape drifted from the committed snapshot.\n"
        f"  committed: {want}\n  current:   {got}\n"
        "If intentional, regenerate PLAN_FINGERPRINTS.json.")
