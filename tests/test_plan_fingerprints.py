"""Plan regression gate: every registered query's fingerprint — the
strategy-time plan-SHAPE counts (VERDICT r9/r10 ask #5) AND the
expression-level hash of the ANALYZED logical plan (VERDICT r13
ask #1; planfp.py:129 documents why later plan stages are not
JVM-stable) — must match the committed PLAN_FINGERPRINTS.json byte for
byte. A broadcast silently demoting to sort-merge, a new Exchange, an
Arrow kernel degrading to row-at-a-time Python, or an undeclared
expression edit (``ROUND(x,4)`` → ``x`` — the r13 gapfill rewrite
changed query VALUES without moving one byte of the shape snapshot)
now fails CI like a hash mismatch — wall-clock bench numbers are too
noisy (+-60% single-shot at sf0.1) to be the sensor for plan
regressions.

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
    assert got["shape"] == want["shape"], (
        f"{name}: plan SHAPE drifted from the committed snapshot.\n"
        f"  committed: {want['shape']}\n  current:   {got['shape']}\n"
        "If intentional, regenerate PLAN_FINGERPRINTS.json.")
    assert got["expr"] == want["expr"], (
        f"{name}: plan shape is unchanged but the EXPRESSION hash "
        "drifted — an expression-level edit (changed literal, rounding, "
        "arithmetic, or column derivation) reached this query's "
        "optimized plan.\n"
        f"  committed: {want['expr']}\n  current:   {got['expr']}\n"
        "If intentional, list the query in CHANGED_THIS_ROUND and "
        "regenerate PLAN_FINGERPRINTS.json.")


def test_expression_hash_sensitivity(spark, sf_oracle):
    """The ask's acceptance check: an expression-only edit (ROUND(x,4)
    -> x) must trip the expr hash while leaving the shape counts
    untouched, and a pure re-format (renamed locals, F.col vs string,
    split method chain) must trip neither."""
    from pyspark.sql import functions as F

    def q_round(spark, sf):
        df = spark.read.parquet(f"{sf}/lineitem.parquet")
        return df.groupBy("l_returnflag").agg(
            F.round(F.sum("l_quantity"), 4).alias("s"))

    def q_noround(spark, sf):
        df = spark.read.parquet(f"{sf}/lineitem.parquet")
        return df.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("s"))

    def q_reformat(spark, sf):
        renamed_frame = spark.read.parquet(f"{sf}/lineitem.parquet")
        grouped = renamed_frame.groupBy(F.col("l_returnflag"))
        return grouped.agg(
            F.round(F.sum(F.col("l_quantity")), 4).alias("s"))

    a = fingerprint_query(spark, q_round, sf_oracle)
    b = fingerprint_query(spark, q_noround, sf_oracle)
    c = fingerprint_query(spark, q_reformat, sf_oracle)
    assert a["expr"] != b["expr"], (
        "expression-only edit must change the expr hash")
    assert a["shape"] == b["shape"], (
        "a ROUND() drop must not move the plan-shape counts")
    assert a == c, "a pure re-format must trip neither fingerprint"
