"""Unit semantics of the as-of join operator (strict/non-strict, ties,
unmatched probes)."""

from impractical_impala_spark.operators.asof import asof_join


def _run(spark, strict):
    probe = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "v", 50)],
        "pid int, k string, pt int",
    )
    ref = spark.createDataFrame(
        [(100, "u", 10), (101, "u", 15), (102, "w", 1)],
        "rid int, k string, rt int",
    )
    out = asof_join(probe, ref, on=["k"], probe_time="pt", ref_time="rt",
                    ref_cols={"rid": "matched_rid", "rt": "matched_rt"},
                    strict=strict)
    return {r.pid: (r.matched_rid, r.matched_rt) for r in out.collect()}


def test_asof_non_strict(spark):
    got = _run(spark, strict=False)
    assert got[1] == (100, 10)      # equal time matches
    assert got[2] == (101, 15)      # most recent prior
    assert got[3] == (None, None)   # nothing at or before t=5
    assert got[4] == (None, None)   # key with no reference rows


def test_asof_strict(spark):
    got = _run(spark, strict=True)
    assert got[1] == (None, None)   # equal time excluded when strict
    assert got[2] == (101, 15)


def test_asof_plan_is_single_shuffle(spark):
    probe = spark.range(100).selectExpr("id AS pid", "id % 5 AS k", "id AS pt")
    ref = spark.range(50).selectExpr("id AS rid", "id % 5 AS k", "id AS rt")
    out = asof_join(probe, ref, ["k"], "pt", "rt", {"rid": "m"})
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE repeats the plan
    assert final.count("Exchange hashpartitioning") == 1
    assert "Join" not in final  # composed from union + window, no join node


def test_asof_tied_ref_times_deterministic(spark):
    """Several reference rows sharing (key, ref_time): the carried row
    must be the one whose ref_cols struct sorts greatest, regardless of
    input order or partitioning (ADVICE round 1: without a tie-break
    the LOCF pick flaps with shuffle order)."""
    probe = spark.createDataFrame([(1, "u", 10)], "pid int, k string, pt int")
    tied = [(103, "u", 10), (101, "u", 10), (102, "u", 10)]
    for perm in (tied, tied[::-1], [tied[1], tied[2], tied[0]]):
        ref = spark.createDataFrame(perm, "rid int, k string, rt int") \
            .repartition(4)
        out = asof_join(probe, ref, on=["k"], probe_time="pt",
                        ref_time="rt", ref_cols={"rid": "m"})
        assert [r.m for r in out.collect()] == [103]
