"""Correctness under group scale-up: the WDI hp pipeline must produce
IDENTICAL per-entity statistics when the panel is replicated 50x with
distinct country codes (2,250 entities) — per-group kernels and
aggregations cannot leak across groups, and the plan shape must not
degrade with group count (same single country-keyed exchange)."""

import math

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.plans import wdi

REF = "/root/reference"
K = 50


@pytest.fixture(scope="module")
def replicated_outputs(spark):
    wide = wdi.build_wide(spark, REF)
    reps = None
    for i in range(K):
        r = wide.withColumn(
            "Country Code", F.concat(F.col("Country Code"), F.lit(f"_{i:02d}"))
        )
        reps = r if reps is None else reps.unionByName(r)
    outs = wdi.method_outputs(spark, "hp", reps.cache())
    return outs["sd_by_country_hp"].collect()


def test_replicas_match_original(spark, replicated_outputs):
    wide = wdi.build_wide(spark, REF)
    base = {
        r["Country Code"]: r.asDict()
        for r in wdi.method_outputs(spark, "hp", wide)["sd_by_country_hp"].collect()
    }
    got = replicated_outputs
    assert len(got) == K * len(base)
    stat_cols = ["sd_Y", "sd_C", "sd_I", "sd_TB", "sdC_over_sdY", "sdI_over_sdY"]
    for row in got:
        code, rep = row["Country Code"].rsplit("_", 1)
        want = base[code]
        for c in stat_cols:
            a, b = row[c], want[c]
            if b is None or (isinstance(b, float) and math.isnan(b)):
                assert a is None or (isinstance(a, float) and math.isnan(a))
            else:
                assert math.isclose(a, b, rel_tol=1e-12), (row["Country Code"], c, a, b)
