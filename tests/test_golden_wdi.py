"""Reference parity: run the four pipelines on the reference's committed
WDI inputs and compare all 28 outputs cell-by-cell against the goldens
(tolerance 1e-9 relative — SURVEY.md §5.1)."""

import csv
import math
import os

import pytest

from impractical_impala_spark.plans import wdi

REF = "/root/reference"

GOLDEN_KEYS = {
    "sd_by_country": ["Country Code", "Region"],
    "sd_by_region": ["Region"],
    "sd_ratio_by_region": ["Region"],
    "corr_by_country": ["Country Code", "Region"],
    "corr_by_region": ["Region"],
    "acf_by_country": ["Country Code", "Region"],
    "acf_by_region": ["Region"],
}


def _read_golden(name):
    with open(os.path.join(REF, f"{name}.csv"), newline="") as fh:
        return list(csv.DictReader(fh))


def _as_float(s):
    if s is None or s == "" or s == "NA":
        return None
    v = float(s)
    return None if math.isnan(v) else v


@pytest.fixture(scope="module")
def wide(spark):
    df = wdi.build_wide(spark, REF).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("method", wdi.METHODS)
def test_method_matches_goldens(spark, wide, method):
    outputs = wdi.method_outputs(spark, method, wide)
    for name, df in outputs.items():
        family = name.rsplit(f"_{method}", 1)[0]
        keys = GOLDEN_KEYS[family]
        golden = _read_golden(name)
        got = {tuple(r[k] for k in keys): r
               for r in (row.asDict() for row in df.collect())}
        assert len(got) == len(golden), f"{name}: row count {len(got)} vs {len(golden)}"
        value_cols = [c for c in golden[0] if c not in keys]
        assert set(value_cols) <= set(df.columns), (
            f"{name}: missing columns {set(value_cols) - set(df.columns)}"
        )
        for grow in golden:
            key = tuple(grow[k] for k in keys)
            assert key in got, f"{name}: missing key {key}"
            mine = got[key]
            for c in value_cols:
                want = _as_float(grow[c])
                have = mine[c]
                have = None if (have is None or (isinstance(have, float) and math.isnan(have))) else have
                if want is None:
                    assert have is None, f"{name} {key} {c}: got {have}, want NA"
                else:
                    assert have is not None, f"{name} {key} {c}: got NA, want {want}"
                    assert math.isclose(have, want, rel_tol=1e-9, abs_tol=1e-9), (
                        f"{name} {key} {c}: got {have!r}, want {want!r}"
                    )


def test_region_dim_matches_goldens():
    """The embedded WB region dim agrees with the reference's countrycode
    lookup on every surviving country."""
    for row in _read_golden("sd_by_country_hp"):
        assert wdi.REGION_BY_CODE[row["Country Code"]] == row["Region"]


def test_region_dim_covers_full_wb_list():
    """Non-reference WB economies must resolve too (round-1 verdict:
    shipping only the 62 reference codes silently nulls the region for
    any added country)."""
    want = {
        "DEU": "Europe & Central Asia",
        "IND": "South Asia",
        "USA": "North America",
        "EGY": "Middle East & North Africa",
        "JPN": "East Asia & Pacific",
        "JAM": "Latin America & Caribbean",
        "XKX": "Europe & Central Asia",   # WB-specific code (Kosovo)
    }
    for code, region in want.items():
        assert wdi.REGION_BY_CODE[code] == region
    assert len(wdi.REGION_BY_CODE) >= 210
    # exactly the 7 WB regions, spelled the way countrycode emits them
    assert set(wdi.REGION_BY_CODE.values()) == {
        "East Asia & Pacific", "Europe & Central Asia",
        "Latin America & Caribbean", "Middle East & North Africa",
        "North America", "South Asia", "Sub-Saharan Africa",
    }
