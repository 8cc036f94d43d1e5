"""Hypothesis property tests for the run-length operators — the engine's
most reused primitive (WDI cleaning, sessionization, O9-O12)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from impractical_impala_spark.operators.runlength import clean_runs


def _reference_clean(values, min_len):
    """Straight-line python oracle of the reference semantics
    (dtrendandstat_dlog.R:46-53): valid = not-null & >0; runs of
    consecutive valid; keep rows in runs of length >= min_len."""
    valid = [(v is not None and v > 0) for v in values]
    keep = [False] * len(values)
    i = 0
    while i < len(values):
        if valid[i]:
            j = i
            while j < len(values) and valid[j]:
                j += 1
            if j - i >= min_len:
                for k in range(i, j):
                    keep[k] = True
            i = j
        else:
            i += 1
    return keep


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-5, max_value=5,
                                       allow_nan=False)),
        min_size=1, max_size=40,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_clean_runs_matches_reference_semantics(spark_global, values, min_len):
    spark = spark_global
    rows = [(1, i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "entity int, t int, value double")
    got = clean_runs(df, ["entity"], "t", "value", min_len)
    kept_t = sorted(r["t"] for r in got.select("t").collect())
    want = [i for i, k in enumerate(_reference_clean(values, min_len)) if k]
    assert kept_t == want


# hypothesis needs a non-function-scoped fixture handle
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
