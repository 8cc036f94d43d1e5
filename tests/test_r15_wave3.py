"""Round-15 third wave: the widened x1e3 ANOVA/ICC milli registers
(SCALE.md's r15 carve-out, closed in code).

- `_ha_wide_sql` is the EXACT narrow `_ha_sql` below 9e18 (so every
  committed green hash stands — A/B-verified row-for-row at sf0.01 at
  change time) and an exact 128-bit cast at/past it, where a double is
  already an integer (>= 2^53). Pinned cross-engine on literals that
  straddle the branch, including the magnitudes where the OLD BIGINT
  path overflowed.
- The isolated suff->F arithmetic agrees Spark vs DuckDB vs a plain
  Python replay on per-group statistics whose t_milli passes int64 —
  the scenario the old registers could not represent (DuckDB raised,
  non-ANSI Spark wrapped).
- `dow_anova_from_daily` end-to-end on a synthetic huge-count daily
  frame reproduces the same Python replay through the real code path
  (which also moves the streaming dow finalizer, since it shares the
  helper).
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.queries.monitor_eval import (_ha_sql,
                                                           _ha_wide_sql)


def _half_away(x: float) -> int:
    return (int(math.floor(x + 0.5)) if x >= 0
            else -int(math.floor(-x + 0.5)))


def _ha_wide_py(x: float) -> int:
    # the Python twin of _ha_wide_sql: narrow rounding below 9e18,
    # exact int conversion of the (integer-valued) double past it
    return _half_away(x) if abs(x) < 9.0e18 else int(x)


# last literals sit near the helper's 2^73 exactness contract and at
# magnitudes where double ULP is ~2^10 (so a string-mediated decimal
# cast WOULD diverge from the exact-binary value — the Spark trap the
# hi/lo decomposition avoids)
BRANCH_LITERALS = [0.0, 2.5, -2.5, 1234.5, -1234.5, 8.9e18, -8.9e18,
                   9.1e18, -9.1e18, 1.23e19, -1.23e19, 7.7e20, -7.7e20,
                   5.0e21, -5.0e21]


def test_ha_wide_cross_engine_literals(spark):
    for x in BRANCH_LITERALS:
        want = _ha_wide_py(x)
        got_duck = duckdb.sql(
            f"SELECT {_ha_wide_sql(repr(x), 'HUGEINT')} AS r").fetchone()[0]
        got_spark = spark.sql(
            f"SELECT {_ha_wide_sql(repr(x) + 'D')} AS r").collect()[0].r
        assert int(got_duck) == want, (x, got_duck, want)
        assert int(got_spark) == want, (x, got_spark, want)


def test_ha_wide_equals_narrow_below_ceiling():
    for x in [0.0, 0.49, 0.5, -0.5, 7.5, 1e6 + 0.5, 3.14e12, -2.7e15,
              8.99e18, -8.99e18]:
        narrow, wide = duckdb.sql(
            f"SELECT {_ha_sql(repr(x))} AS a,"
            f" {_ha_wide_sql(repr(x), 'HUGEINT')} AS b").fetchone()
        assert int(narrow) == int(wide), (x, narrow, wide)


# Per-dow groups with counts big enough that t_milli = s^2*1e3/n and
# 1000*qq pass int64 (c ~ 2e8 -> t_milli ~ 8e19, 1000*qq ~ 5.6e20)
# while the RAW statistics s, q stay inside it (q ~ 5.6e17 — the
# regime the design guarantees): the exact scenario the old BIGINT
# milli registers could not hold.
_HUGE_DAILY = [
    # (event_type, d, c) — 14 consecutive days, two of each weekday
    ("big", d, 200_000_000 + d * 137) for d in range(100, 114)
] + [
    ("small", d, 10 + (d * 7) % 13) for d in range(100, 114)
]


def _dow_replay(rows):
    """Plain-Python replay of dow_anova_from_daily's arithmetic
    (zero-fill is a no-op here: the day range is dense)."""
    out = {}
    for et in sorted({r[0] for r in rows}):
        series = [(d, c) for (t, d, c) in rows if t == et]
        groups = {}
        for d, c in series:
            groups.setdefault((d + 4) % 7, []).append(c)
        k = len(groups)
        nn = sum(len(v) for v in groups.values())
        qq = sum(c * c for v in groups.values() for c in v)
        b = 0
        for dow in groups:
            n = len(groups[dow])
            s = sum(groups[dow])
            b += _ha_wide_py(float(s) * float(s) * 1e3 / n)
        ss = sum(c for v in groups.values() for c in v)
        ha_tot = _ha_wide_py(float(ss) * float(ss) * 1e3 / nn)
        ssb = b - ha_tot
        ssw = 1000 * qq - b
        f = (float(ssb) / (k - 1)) / (float(ssw) / (nn - k))
        out[et] = _half_away(f * 1e6)
    return out


def test_dow_anova_huge_counts_spark_matches_python_replay(spark):
    from impractical_impala_spark.queries.hypothesis import (
        dow_anova_from_daily)

    daily = spark.createDataFrame(_HUGE_DAILY, "event_type string,"
                                  " d long, c long")
    got = {r.event_type: r.f_micro
           for r in dow_anova_from_daily(daily).collect()}
    want = _dow_replay(_HUGE_DAILY)
    assert got == want, (got, want)
    # and the huge group really is past int64 in its between-term
    # (while the raw q = sum c^2 stays inside — the designed regime)
    s_big = sum(c for (t, d, c) in _HUGE_DAILY if t == "big") / 7
    q_big = sum(c * c for (t, d, c) in _HUGE_DAILY if t == "big")
    assert s_big * s_big * 1e3 / 2 > 2 ** 63
    assert 1000 * q_big > 2 ** 63 > q_big


def test_dow_anova_huge_counts_duckdb_agrees(spark):
    """The registered oracle text (suff->agg->F over HUGEINT) computes
    the same panel from the same per-group statistics."""
    from impractical_impala_spark.queries.hypothesis import (
        _DOW_F, dow_anova_from_daily)

    con = duckdb.connect()
    con.execute("CREATE TABLE daily(event_type VARCHAR, d BIGINT,"
                " c BIGINT)")
    con.executemany("INSERT INTO daily VALUES (?, ?, ?)", _HUGE_DAILY)
    sql = f"""
WITH per AS (
    SELECT event_type, (d + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS q
    FROM daily GROUP BY 1, 2
), suff AS (
    SELECT event_type, n, s, q,
           {_ha_wide_sql("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                         "HUGEINT")} AS t_milli
    FROM per
), agg AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
           CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff GROUP BY 1
)
SELECT event_type, {_ha_sql(f"({_DOW_F}) * 1e6")} AS f_micro
FROM agg ORDER BY event_type
"""
    got_duck = dict(con.execute(sql).fetchall())
    daily_df = spark.createDataFrame(_HUGE_DAILY, "event_type string,"
                                     " d long, c long")
    got_spark = {r.event_type: r.f_micro
                 for r in dow_anova_from_daily(daily_df).collect()}
    assert {k: int(v) for k, v in got_duck.items()} == got_spark
