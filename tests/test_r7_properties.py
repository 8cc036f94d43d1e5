"""Property-based tests (hypothesis) for the round-7 pure kernels —
the pieces whose correctness does NOT need a SparkSession: the
truncating-division fixed-point folds, the bootstrap PRNG and the
rank/pair identities. Randomized inputs catch the edge cases the
fixture never produces (negative trends, all-equal series, single
groups, adversarial tie patterns)."""

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from impractical_impala_spark.queries.forecast import (
    HW_SEASON, _trunc_div, hw_fit)

ints = st.integers(min_value=-10**9, max_value=10**9)


@given(st.integers(min_value=-10**15, max_value=10**15),
       st.integers(min_value=1, max_value=10**9))
def test_trunc_div_matches_c_semantics(a, b):
    """_trunc_div == C-style truncation (Spark div / DuckDB //):
    q = sign(a/b) * (|a| // |b|), and |remainder| < |b| with the
    remainder carrying the numerator's sign."""
    q = _trunc_div(a, b)
    if abs(a) < 2**52:  # float division is exact here
        assert q == int(a / b)
    r = a - q * b
    assert abs(r) < b
    assert r == 0 or (r > 0) == (a > 0)


@given(st.lists(st.integers(min_value=0, max_value=10**7),
                min_size=HW_SEASON + 1, max_size=60))
@settings(max_examples=200)
def test_hw_fit_state_bounded_and_fitted_consistent(ys):
    """On any non-negative series: the fold emits exactly
    len(ys) - 7 rows, fitted_t is the PRE-update state prediction
    (level+trend+seasonal of the previous step), and the level stays
    inside the series' envelope (the 1/2-smoothing contraction keeps
    the state from diverging)."""
    rows = hw_fit(ys)
    assert len(rows) == len(ys) - HW_SEASON
    lo, hi = min(ys), max(ys)
    spread = hi - lo + 1
    for (t, lvl, b, s, fitted) in rows:
        # level is a convex-ish combination of observations: generous
        # envelope (the seasonal can push it one spread outside)
        assert lo - 2 * spread <= lvl <= hi + 2 * spread, (t, lvl)
    # re-run is deterministic
    assert rows == hw_fit(ys)


@given(st.lists(st.integers(min_value=0, max_value=10**7),
                min_size=HW_SEASON + 1, max_size=40))
@settings(max_examples=100)
def test_hw_fit_constant_series_is_flat(ys):
    """A CONSTANT series must yield zero trend and (near-)zero
    seasonal/residual after the first step — the smoother's fixed
    point. (Truncation can leave a +/-1 wobble on non-multiples.)"""
    c = ys[0]
    const = [c] * len(ys)
    for (t, lvl, b, s, fitted) in hw_fit(const):
        assert abs(lvl - c) <= 4
        assert abs(b) <= 2
        assert abs(s) <= 4
        assert abs(fitted - c) <= 8


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 30)),
                min_size=3, max_size=120))
@settings(max_examples=60)
def test_prefix_sum_concordance_identity(pairs):
    """The 2D-prefix-sum concordance count (lineitem_kendall_tau's
    decomposition) equals brute force on any integer point multiset."""
    cells = Counter(pairs)
    xs = sorted({x for x, _ in cells})
    ys_ = sorted({y for _, y in cells})
    # C via A(i,j) = #points strictly dominated, counted at the cell
    C_grid = 0
    for (x, y), g in cells.items():
        a = sum(g2 for (x2, y2), g2 in cells.items()
                if x2 < x and y2 < y)
        C_grid += g * a
    pts = list(pairs)
    C_brute = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx * dy > 0:
                C_brute += 1
    assert C_grid == C_brute


@given(st.integers(min_value=1, max_value=2**45),
       st.integers(min_value=0, max_value=63))
def test_bootstrap_uniform_range_and_determinism(key, r):
    """The xorshift-mixed uniform stays in [0, 1e6) for any key
    magnitude (the mod-2^31 reduction path) and is a pure function."""
    from tests.test_r7_kernels import _boot_u
    u = _boot_u(key, r)
    assert 0 <= u < 1_000_000
    assert u == _boot_u(key, r)


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=2, max_size=200))
@settings(max_examples=100)
def test_faulhaber_range_sums_match_direct(ys):
    """The division-free Faulhaber run sums used by lineitem_lmoments
    (s1x2 = 2*sum(i-1), s2x3 = 3*sum (i-1)(i-2) over a rank run) match
    direct summation for every (offset, count) decomposition of a
    sorted sample."""
    ys = sorted(ys)
    runs = Counter(ys)
    a = 0
    for v in sorted(runs):
        c = runs[v]
        s1x2 = c * (2 * a + c - 1)
        s2x3 = ((a + c) * (a + c - 1) * (a + c - 2)
                - a * (a - 1) * (a - 2))
        direct1 = 2 * sum(i - 1 for i in range(a + 1, a + c + 1))
        direct2 = 3 * sum((i - 1) * (i - 2)
                          for i in range(a + 1, a + c + 1))
        assert s1x2 == direct1 and s2x3 == direct2, (a, c)
        a += c


@given(st.lists(st.integers(min_value=-100, max_value=100),
                min_size=2, max_size=60))
@settings(max_examples=100)
def test_mann_kendall_variance_nonnegative(cs):
    """The tie-corrected Mann-Kendall variance numerator
    n(n-1)(2n+5) - sum t(t-1)(2t+5) is non-negative for EVERY tie
    pattern, and zero exactly when all values tie (S must then be 0)."""
    n = len(cs)
    tie18 = sum(t * (t - 1) * (2 * t + 5)
                for t in Counter(cs).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    assert var18 >= 0
    if var18 == 0:
        assert len(set(cs)) == 1
        s = sum((cs[j] > cs[i]) - (cs[j] < cs[i])
                for i in range(n) for j in range(i + 1, n))
        assert s == 0
