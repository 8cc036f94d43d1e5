"""bench.py must stay runnable by the driver: every HEADLINE name has
to resolve — through the registry or the bench-only fallback for
library kernels deregistered from the driver-facing surface — and the
fallback must never shadow a registered query. A deregistration that
forgets bench would otherwise only fail at driver bench time, after
the round's commits are in."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from impractical_impala_spark.registry import all_queries  # noqa: E402


def test_every_headline_name_resolves():
    qs = all_queries()
    extra = bench._bench_only()
    unresolved = [n for n in bench.HEADLINE if n not in qs and n not in extra]
    assert unresolved == [], f"bench HEADLINE names resolve nowhere: {unresolved}"


def test_bench_only_does_not_shadow_registry():
    qs = all_queries()
    overlap = [n for n in bench._bench_only() if n in qs]
    assert overlap == [], (
        f"bench-only fallback shadows registered queries: {overlap}")


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_headline_basis_equals_registry():
    """VERDICT r11 ask #3: the stdout headline (value + n_queries) must
    cover EXACTLY the registered queries — bench-only kernels are timed
    into BENCH_DETAIL's out_of_registry key, never the headline total —
    so cross-round totals compare like for like without footnotes."""
    qs = all_queries()
    in_registry = [n for n in bench.HEADLINE if n in qs]
    assert sorted(in_registry) == sorted(qs), (
        "headline registry coverage diverges from the registry: "
        f"missing={sorted(set(qs) - set(in_registry))[:5]} "
        f"extra={sorted(set(in_registry) - set(qs))[:5]}")
