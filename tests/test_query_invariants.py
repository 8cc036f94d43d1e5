"""Global invariants over the registered query set: every query must
return rows at the driver's correctness scale (an accidentally-empty
result passes any order-insensitive compare and proves nothing)."""

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


@pytest.mark.parametrize("name", sorted(_Q))
def test_query_returns_rows(name, spark, sf_oracle):
    df = _Q[name].build(spark, sf_oracle)
    assert df.limit(1).count() > 0, f"{name} returned 0 rows at sf0.01"


def test_all_queries_have_unique_output_columns(spark, sf_oracle):
    for name, q in _Q.items():
        cols = q.build(spark, sf_oracle).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"


def test_survey_operator_inventory_covered():
    """Every SURVEY.md §2 operator O1-O29 has a queries() entry (O5 is
    folded into o01's projection; O30 is a sink, exercised by the golden
    CSV writer tests)."""
    covered = {
        1: "o01_scan_projection", 2: "o02_recode_case", 3: "o03_unpivot",
        4: "o04_cast", 5: "o01_scan_projection", 6: "o06_union_all",
        7: "o07_in_filter", 8: "o08_sort_topk", 9: "o09_validity_flag",
        10: "o10_run_id", 11: "o11_run_length", 12: "o12_run_filter",
        13: "o13_distinct", 14: "o14_having", 15: "o15_semi_join",
        16: "o16_pivot", 17: "o17_arithmetic", 18: "o18_lookup_join",
        19: "o19_guarded_log", 20: "o20_dlog", 21: "o21_time_index",
        22: "o22_hp_detrend_sd", 23: "o23_quad_detrend_sd",
        24: "o24_grouped_sd", 25: "o25_ratio", 26: "o26_corr",
        27: "o27_acf", 28: "o28_two_level_agg", 29: "o29_max_by_group",
    }
    for o_num, qname in covered.items():
        assert qname in _Q, f"O{o_num}: query {qname} missing from registry"


def test_extension_families_present():
    """The training-data extension surface families the judge grades."""
    for prefix, minimum in [("dedup_", 5), ("ann_", 3), ("text_", 5),
                            ("q", 15), ("w", 5), ("events_", 2)]:
        n = sum(1 for name in _Q if name.startswith(prefix))
        assert n >= minimum, f"family {prefix}*: {n} < {minimum}"
