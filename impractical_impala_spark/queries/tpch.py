"""Register the TPC-H-style headline queries."""

from ..plans import tpch as p
from ..registry import register

register("q1_pricing_summary", p.q1_pricing_summary, p.Q1_ORACLE,
         "grouped pricing summary over lineitem (TPC-H Q1 shape)")
register("q3_top_unshipped_orders", p.q3_top_unshipped_orders, p.Q3_ORACLE,
         "segment filter + 3-way join + revenue top-10 (TPC-H Q3 shape)")
register("q5_revenue_by_nation", p.q5_revenue_by_nation, p.Q5_ORACLE,
         "star join revenue rollup by region/nation (TPC-H Q5 shape)")
