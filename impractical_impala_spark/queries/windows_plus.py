"""Round-2 window-function completeness: the distribution-rank family
(ntile, percent_rank, cume_dist) not exercised by w1–w5. One shuffle on
the partition key; rank outputs are exact rationals (k/(n-1), k/n) so
both engines compute them bit-identically — no rounding needed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def w6_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile, percentile rank, and cumulative distribution of
    customer account balances within each market segment."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


register("w6_distribution_ranks", w6_distribution_ranks, """
SELECT c_custkey, c_mktsegment, c_acctbal,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""", "ntile/percent_rank/cume_dist distribution ranks")
