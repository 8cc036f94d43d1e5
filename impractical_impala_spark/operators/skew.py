"""Skew-mitigation operators.

At 100 TB a handful of hot keys (a viral document, a bot user, the
'click' event type) concentrate a shuffle partition onto one task. Two
standard levers, both provided here:

1. AQE skew-join splitting — already on globally (session.py).
2. SALTED two-phase aggregation — explicit, for aggregations whose hot
   keys AQE can't split (a single group is indivisible in a hash agg):
   spray each key across ``n_salts`` sub-groups, partially aggregate,
   then combine. Identical results to the direct aggregation for any
   algebraic aggregate (sum/count/min/max and anything decomposable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[Column, Column]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (partial_agg_expr, final_agg_expr)
    where the partial expr runs per (keys, salt) and the final expr
    combines the partials per keys, e.g.::

        salted_agg(ev, ["event_type"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
            "mx":    (F.max("value"),     F.max("mx")),
        })

    The salt is a deterministic spray (monotonically_increasing_id mod
    n_salts would also work; a hash of all columns keeps it stable under
    re-partitioning).
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts).alias("__salt")
    partial_exprs = [expr.alias(out) for out, (expr, _) in aggs.items()]
    final_exprs = [expr.alias(out) for out, (_, expr) in aggs.items()]
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
