"""Global total-order row numbering WITHOUT the single-task funnel.

``ROW_NUMBER() OVER (ORDER BY k)`` — an empty window partition spec —
funnels the whole table through one task: the classic plan that works
in dev and dies at 100 TB. The scalable decomposition:

1. ``repartitionByRange`` on the sort key: disjoint, ordered ranges
   (Spark samples boundaries; correctness never depends on where the
   boundaries fall, only on range disjointness + ordering).
2. Per-range ``row_number`` — a window PARTITIONED on the range id, so
   every task numbers only its own slice.
3. Per-range counts -> prefix-sum offsets. This is model-sized data
   (one row per partition, i.e. thousands, not billions) — the ONLY
   thing that ever reaches the driver — broadcast-joined back.

Global rank = offset(range) + local row_number. Two bounded shuffles
(range + hash on range id), no stage whose parallelism is 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, *order: Column | str,
                      num_ranges: int | None = None,
                      out_col: str = "rnk") -> DataFrame:
    """Append ``out_col`` = 1-based global rank of each row under
    ``order`` (include a unique tiebreaker column for a deterministic
    total order). Never funnels: see module docstring for the plan."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("__range_id", F.spark_partition_id())
    )
    w = Window.partitionBy("__range_id").orderBy(*cols)
    local = ranged.withColumn("__local_rn", F.row_number().over(w))
    # one row per range: model-size at any data scale (ranges ~ cluster
    # parallelism, not row count), so the prefix-sum window over the
    # COUNTS frame is a thousands-of-rows sort, not a data funnel —
    # nothing ever reaches the driver
    counts = local.groupBy("__range_id").count()
    off_w = (Window.orderBy("__range_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = counts.withColumn(
        "__offset", F.coalesce(F.sum("count").over(off_w), F.lit(0))
    ).select("__range_id", "__offset")
    return (
        local.join(F.broadcast(off_df), "__range_id")
        .withColumn(out_col, F.col("__offset") + F.col("__local_rn"))
        .drop("__range_id", "__local_rn", "__offset")
    )
