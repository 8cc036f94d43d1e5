"""Run-length (gaps-and-islands) operators.

Re-expresses the reference's validity/run-id/run-length cleaning
(dtrendandstat_dlog.R:46-53, dtrendandstat_HP100.R:73-98 — SURVEY.md
O9-O12) as composable window-function builders. All of it is lag +
running-sum + windowed count over one partitioning, so Spark executes it
with a single hash-partition shuffle on the keys and then pipelines
within partitions — the same shape holds whether the partition key is 45
countries or 10^9 users (skewed keys are the thing to watch; AQE skew
handling is on in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_validity(df: DataFrame, value_col: str, out: str = "valid",
                  predicate: Column | None = None) -> DataFrame:
    """O9: 1 when the observation is usable else 0. The reference's rule
    is ``not null AND > 0`` (zeros are missing data, dtrendandstat_dlog.R:46);
    pass ``predicate`` to override."""
    c = F.col(value_col)
    pred = predicate if predicate is not None else (c.isNotNull() & (c > 0))
    return df.withColumn(out, F.when(pred, F.lit(1)).otherwise(F.lit(0)))


def with_run_id(df: DataFrame, partition_cols: list[str], order_col: str,
                valid_col: str = "valid", out: str = "run_id") -> DataFrame:
    """O10: run id via lag+cumsum — ``cumsum(lag(valid, default 0)==0 &
    valid==1)`` per partition in order (dtrendandstat_dlog.R:47-48).
    Rows outside any valid run keep the id of the last run started."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    start = (F.lag(valid_col, 1, 0).over(w) == 0) & (F.col(valid_col) == 1)
    cum = Window.partitionBy(*partition_cols).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(start.cast("int")).over(cum))


def with_run_length(df: DataFrame, partition_cols: list[str],
                    valid_col: str = "valid", run_col: str = "run_id",
                    out: str = "run_length") -> DataFrame:
    """O11: size of each (partition, run, valid) group as a windowed count
    — no row reduction (dtrendandstat_dlog.R:50-51)."""
    w = Window.partitionBy(*partition_cols, run_col, valid_col)
    return df.withColumn(out, F.count(F.lit(1)).over(w))


def filter_min_run(df: DataFrame, min_len: int, valid_col: str = "valid",
                   len_col: str = "run_length") -> DataFrame:
    """O12: keep rows of valid runs with length >= min_len. Keeps every
    qualifying run, not only the longest (dtrendandstat_dlog.R:53)."""
    return df.filter((F.col(valid_col) == 1) & (F.col(len_col) >= min_len))


def clean_runs(df: DataFrame, partition_cols: list[str], order_col: str,
               value_col: str, min_len: int,
               predicate: Column | None = None) -> DataFrame:
    """O9+O10+O11+O12 composed: the reference's full run-length cleaning."""
    out = with_validity(df, value_col, predicate=predicate)
    out = with_run_id(out, partition_cols, order_col)
    out = with_run_length(out, partition_cols)
    return filter_min_run(out, min_len)
