"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``impractical_impala_spark.registry`` — the package is the
engine; this file only adapts it to the driver's entry/queries/oracle_sql
interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from impractical_impala_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from impractical_impala_spark.plans.tpch import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data extension surface). Each callable takes (spark, sf_dir)
    and returns a DataFrame with the same column names as its oracle."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    non-SQL kernels (e.g. HP filter) are omitted -> rows-only check."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
