"""Reshape operators: unpivot (melt) and pivot (widen).

The reference reshapes with tidyr ``pivot_longer`` / ``pivot_wider``
(dtrendandstat_dlog.R:22-26, 68-69 — SURVEY.md O3/O16). Spark-first:

- unpivot is ``DataFrame.unpivot`` — a narrow transformation, no shuffle;
  at scale it multiplies rows by the number of value columns, so always
  project ids first (column pruning can't remove unpivoted columns).
- pivot is ``groupBy().pivot(values=...).agg(...)`` — ALWAYS pass the
  explicit value list: without it Spark runs an extra distinct job over
  the whole input to discover the values, which is a full scan you don't
  want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot(df: DataFrame, ids: Sequence[str], values: Sequence[str],
            var_col: str = "variable", value_col: str = "value") -> DataFrame:
    """O3: wide -> long. Value columns must share a least-common type;
    cast upstream if mixing ints and doubles."""
    return df.unpivot(list(ids), list(values), var_col, value_col)


def pivot_first(df: DataFrame, keys: Sequence[str], name_col: str,
                value_col: str, names: Sequence[str]) -> DataFrame:
    """O16: long -> wide taking the single value per cell (tidyr
    ``pivot_wider`` semantics; cells with no row become NULL)."""
    return (
        df.groupBy(*keys)
        .pivot(name_col, list(names))
        .agg(F.first(value_col))
    )


def pivot_counts(df: DataFrame, keys: Sequence[str], name_col: str,
                 names: Sequence[str]) -> DataFrame:
    """Occurrence-count pivot; absent combinations are 0 (not NULL) to
    match a conditional-aggregation SQL oracle."""
    out = df.groupBy(*keys).pivot(name_col, list(names)).agg(F.count(F.lit(1)))
    return out.fillna(0, subset=list(names))
