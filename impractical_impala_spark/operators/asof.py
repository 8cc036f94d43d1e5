"""As-of (most-recent-prior) join — an operator Spark has no builtin
for, composed from existing DataFrame ops (SURVEY.md §7 custom-operator
rule (a)).

Implementation: union both sides tagged, one shuffle on the key, then
last-observation-carried-forward over an ordered window; filter back to
the probe rows. Cost = one hash-partition shuffle + a pipelined window,
regardless of how many probe rows match each reference row — the shape
that survives 100 TB (contrast with the naive inequality join, which is
a per-key cross product).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, ref: DataFrame, on: Sequence[str],
              probe_time: str, ref_time: str,
              ref_cols: dict[str, str],
              strict: bool = False) -> DataFrame:
    """For each probe row, attach the columns of the reference row with
    the greatest ``ref_time`` <= ``probe_time`` (< when ``strict``)
    within the same ``on`` key. Reference ties on time are broken by
    taking the row that sorts last (deterministic given unique times).

    ``ref_cols`` maps reference column -> output name. Probe columns
    pass through unchanged. Left semantics: unmatched probes keep NULLs.
    """
    tag = "__asof_side"
    t = "__asof_t"
    probe_tagged = probe.withColumn(tag, F.lit(1)).withColumn(t, F.col(probe_time))
    carried = [f"__carry_{i}" for i in range(len(ref_cols))]
    ref_tagged = ref.select(
        *on,
        F.col(ref_time).alias(t),
        *[F.col(src).alias(c) for c, src in zip(carried, ref_cols)],
    ).withColumn(tag, F.lit(0))
    for c in carried:
        probe_tagged = probe_tagged.withColumn(c, F.lit(None).cast(
            dict(ref_tagged.dtypes)[c]))
    for c in probe.columns:
        if c not in ref_tagged.columns:
            ref_tagged = ref_tagged.withColumn(c, F.lit(None).cast(
                dict(probe.dtypes)[c]))
    u = probe_tagged.unionByName(ref_tagged, allowMissingColumns=True)

    # strict: a ref row at the exact probe time must NOT match -> order
    # probe rows before ref rows at equal times; else after.
    order = [t, F.col(tag).asc() if not strict else F.col(tag).desc()]
    w = Window.partitionBy(*on).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, 0)
    locf: list[Column] = [
        F.last(F.when(F.col(tag) == 0, F.col(c)), ignorenulls=True).over(w)
        .alias(out)
        for c, out in zip(carried, ref_cols.values())
    ]
    return (
        u.select(*probe.columns, F.col(tag), *locf)
        .filter(F.col(tag) == 1)
        .drop(tag)
    )
