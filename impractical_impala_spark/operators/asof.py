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
    within the same ``on`` key. Reference rows tied on (key, time) are
    broken deterministically: the row whose ``ref_cols`` struct sorts
    greatest (field-lexicographic in ``ref_cols`` order) is carried,
    independent of partitioning and run-to-run shuffle order.

    ``ref_cols`` maps reference column -> output name. Probe columns
    pass through unchanged. Left semantics: unmatched probes keep NULLs.
    """
    tag = "__asof_side"
    t = "__asof_t"
    carry = "__asof_ref"
    # carry the WHOLE matched reference row as one struct: the struct is
    # non-null for every reference row even when its fields are null, so
    # LOCF can never stitch together fields from different rows
    ref_struct = F.struct(*[F.col(src).alias(out)
                            for src, out in ref_cols.items()])
    ref_tagged = ref.select(
        *on, F.col(ref_time).alias(t), ref_struct.alias(carry),
    ).withColumn(tag, F.lit(0))
    probe_tagged = (
        probe.withColumn(tag, F.lit(1))
        .withColumn(t, F.col(probe_time))
        .withColumn(carry, F.lit(None).cast(dict(ref_tagged.dtypes)[carry]))
    )
    for c in probe.columns:
        if c not in ref_tagged.columns:
            ref_tagged = ref_tagged.withColumn(c, F.lit(None).cast(
                dict(probe.dtypes)[c]))
    u = probe_tagged.unionByName(ref_tagged, allowMissingColumns=True)

    # strict: a ref row at the exact probe time must NOT match -> order
    # probe rows before ref rows at equal times; else after. The carry
    # struct is the final key so reference rows tied on (key, time)
    # have a total order — without it the carried row would flap with
    # shuffle order (probe rows all have NULL carry and equal tag, so
    # their relative order never affects any LOCF result).
    order = [t, F.col(tag).asc() if not strict else F.col(tag).desc(),
             F.col(carry).asc()]
    w = Window.partitionBy(*on).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, 0)
    matched = F.last(F.when(F.col(tag) == 0, F.col(carry)),
                     ignorenulls=True).over(w)
    out_cols: list[Column] = [
        matched.getField(out).alias(out) for out in ref_cols.values()
    ]
    return (
        u.select(*probe.columns, F.col(tag), *out_cols)
        .filter(F.col(tag) == 1)
        .drop(tag)
    )
