"""Physical-layout operators: Z-order (multi-dimensional) file
clustering and small-file compaction.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is decided by LAYOUT — which files (and row groups) the engine can
skip. These operators are the maintenance jobs that create that
skippability; the reference (a one-shot R pipeline, SURVEY.md §1.3) has
no layout surface at all.

- Z-order: interleave the bits of two filter dimensions into one sort
  key, then range-partition + sort the write by it. Files become
  rectangles in (x, y) space instead of stripes, so a 2-D predicate
  intersects O(perimeter) files instead of O(all): min/max footer stats
  prune on BOTH columns. tests/test_layout.py PROVES the property from
  the parquet footers: the query box intersects strictly fewer files
  under Z-order than under a 1-D sort of the same data.
- Compaction: the streaming/CDC small-file problem. coalesce() merges
  partitions WITHOUT a shuffle (a repartition would pay a full network
  pass just to concatenate); correctness is hash-checked against the
  pre-compaction source, file counts are asserted in the test.

Both queries return aggregates over the post-maintenance data with the
oracle aggregating the original source — any corruption in the layout
path breaks the hash match.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

Z_BITS = 8          # per-dimension resolution (256 buckets)
Z_FILES = 16        # range partitions (= files) for the z-ordered write
CUST_LO, CUST_HI = 400, 700       # query box: ~20% of custkey space
DATE_LO, DATE_HI = "1995-01-01", "1995-12-31"  # ~14% of the date span


def _scratch(sf_dir: str, name: str) -> str:
    from ..session import scratch_root

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return f"{scratch_root()}/{name}_{tag}"


def zorder_expr(xcol: str, ycol: str, bits: int = Z_BITS) -> str:
    """Bit-interleave SQL expression: z = x0y0x1y1... (LSB first). Pure
    integer shifts/masks — codegen-friendly, no UDF."""
    terms = [
        f"(((({xcol}) >> {i}) & 1) << {2 * i})"
        f" + (((({ycol}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return " + ".join(terms)


def write_zordered_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders z-ordered on (custkey-bucket, orderdate-bucket);
    returns the output path. Range-partitioning by z gives each file a
    contiguous z-interval = a small rectangle in (cust, date) space."""
    orders = load_table(spark, sf_dir, "orders")
    # bucket both dimensions to Z_BITS of resolution; spans measured
    # from the fixture generator's fixed ranges (custkey 1..~15k·sf,
    # orderdate 1992-1998), scaled positionally so the interleave is
    # balanced whatever the sf
    path = _scratch(sf_dir, "zorder_orders")
    shutil.rmtree(path, ignore_errors=True)
    # the custkey span is a 1-row aggregate (model-size) collected once
    # so the write plan stays subquery-free
    cust_max = orders.agg(F.max("o_custkey")).collect()[0][0]
    day0 = "date '1992-01-01'"
    zx = f"cast(o_custkey * {1 << Z_BITS} / {cust_max + 1} as int)"
    zy = (f"cast(datediff(o_orderdate, {day0}) * {1 << Z_BITS} / 2557"
          f" as int)")
    z = zorder_expr(f"({zx})", f"({zy})")
    (orders.withColumn("z", F.expr(z))
     .repartitionByRange(Z_FILES, "z")
     .sortWithinPartitions("z")
     .drop("z")
     .write.mode("overwrite").parquet(path))
    return path


def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order orders on (custkey, orderdate), read back, run a 2-D
    box query. The hash gate proves the layout path lost nothing; the
    layout test proves the skippability from the footers."""
    path = write_zordered_orders(spark, sf_dir)
    back = spark.read.parquet(path)
    return (
        back.filter((F.col("o_custkey").between(CUST_LO, CUST_HI))
                    & (F.col("o_orderdate").between(DATE_LO, DATE_HI)))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("total_price"))
        .orderBy("o_orderstatus")
    )


register("zorder_layout_scan", zorder_layout_scan, f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS total_price
FROM orders
WHERE o_custkey BETWEEN {CUST_LO} AND {CUST_HI}
  AND o_orderdate BETWEEN DATE '{DATE_LO}' AND DATE '{DATE_HI}'
GROUP BY o_orderstatus ORDER BY o_orderstatus
""", "z-order write -> 2-D box query under the hash gate")


# ------------------------------------------------------- compaction
SMALL_FILES = 64
TARGET_FILES = 4


def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate a CDC/streaming sink's small-file sprawl (64 files),
    compact to 4 with coalesce (NO shuffle — partitions concatenate in
    place), and aggregate the compacted table. Oracle aggregates the
    original source, so the compaction must be lossless."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    sprawl = _scratch(sf_dir, "sprawl_events")
    compacted = _scratch(sf_dir, "compact_events")
    shutil.rmtree(sprawl, ignore_errors=True)
    shutil.rmtree(compacted, ignore_errors=True)
    ev.repartition(SMALL_FILES).write.mode("overwrite").parquet(sprawl)
    (spark.read.parquet(sprawl)
     .coalesce(TARGET_FILES)
     .write.mode("overwrite").parquet(compacted))
    back = spark.read.parquet(compacted)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type")
    )


register("compact_small_files", compact_small_files, """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
""", "64-file sprawl -> 4-file coalesce compaction under the hash gate")


# ----------------------------------------------- schema evolution
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two table vintages — the old writer without o_orderpriority, the
    new writer with it — land in one dataset; mergeSchema reconciles
    the footers and the old rows surface the new column as NULL, mapped
    to a 'LEGACY' bucket. This is the reader-side half of schema
    evolution: no rewrite of historical files, ever."""
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "evolve_orders")
    shutil.rmtree(path, ignore_errors=True)
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select("o_orderkey", "o_orderstatus", "o_totalprice")
     .write.mode("overwrite").parquet(f"{path}/batch=1"))
    (orders.filter(F.col("o_orderkey") % 2 == 1)
     .select("o_orderkey", "o_orderstatus", "o_totalprice",
             "o_orderpriority")
     .write.mode("overwrite").parquet(f"{path}/batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(F.coalesce("o_orderpriority", F.lit("LEGACY"))
                     .alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("total_price"))
        .orderBy("priority")
    )


register("schema_evolution_read", schema_evolution_read, """
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
            ELSE 'LEGACY' END AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS total_price
FROM orders GROUP BY 1 ORDER BY 1
""", "mergeSchema read across writer vintages under the hash gate")


# ------------------------------------- dynamic partition pruning
DPP_TARGET_YEARS = (1996, 1999)  # fixture order years span 1995-2001


def write_year_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders hive-partitioned by order year; returns the path.
    At 100 TB this is the standard fact layout: the partition column in
    the directory structure, so a pruned query never opens the skipped
    years' files at all."""
    path = _scratch(sf_dir, "orders_by_year")
    shutil.rmtree(path, ignore_errors=True)
    (load_table(spark, sf_dir, "orders")
     .withColumn("o_year", F.year("o_orderdate"))
     .repartition("o_year")
     .write.mode("overwrite").partitionBy("o_year").parquet(path))
    return path


def dpp_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is partitioned by
    order year, the dim side carries the year->campaign-label mapping,
    and the label filter selects the target years AT RUNTIME through
    the broadcast join — Catalyst inserts a dynamicpruning subquery
    into the fact scan's PartitionFilters, so only the matching year
    directories are ever read (tests/test_plans.py asserts the
    pruning expression is in the scan). This is the join-driven twin of
    static partition pruning: the scan cost is proportional to the
    SELECTED years, not the table size."""
    path = write_year_partitioned_orders(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(yr, "target" if yr in DPP_TARGET_YEARS else "other")
         for yr in range(1995, 2002)],
        ["yr", "campaign"])
    return (fact
            .join(F.broadcast(dim.filter(F.col("campaign") == "target")),
                  fact.o_year == F.col("yr"))
            .groupBy("o_year")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
                 .alias("revenue_cents"))
            .orderBy("o_year"))


register("dpp_partition_prune", dpp_partition_prune, f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
WHERE EXTRACT(year FROM o_orderdate) IN {DPP_TARGET_YEARS}
GROUP BY 1 ORDER BY 1
""", "join-driven dynamic partition pruning on a year-partitioned fact")
