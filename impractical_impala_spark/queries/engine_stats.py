"""Round-9 wave 12: engine statistics, data skipping & governance.

The introspection surface a warehouse engine runs over its own data —
each operator exact-integer and oracle-checked:

- ``zonemap_skipping_audit``: min/max zone-map (data-skipping)
  effectiveness for a predicate set over month-bucketed "files" — the
  scan-pruning audit behind every columnar format's row-group stats.
- ``ndv_estimator_audit``: distinct-count estimation from a
  deterministic 1/NDV_MOD sample — row-level Bernoulli (GEE
  estimator, sqrt(1/q) exact at q = 1/16) AND value-level hash
  sampling (inverse scaling) against the true NDV, the ANALYZE-stats
  accuracy check.
- ``stats_histogram_equidepth``: optimizer-grade equi-depth histogram
  from spine cutpoints (the customer_pareto no-total-order mechanism)
  with the equi-width twin on the same spine — bucket-balance
  comparison without sorting the fact table.
- ``join_cardinality_audit``: the uniformity-assumption join-size
  estimate n_l*n_r/max(ndv_l, ndv_r) vs the TRUE join cardinality,
  for a PK-FK join and a skewed self-join — the actual is computed
  from per-key count sums (sum c^2), never by materializing the join.
- ``privacy_tcloseness_audit``: t-closeness — earth-mover's distance
  between each QI class's sensitive-value distribution and the global
  one over ordered bins (cumulative-difference form, integer ppm) —
  completing the k-anonymity / l-diversity release-audit family.
- ``retrieval_ndcg``: NDCG@10 of the log-TF-IDF ranking against
  BM25-graded relevance — the graded-relevance companion to
  ann_recall_audit's binary recall.

Round-9 wave 14 residents (same introspection theme):

- ``ndv_kmv_sketch``: KMV k-minimum-values NDV sketch — deterministic
  md5 order statistics make the approximate estimator carry a FULL
  hash oracle (unlike HLL's rows-only contract).
- ``stats_histogram_sampled``: equi-depth cutpoints from a
  deterministic row sample (the ANALYZE path when the fact is too
  large to sort), audited for bucket balance in ppm.
- ``retrieval_mrr_hitk``: per-source MRR + hit@k of the TF-IDF
  ranking vs BM25 relevance — the rank-of-first-relevant companion
  to retrieval_ndcg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .monitor_eval import _ha_sql
from .text_ir import BM25_B, BM25_K1, BM25_TERMS

# ------------------------------------------------ zone-map skipping
# (name, lo, hi) half-open predicate bands over o_totalprice cents:
# lo/hi = None means unbounded on that side.
ZM_PREDICATES = (
    ("gt_400k", 40_000_000, None),
    ("lt_50k", None, 5_000_000),
    ("band_150k_250k", 15_000_000, 25_000_000),
)


def zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit: treat each order month as one "file",
    record its (min, max) o_totalprice-cents zone map, and for each
    predicate report how many files a zone-map-aware scan skips and
    how many rows that saves. A file is prunable iff its [min, max]
    range cannot intersect the predicate band. The zone-map table is
    one row per month (model-size); the per-predicate evaluation never
    rescans the fact table — exactly the row-group-stats mechanism of
    columnar scans. All arithmetic is exact integer cents."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .alias("file_id"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    zones = orders.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("zmin"), F.max("cents").alias("zmax"))
    out = None
    for name, lo, hi in ZM_PREDICATES:
        misses = []  # file cannot contain a matching row
        match = []   # row-level predicate
        if lo is not None:
            misses.append(f"zmax < {lo}")
            match.append(f"cents >= {lo}")
        if hi is not None:
            misses.append(f"zmin > {hi}")
            match.append(f"cents <= {hi}")
        prunable = " OR ".join(misses)
        row_pred = " AND ".join(match)
        f_agg = zones.agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.expr(f"case when {prunable} then 1 else 0 end"))
            .alias("n_pruned"),
            F.sum(F.expr(f"case when {prunable} then n_rows else 0 end"))
            .alias("pruned_rows"),
            F.sum("n_rows").alias("total_rows"),
        ).withColumn("predicate", F.lit(name))
        m_agg = orders.agg(F.sum(F.expr(
            f"case when {row_pred} then 1 else 0 end")).alias("match_rows"))
        part = f_agg.crossJoin(m_agg).select(
            "predicate", "n_files", "n_pruned", "pruned_rows",
            "match_rows",
            F.expr("pruned_rows * 1000000 div total_rows")
            .alias("skip_ppm"))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("predicate")


def _zm_oracle() -> str:
    parts = []
    for name, lo, hi in ZM_PREDICATES:
        misses, match = [], []
        if lo is not None:
            misses.append(f"zmax < {lo}")
            match.append(f"cents >= {lo}")
        if hi is not None:
            misses.append(f"zmin > {hi}")
            match.append(f"cents <= {hi}")
        prunable = " OR ".join(misses)
        row_pred = " AND ".join(match)
        parts.append(f"""
SELECT '{name}' AS predicate,
       (SELECT COUNT(*) FROM zones) AS n_files,
       CAST((SELECT SUM(CASE WHEN {prunable} THEN 1 ELSE 0 END)
             FROM zones) AS BIGINT) AS n_pruned,
       CAST((SELECT SUM(CASE WHEN {prunable} THEN n_rows ELSE 0 END)
             FROM zones) AS BIGINT) AS pruned_rows,
       CAST((SELECT SUM(CASE WHEN {row_pred} THEN 1 ELSE 0 END)
             FROM ord) AS BIGINT) AS match_rows,
       CAST((SELECT SUM(CASE WHEN {prunable} THEN n_rows ELSE 0 END)
             FROM zones) * 1000000
            // (SELECT SUM(n_rows) FROM zones) AS BIGINT) AS skip_ppm""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH ord AS (
    SELECT year(o_orderdate) * 12 + month(o_orderdate) AS file_id,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), zones AS (
    SELECT file_id, COUNT(*) AS n_rows,
           MIN(cents) AS zmin, MAX(cents) AS zmax
    FROM ord GROUP BY 1
)
{union}
ORDER BY predicate
"""


register("zonemap_skipping_audit", zonemap_skipping_audit, _zm_oracle(),
         "min/max zone-map data-skipping effectiveness per predicate")


# ------------------------------------------------- NDV estimator audit
NDV_MOD = 16  # 1/16 sampling rate; sqrt(1/q) = 4 exactly


def ndv_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-stats accuracy audit for distinct-count (NDV)
    estimation of lineitem.l_partkey from 1/16 deterministic samples:

    - ROW-level Bernoulli (md5 of the row identity): the
      Goodman/GEE-style estimator D = sqrt(1/q)*f1 + (d_s - f1) — at
      q = 1/16 the sqrt is exactly 4, so the estimate is an exact
      integer;
    - VALUE-level hash sampling (md5 of the key): every key kept with
      p = 1/16 independent of its frequency, so D = 16 * d_v.

    Both estimates are compared to the true NDV in signed ppm. The
    md5-prefix-mod sampling is the contrastive_negatives trick —
    reproducible bit-for-bit in both engines, no RNG state. Sampling,
    distinct and f1 are one scan + key-sized aggregates."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey")
    row_h = ("pmod(cast(conv(substring(md5(concat("
             "cast(l_orderkey as string), '_',"
             " cast(l_linenumber as string))), 1, 7), 16, 10)"
             f" as bigint), {NDV_MOD})")
    val_h = ("pmod(cast(conv(substring(md5("
             "cast(l_partkey as string)), 1, 7), 16, 10)"
             f" as bigint), {NDV_MOD})")
    base = li.select(
        "l_partkey",
        (F.expr(row_h) == 0).cast("int").alias("in_row_sample"),
        (F.expr(val_h) == 0).cast("int").alias("in_val_sample"))
    per_key = base.groupBy("l_partkey").agg(
        F.sum("in_row_sample").alias("c_samp"),
        F.max("in_val_sample").alias("in_val"))
    agg = per_key.agg(
        F.count(F.lit(1)).alias("d_true"),
        F.sum(F.when(F.col("c_samp") > 0, 1).otherwise(0))
        .alias("d_sample"),
        F.sum(F.when(F.col("c_samp") == 1, 1).otherwise(0)).alias("f1"),
        F.sum("c_samp").alias("n_sample"),
        F.sum("in_val").alias("d_val"))
    n = li.agg(F.count(F.lit(1)).alias("n_rows"))
    return (agg.crossJoin(n)
            .withColumn("d_gee", F.expr("4 * f1 + (d_sample - f1)"))
            .withColumn("d_val_est", F.expr(f"{NDV_MOD} * d_val"))
            .select(
                "n_rows", "n_sample", "d_true", "d_sample", "f1",
                "d_gee",
                F.expr("(d_gee - d_true) * 1000000 div d_true")
                .alias("gee_err_ppm"),
                "d_val_est",
                F.expr("(d_val_est - d_true) * 1000000 div d_true")
                .alias("val_err_ppm")))


register("ndv_estimator_audit", ndv_estimator_audit, f"""
WITH li AS (
    SELECT l_partkey,
           CASE WHEN CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                     || '_' || CAST(l_linenumber AS VARCHAR)), 1, 7))
                     AS BIGINT) % {NDV_MOD} = 0 THEN 1 ELSE 0 END
               AS in_row_sample,
           CASE WHEN CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                     1, 7)) AS BIGINT) % {NDV_MOD} = 0 THEN 1 ELSE 0 END
               AS in_val_sample
    FROM lineitem
), per_key AS (
    SELECT l_partkey, SUM(in_row_sample) AS c_samp,
           MAX(in_val_sample) AS in_val
    FROM li GROUP BY 1
), agg AS (
    SELECT COUNT(*) AS d_true,
           SUM(CASE WHEN c_samp > 0 THEN 1 ELSE 0 END) AS d_sample,
           SUM(CASE WHEN c_samp = 1 THEN 1 ELSE 0 END) AS f1,
           SUM(c_samp) AS n_sample,
           SUM(in_val) AS d_val
    FROM per_key
)
SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
       CAST(n_sample AS BIGINT) AS n_sample,
       CAST(d_true AS BIGINT) AS d_true,
       CAST(d_sample AS BIGINT) AS d_sample,
       CAST(f1 AS BIGINT) AS f1,
       CAST(4 * f1 + (d_sample - f1) AS BIGINT) AS d_gee,
       CAST((4 * f1 + (d_sample - f1) - d_true) * 1000000 // d_true
            AS BIGINT) AS gee_err_ppm,
       CAST({NDV_MOD} * d_val AS BIGINT) AS d_val_est,
       CAST(({NDV_MOD} * d_val - d_true) * 1000000 // d_true AS BIGINT)
           AS val_err_ppm
FROM agg
""", "NDV estimation (GEE row-sample + value-sample) vs true distinct")


# ------------------------------------------- equi-depth histogram
EQD_SPINE = 4096  # fine equi-width spine cells (model-size)
EQD_BUCKETS = 16


def stats_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-grade equi-depth histogram WITHOUT a total order over
    the fact table (the customer_pareto mechanism): one scan builds an
    EQD_SPINE-cell exact integer equi-width histogram of
    o_totalprice cents; cumulative counts over the bounded spine
    assign each CELL its equi-depth bucket as
    1 + (rows_in_lower_cells * B) div n (a cell never splits — the
    documented quantization). The equi-width twin is the same spine
    regrouped by cell div (SPINE/B), so the two bucketings are
    compared cell-for-cell. Output per bucket: depth rows / cells /
    upper cell edge, and the width-bucket row count — the balance
    evidence an optimizer wants from its histograms."""
    cents = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"))
    rng = cents.agg(F.min("c").alias("mn"), F.max("c").alias("mx"),
                    F.count(F.lit(1)).alias("n"))
    binned = (cents.crossJoin(F.broadcast(rng))
              .withColumn("cell", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(EQD_SPINE - 1),
                          F.expr(f"((c - mn) * {EQD_SPINE})"
                                 f" div (mx - mn + 1)")))))
    spine = binned.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt"),
                                       F.max("c").alias("hi_c"))
    wb = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, -1)
    cells = (spine.withColumn("cprev", F.coalesce(
        F.sum("cnt").over(wb), F.lit(0)))
        .crossJoin(F.broadcast(rng.select("n")))
        .withColumn("bucket", (F.lit(1)
                               + F.expr(f"(cprev * {EQD_BUCKETS}) div n"))
                    .cast("int"))
        .withColumn("wbucket", F.expr(
            f"cast(cell div {EQD_SPINE // EQD_BUCKETS} as int)")))
    depth = cells.groupBy("bucket").agg(
        F.sum("cnt").alias("depth_rows"),
        F.count(F.lit(1)).alias("depth_cells"),
        F.max("hi_c").alias("hi_cents"))
    width = (cells.groupBy("wbucket")
             .agg(F.sum("cnt").alias("width_rows"))
             .select((F.col("wbucket") + 1).alias("bucket"),
                     "width_rows"))
    return (depth.join(width, "bucket", "full")
            .select("bucket",
                    F.coalesce("depth_rows", F.lit(0)).alias("depth_rows"),
                    F.coalesce("depth_cells", F.lit(0))
                    .alias("depth_cells"),
                    F.coalesce("hi_cents", F.lit(-1)).alias("hi_cents"),
                    F.coalesce("width_rows", F.lit(0)).alias("width_rows"))
            .orderBy("bucket"))


register("stats_histogram_equidepth", stats_histogram_equidepth, f"""
WITH cents AS (
    SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c FROM orders
), rng AS (
    SELECT MIN(c) AS mn, MAX(c) AS mx, COUNT(*) AS n FROM cents
), binned AS (
    SELECT c, CASE WHEN mx = mn THEN 0 ELSE
              LEAST({EQD_SPINE - 1}, ((c - mn) * {EQD_SPINE})
                    // (mx - mn + 1)) END AS cell
    FROM cents CROSS JOIN rng
), spine AS (
    SELECT cell, COUNT(*) AS cnt, MAX(c) AS hi_c
    FROM binned GROUP BY 1
), cells AS (
    SELECT cell, cnt, hi_c,
           COALESCE(SUM(cnt) OVER (ORDER BY cell
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cprev,
           (SELECT n FROM rng) AS n
    FROM spine
), marked AS (
    SELECT *, CAST(1 + (cprev * {EQD_BUCKETS}) // n AS INTEGER)
                  AS bucket,
           CAST(cell // {EQD_SPINE // EQD_BUCKETS} AS INTEGER) AS wbucket
    FROM cells
), depth AS (
    SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS depth_rows,
           COUNT(*) AS depth_cells, MAX(hi_c) AS hi_cents
    FROM marked GROUP BY 1
), width AS (
    SELECT wbucket + 1 AS bucket, CAST(SUM(cnt) AS BIGINT) AS width_rows
    FROM marked GROUP BY 1
)
SELECT bucket,
       COALESCE(depth_rows, 0) AS depth_rows,
       CAST(COALESCE(depth_cells, 0) AS BIGINT) AS depth_cells,
       COALESCE(hi_cents, -1) AS hi_cents,
       COALESCE(width_rows, 0) AS width_rows
FROM depth d FULL JOIN width w USING (bucket)
ORDER BY bucket
""", "spine-cutpoint equi-depth histogram + equi-width twin, no sort")


# --------------------------------------------- join cardinality audit
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer cardinality-estimation audit: the textbook
    uniformity-assumption estimate |A join B| = n_a * n_b /
    max(ndv_a, ndv_b) vs the TRUE cardinality, for (a) the PK-FK
    orders-lineitem join and (b) the skewed lineitem self-join on
    l_partkey. The truth comes from per-key count products summed as
    exact integers (sum over keys of c_a * c_b) — the join is never
    materialized, so the audit costs two key-sized aggregates however
    large the fact tables are. Signed error in ppm."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    lo = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cl"))
    oo = od.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("co"))
    pkfk = (lo.join(oo, lo.l_orderkey == oo.o_orderkey)
            .agg(F.sum(F.expr("cl * co")).alias("actual")))
    pkfk_stats = (li.agg(F.count(F.lit(1)).alias("n_left"),
                         F.countDistinct("l_orderkey").alias("ndv_left"))
                  .crossJoin(od.agg(
                      F.count(F.lit(1)).alias("n_right"),
                      F.countDistinct("o_orderkey").alias("ndv_right"))))
    lp = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cp"))
    selfj = lp.agg(F.sum(F.expr("cp * cp")).alias("actual"))
    self_stats = (li.agg(F.count(F.lit(1)).alias("n_left"),
                         F.countDistinct("l_partkey").alias("ndv_left"))
                  .select("n_left", "ndv_left",
                          F.col("n_left").alias("n_right"),
                          F.col("ndv_left").alias("ndv_right")))

    def shape(stats: DataFrame, actual: DataFrame, name: str) -> DataFrame:
        return (stats.crossJoin(actual)
                .withColumn("est_rows", F.expr(
                    "n_left * n_right div "
                    "(case when ndv_left > ndv_right"
                    " then ndv_left else ndv_right end)"))
                .select(F.lit(name).alias("join_name"),
                        "n_left", "n_right", "ndv_left", "ndv_right",
                        "est_rows", F.col("actual").alias("actual_rows"),
                        F.expr("(est_rows - actual) * 1000000 div actual")
                        .alias("err_ppm")))

    return (shape(pkfk_stats, pkfk, "orders_lineitem_pkfk")
            .unionByName(shape(self_stats, selfj, "lineitem_self_partkey"))
            .orderBy("join_name"))


register("join_cardinality_audit", join_cardinality_audit, """
WITH lo AS (
    SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1
), oo AS (
    SELECT o_orderkey AS k, COUNT(*) AS co FROM orders GROUP BY 1
), pkfk AS (
    SELECT CAST(SUM(cl * co) AS BIGINT) AS actual
    FROM lo JOIN oo USING (k)
), pkfk_stats AS (
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_left,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_left,
           (SELECT COUNT(*) FROM orders) AS n_right,
           (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_right
), lp AS (
    SELECT l_partkey, COUNT(*) AS cp FROM lineitem GROUP BY 1
), selfj AS (
    SELECT CAST(SUM(cp * cp) AS BIGINT) AS actual FROM lp
), self_stats AS (
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_left,
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS ndv_left,
           (SELECT COUNT(*) FROM lineitem) AS n_right,
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS ndv_right
), combined AS (
    SELECT 'orders_lineitem_pkfk' AS join_name, s.*, p.actual
    FROM pkfk_stats s CROSS JOIN pkfk p
    UNION ALL
    SELECT 'lineitem_self_partkey', s.*, j.actual
    FROM self_stats s CROSS JOIN selfj j
)
SELECT join_name,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       CAST(ndv_left AS BIGINT) AS ndv_left,
       CAST(ndv_right AS BIGINT) AS ndv_right,
       CAST(n_left * n_right // (CASE WHEN ndv_left > ndv_right
                                 THEN ndv_left ELSE ndv_right END)
            AS BIGINT) AS est_rows,
       CAST(actual AS BIGINT) AS actual_rows,
       CAST((n_left * n_right // (CASE WHEN ndv_left > ndv_right
                                  THEN ndv_left ELSE ndv_right END)
             - actual) * 1000000 // actual AS BIGINT) AS err_ppm
FROM combined
ORDER BY join_name
""", "uniformity join-size estimate vs true cardinality (no join run)")


# -------------------------------------------------- t-closeness audit
TCLOSE_BINS = 8
TCLOSE_TOP = 20


def privacy_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit — the distributional companion to
    privacy_kanon_audit (same QI = nation x order year x priority):
    the sensitive attribute (o_totalprice, equi-width-binned to
    TCLOSE_BINS ordered classes) must be distributed within every QI
    class roughly as it is globally. Distance is the ordered-bin
    earth-mover's distance in its cumulative form
    EMD = sum_i |cum_class_i - cum_global_i| / (B - 1), computed in
    integer ppm (the documented quantization). Reports the TCLOSE_TOP
    most-exposed classes. Working set: QI classes x bins — model-size
    after one fact scan."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    base = (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .select("c_nationkey",
                    F.year("o_orderdate").alias("yr"),
                    F.col("o_orderpriority").alias("prio"),
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                    .alias("cents")))
    rng = base.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"),
                   F.count(F.lit(1)).alias("n_all"))
    binned = (base.crossJoin(F.broadcast(rng))
              .withColumn("bin", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(TCLOSE_BINS - 1),
                          F.expr(f"((cents - mn) * {TCLOSE_BINS})"
                                 f" div (mx - mn + 1)")))))
    cls_bin = binned.groupBy("c_nationkey", "yr", "prio", "bin").agg(
        F.count(F.lit(1)).alias("cb"))
    cls_n = cls_bin.groupBy("c_nationkey", "yr", "prio").agg(
        F.sum("cb").alias("cn"))
    glob_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("gb"))
    # dense bin spine per class (absent bins count 0) via cross join
    # of the class list with the global bin list — both model-size
    spine = cls_n.crossJoin(F.broadcast(
        glob_bin.select("bin", "gb")))
    full = (spine.join(cls_bin, ["c_nationkey", "yr", "prio", "bin"],
                       "left")
            .withColumn("cb", F.coalesce("cb", F.lit(0)))
            .crossJoin(F.broadcast(rng.select("n_all"))))
    wc = (Window.partitionBy("c_nationkey", "yr", "prio").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (full
           .withColumn("cum_c", F.sum("cb").over(wc))
           .withColumn("cum_g", F.sum("gb").over(wc))
           .withColumn("cum_c_ppm", F.expr(
               "cum_c * 1000000 div cn"))
           .withColumn("cum_g_ppm", F.expr(
               "cum_g * 1000000 div n_all")))
    emd = (cum.filter(F.col("bin") < TCLOSE_BINS - 1)
           .groupBy("c_nationkey", "yr", "prio", "cn")
           .agg(F.expr("sum(abs(cum_c_ppm - cum_g_ppm))"
                       f" div {TCLOSE_BINS - 1}").alias("emd_ppm")))
    return (emd.select("c_nationkey", "yr", "prio",
                       F.col("cn").alias("n_rows"), "emd_ppm")
            .orderBy(F.col("emd_ppm").desc(), "c_nationkey", "yr",
                     "prio")
            .limit(TCLOSE_TOP))


register("privacy_tcloseness_audit", privacy_tcloseness_audit, f"""
WITH base AS (
    SELECT c_nationkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
           o_orderpriority AS prio,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
), rng AS (
    SELECT MIN(cents) AS mn, MAX(cents) AS mx, COUNT(*) AS n_all
    FROM base
), binned AS (
    SELECT c_nationkey, yr, prio,
           CASE WHEN mx = mn THEN 0 ELSE
                LEAST({TCLOSE_BINS - 1}, ((cents - mn) * {TCLOSE_BINS})
                      // (mx - mn + 1)) END AS bin
    FROM base CROSS JOIN rng
), cls_bin AS (
    SELECT c_nationkey, yr, prio, bin, COUNT(*) AS cb
    FROM binned GROUP BY 1, 2, 3, 4
), cls_n AS (
    SELECT c_nationkey, yr, prio, CAST(SUM(cb) AS BIGINT) AS cn
    FROM cls_bin GROUP BY 1, 2, 3
), glob_bin AS (
    SELECT bin, COUNT(*) AS gb FROM binned GROUP BY 1
), spine AS (
    SELECT n.c_nationkey, n.yr, n.prio, n.cn, g.bin, g.gb
    FROM cls_n n CROSS JOIN glob_bin g
), full_t AS (
    SELECT s.*, COALESCE(c.cb, 0) AS cb, (SELECT n_all FROM rng) AS n_all
    FROM spine s LEFT JOIN cls_bin c
      ON s.c_nationkey = c.c_nationkey AND s.yr = c.yr
     AND s.prio = c.prio AND s.bin = c.bin
), cum AS (
    SELECT *,
           SUM(cb) OVER (PARTITION BY c_nationkey, yr, prio
                         ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) * 1000000 // cn AS cum_c_ppm,
           SUM(gb) OVER (PARTITION BY c_nationkey, yr, prio
                         ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) * 1000000 // n_all AS cum_g_ppm
    FROM full_t
), emd AS (
    SELECT c_nationkey, yr, prio, cn,
           CAST(SUM(ABS(cum_c_ppm - cum_g_ppm)) // {TCLOSE_BINS - 1}
                AS BIGINT) AS emd_ppm
    FROM cum WHERE bin < {TCLOSE_BINS - 1}
    GROUP BY 1, 2, 3, 4
)
SELECT c_nationkey, yr, prio, cn AS n_rows, emd_ppm
FROM emd
ORDER BY emd_ppm DESC, c_nationkey, yr, prio
LIMIT {TCLOSE_TOP}
""", "t-closeness (ordered-bin EMD) release audit per QI class")


# ------------------------------------------------------ NDCG audit
NDCG_K = 10


def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the log-TF-IDF ranking against BM25-graded
    relevance (gain of a doc = 11 - its BM25 rank, 0 outside the BM25
    top-10): the graded companion to ann_recall_audit's binary recall,
    and the standard way to score one ranker against another's
    judgment. Both rankings use the exact nano-quantized integer
    scores of retrieval_rrf_fusion; each DCG term quantizes to
    nano-units (shared half-away rounding) before the integer sum, so
    the log2 discounts cannot introduce order dependence. IDCG is the
    same gains in ideal order. One summary row."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.expr("split(lower(text), ' ')").alias("w")))
    dl = toks.select("doc_id", F.expr("size(w)").alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("n_toks"))
    hits = (toks.select("doc_id", F.explode("w").alias("t"))
            .filter(F.col("t").isin(*BM25_TERMS))
            .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf")))
    df_t = hits.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    bm_nano = _ha_sql(
        f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf"
        f" * ({BM25_K1} + 1.0)"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * dl * cast(n_docs as double) / n_toks)) * 1e9")
    tfidf_nano = _ha_sql(
        "ln(1.0 + tf) * ln(cast(n_docs as double) / df) * 1e9")
    scored = (hits.join(F.broadcast(df_t), "t")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .groupBy("doc_id")
              .agg(F.sum(F.expr(bm_nano)).alias("bm_nano"),
                   F.sum(F.expr(tfidf_nano)).alias("tfidf_nano")))
    ranked = (scored
              .withColumn("r_bm25", F.row_number().over(
                  Window.orderBy(F.col("bm_nano").desc(), "doc_id")))
              .withColumn("r_tfidf", F.row_number().over(
                  Window.orderBy(F.col("tfidf_nano").desc(), "doc_id"))))
    gain = F.expr(f"case when r_bm25 <= {NDCG_K}"
                  f" then {NDCG_K + 1} - r_bm25 else 0 end")
    dcg_term = _ha_sql(
        f"gain / (ln(cast(r_tfidf + 1 as double)) / ln(2.0)) * 1e9")
    idcg_term = _ha_sql(
        f"gain / (ln(cast(ideal_pos + 1 as double)) / ln(2.0)) * 1e9")
    dcg = (ranked.withColumn("gain", gain)
           .filter(F.col("r_tfidf") <= NDCG_K)
           .agg(F.sum(F.expr(dcg_term)).alias("dcg_nano"),
                F.sum(F.when(F.col("gain") > 0, 1).otherwise(0))
                .alias("overlap")))
    idcg = (ranked.withColumn("gain", gain)
            .filter(F.col("gain") > 0)
            .withColumn("ideal_pos", F.row_number().over(
                Window.orderBy(F.col("gain").desc(), "doc_id")))
            .agg(F.sum(F.expr(idcg_term)).alias("idcg_nano")))
    return (dcg.crossJoin(idcg)
            .select("overlap", "dcg_nano", "idcg_nano",
                    (F.round(F.expr(
                        "cast(dcg_nano as double) / idcg_nano"), 6)
                     + 0.0).alias("ndcg")))


register("retrieval_ndcg", retrieval_ndcg, f"""
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), dl AS (
    SELECT doc_id, len(w) AS dl FROM toks
), corpus AS (
    SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl
), hits AS (
    SELECT doc_id, t, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(w) AS t FROM toks)
    WHERE t IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
    GROUP BY 1, 2
), df_t AS (
    SELECT t, COUNT(*) AS df FROM hits GROUP BY 1
), scored AS (
    SELECT h.doc_id,
           CAST(SUM({_ha_sql(
               f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf"
               f" * ({BM25_K1} + 1.0)"
               f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
               f" + {BM25_B} * dl * CAST(n_docs AS DOUBLE) / n_toks))"
               f" * 1e9")}) AS BIGINT) AS bm_nano,
           CAST(SUM({_ha_sql(
               "ln(1.0 + tf) * ln(CAST(n_docs AS DOUBLE) / df) * 1e9"
           )}) AS BIGINT) AS tfidf_nano
    FROM hits h
    JOIN df_t USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
    GROUP BY 1
), ranked AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm_nano DESC, doc_id) AS r_bm25,
           ROW_NUMBER() OVER (ORDER BY tfidf_nano DESC, doc_id)
               AS r_tfidf
    FROM scored
), gains AS (
    SELECT *, CASE WHEN r_bm25 <= {NDCG_K}
                   THEN {NDCG_K + 1} - r_bm25 ELSE 0 END AS gain
    FROM ranked
), dcg AS (
    SELECT CAST(SUM({_ha_sql(
               "gain / (ln(CAST(r_tfidf + 1 AS DOUBLE)) / ln(2.0))"
               " * 1e9")}) AS BIGINT) AS dcg_nano,
           CAST(SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS overlap
    FROM gains WHERE r_tfidf <= {NDCG_K}
), ideal AS (
    SELECT gain, ROW_NUMBER() OVER (ORDER BY gain DESC, doc_id)
               AS ideal_pos
    FROM gains WHERE gain > 0
), idcg AS (
    SELECT CAST(SUM({_ha_sql(
               "gain / (ln(CAST(ideal_pos + 1 AS DOUBLE)) / ln(2.0))"
               " * 1e9")}) AS BIGINT) AS idcg_nano
    FROM ideal
)
SELECT overlap, dcg_nano, idcg_nano,
       ROUND(CAST(dcg_nano AS DOUBLE) / idcg_nano, 6) + 0.0 AS ndcg
FROM dcg CROSS JOIN idcg
""", "NDCG@10 of log-TF-IDF ranking vs BM25-graded relevance")


# ------------------------------------------------ KMV distinct sketch
KMV_K = 64            # k-th minimum hash is the estimator's pivot
KMV_SPACE = 1 << 28   # 7 hex digits of md5 = 28-bit hash domain


def ndv_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per return flag,
    audited against the true NDV — the ORDER-STATISTIC estimator
    family next to ndv_estimator_audit's Bernoulli/value samples:
    hash every key into the 28-bit md5-prefix domain, keep the K
    smallest DISTINCT hash values, estimate D = (K-1) * SPACE / h_(K).
    Deterministic md5 makes the sketch bit-identical in both engines,
    so unlike HLL (queries/sketches.py's library-only
    q_approx_distinct — engine-specific values, no cross-engine
    oracle possible) this approximate
    operator carries a full hash oracle. Groups with fewer than K
    distinct hashes report their exact count (the sketch is exact
    below saturation). The audit's d_true needs a distinct pass
    anyway; the sketch half alone would be a per-partition bottom-K
    merge (K integers per group of state, the 100 TB form)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey")
    dk = li.distinct()
    hashed = dk.select(
        "l_returnflag",
        F.expr("cast(conv(substring(md5(cast(l_partkey as string)), 1, 7),"
               " 16, 10) as bigint)").alias("h"))
    dh = hashed.distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    ranked = dh.withColumn("rn", F.row_number().over(w))
    hk = (ranked.filter(F.col("rn") == KMV_K)
          .select("l_returnflag", F.col("h").alias("h_k")))
    truth = dk.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("d_true"))
    hcnt = dh.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("d_hashes"))
    return (truth.join(hcnt, "l_returnflag")
            .join(hk, "l_returnflag", "left")
            .select(
                "l_returnflag", "d_true", "d_hashes",
                F.expr(f"case when d_hashes < {KMV_K} then d_hashes"
                       f" else ({KMV_K} - 1) * cast({KMV_SPACE} as bigint)"
                       " div greatest(h_k, 1) end").alias("d_kmv"),
                F.expr(f"(case when d_hashes < {KMV_K} then d_hashes"
                       f" else ({KMV_K} - 1) * cast({KMV_SPACE} as bigint)"
                       " div greatest(h_k, 1) end - d_true)"
                       " * 1000000 div d_true").alias("kmv_err_ppm"))
            .orderBy("l_returnflag"))


register("ndv_kmv_sketch", ndv_kmv_sketch, f"""
WITH dk AS (
    SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
), hashed AS (
    SELECT DISTINCT l_returnflag,
           CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 7))
                AS BIGINT) AS h
    FROM dk
), ranked AS (
    SELECT l_returnflag, h,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
    FROM hashed
), hk AS (
    SELECT l_returnflag, h AS h_k FROM ranked WHERE rn = {KMV_K}
), truth AS (
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS d_true
    FROM dk GROUP BY 1
), hcnt AS (
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS d_hashes
    FROM hashed GROUP BY 1
)
SELECT t.l_returnflag, t.d_true, c.d_hashes,
       CAST(CASE WHEN c.d_hashes < {KMV_K} THEN c.d_hashes
                 ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS BIGINT)
                      // GREATEST(k.h_k, 1) END AS BIGINT) AS d_kmv,
       CAST((CASE WHEN c.d_hashes < {KMV_K} THEN c.d_hashes
                  ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS BIGINT)
                       // GREATEST(k.h_k, 1) END - t.d_true)
            * 1000000 // t.d_true AS BIGINT) AS kmv_err_ppm
FROM truth t JOIN hcnt c USING (l_returnflag)
LEFT JOIN hk k USING (l_returnflag)
ORDER BY l_returnflag
""", "KMV k-minimum-values NDV sketch vs true distinct (exact oracle)")


# ------------------------------------- sampled equi-depth histogram
SMP_BUCKETS = 8


def stats_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style equi-depth histogram whose cutpoints come from a
    deterministic 1/{NDV_MOD} row sample (md5 of the row identity) —
    the production mechanism when the fact table is too large to sort:
    cutpoints are exact order statistics OF THE SAMPLE (rank
    j*n_s/{SMP_BUCKETS}), then one full scan buckets every row against
    the broadcast 7-cut array and the audit reports each bucket's
    deviation from the ideal n/{SMP_BUCKETS} in ppm. The sample is
    sort-bounded (1/{NDV_MOD} of the fact), the cut array is
    model-size, and the full table is never sorted — contrast
    stats_histogram_equidepth, whose spine cutpoints avoid even the
    sample sort. All arithmetic exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey", "l_linenumber")
    samp = li.filter(F.expr(
        "pmod(cast(conv(substring(md5(concat(cast(l_orderkey as string),"
        f" '_', cast(l_linenumber as string))), 1, 7), 16, 10) as bigint),"
        f" {NDV_MOD}) = 0")).select("cents")
    ns = samp.agg(F.count(F.lit(1)).alias("n_s"))
    ranked = samp.withColumn(
        "rn", F.row_number().over(Window.orderBy("cents")))
    rank_set = ", ".join(f"{j} * n_s div {SMP_BUCKETS}"
                         for j in range(1, SMP_BUCKETS))
    cuts = (ranked.crossJoin(F.broadcast(ns))
            .filter(F.expr(f"rn in ({rank_set})"))
            .agg(F.sort_array(F.collect_list("cents")).alias("cuts")))
    bucketed = (li.crossJoin(F.broadcast(cuts))
                .select(F.expr("size(filter(cuts, c -> c <= cents))")
                        .alias("bucket"),
                        F.col("cuts"))
                .select("bucket",
                        F.expr("case when bucket >= 1"
                               " then element_at(cuts, bucket) end")
                        .alias("lo_cents"))
                .groupBy("bucket", "lo_cents")
                .agg(F.count(F.lit(1)).alias("n_rows")))
    tot = bucketed.agg(F.sum("n_rows").alias("total"))
    return (bucketed.crossJoin(F.broadcast(tot))
            .select("bucket", "lo_cents", "n_rows",
                    F.expr(f"total div {SMP_BUCKETS}").alias("ideal_rows"),
                    F.expr(f"(n_rows - total div {SMP_BUCKETS}) * 1000000"
                           f" div (total div {SMP_BUCKETS})")
                    .alias("dev_ppm"))
            .orderBy("bucket"))


register("stats_histogram_sampled", stats_histogram_sampled, f"""
WITH li AS (
    SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
           l_orderkey, l_linenumber
    FROM lineitem
), samp AS (
    SELECT cents FROM li
    WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
                || CAST(l_linenumber AS VARCHAR)), 1, 7)) AS BIGINT)
          % {NDV_MOD} = 0
), ns AS (SELECT COUNT(*) AS n_s FROM samp),
ranked AS (
    SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM samp
), cutranks AS (
    SELECT (j.r * n_s) // {SMP_BUCKETS} AS rk
    FROM (SELECT UNNEST(range(1, {SMP_BUCKETS})) AS r) j CROSS JOIN ns
), cuts AS (
    SELECT LIST_SORT(LIST(cents)) AS cl
    FROM ranked WHERE rn IN (SELECT rk FROM cutranks)
), bucketed AS (
    SELECT LEN(LIST_FILTER(cl, c -> c <= cents)) AS bucket,
           CASE WHEN LEN(LIST_FILTER(cl, c -> c <= cents)) >= 1
                THEN cl[LEN(LIST_FILTER(cl, c -> c <= cents))] END
               AS lo_cents,
           COUNT(*) AS n_rows
    FROM li CROSS JOIN cuts GROUP BY 1, 2
), tot AS (SELECT SUM(n_rows) AS total FROM bucketed)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(lo_cents AS BIGINT) AS lo_cents,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(total // {SMP_BUCKETS} AS BIGINT) AS ideal_rows,
       CAST((n_rows - total // {SMP_BUCKETS}) * 1000000
            // (total // {SMP_BUCKETS}) AS BIGINT) AS dev_ppm
FROM bucketed CROSS JOIN tot ORDER BY bucket
""", "equi-depth histogram from a deterministic row sample (ANALYZE path)")


# ------------------------------------------------- MRR / hit@k audit
def retrieval_mrr_hitk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and hit@k of the log-TF-IDF ranking against BM25-graded
    relevance, treating each SOURCE as one query (rankings are
    per-source partitions over the shared corpus-level tf/df stats):
    the rank-of-first-relevant companion to retrieval_ndcg's graded
    gain. Relevant = that source's BM25 top-{K}; reciprocal rank is
    exact integer ppm (1e6 div rank). Same nano-quantized integer
    scores as retrieval_rrf_fusion, so ranking ties are impossible
    cross-engine; one row per source keeps the output model-size."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.expr("split(lower(text), ' ')").alias("w")))
    dl = toks.select("doc_id", "source", F.expr("size(w)").alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("n_toks"))
    hits = (toks.select("doc_id", F.explode("w").alias("t"))
            .filter(F.col("t").isin(*BM25_TERMS))
            .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf")))
    df_t = hits.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    bm_nano = _ha_sql(
        f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf"
        f" * ({BM25_K1} + 1.0)"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * dl * cast(n_docs as double) / n_toks)) * 1e9")
    tfidf_nano = _ha_sql(
        "ln(1.0 + tf) * ln(cast(n_docs as double) / df) * 1e9")
    scored = (hits.join(F.broadcast(df_t), "t")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .groupBy("doc_id", "source")
              .agg(F.sum(F.expr(bm_nano)).alias("bm_nano"),
                   F.sum(F.expr(tfidf_nano)).alias("tfidf_nano")))
    ranked = (scored
              .withColumn("r_bm25", F.row_number().over(
                  Window.partitionBy("source")
                  .orderBy(F.col("bm_nano").desc(), "doc_id")))
              .withColumn("r_tfidf", F.row_number().over(
                  Window.partitionBy("source")
                  .orderBy(F.col("tfidf_nano").desc(), "doc_id"))))
    return (ranked.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_ranked"),
                 F.min(F.when(F.col("r_bm25") <= NDCG_K,
                              F.col("r_tfidf"))).alias("first_rel_rank"))
            .select("source", "n_ranked", "first_rel_rank",
                    F.expr("1000000 div first_rel_rank").alias("rr_ppm"),
                    F.expr("cast(first_rel_rank <= 1 as int)").alias("hit1"),
                    F.expr("cast(first_rel_rank <= 3 as int)").alias("hit3"),
                    F.expr("cast(first_rel_rank <= 10 as int)")
                    .alias("hit10"))
            .orderBy("source"))


register("retrieval_mrr_hitk", retrieval_mrr_hitk, f"""
WITH toks AS (
    SELECT doc_id, source, string_split(lower(text), ' ') AS w
    FROM documents
), dl AS (
    SELECT doc_id, source, len(w) AS dl FROM toks
), corpus AS (
    SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl
), hits AS (
    SELECT doc_id, t, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(w) AS t FROM toks)
    WHERE t IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
    GROUP BY 1, 2
), df_t AS (
    SELECT t, COUNT(*) AS df FROM hits GROUP BY 1
), scored AS (
    SELECT h.doc_id, dl.source,
           CAST(SUM({_ha_sql(
               f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf"
               f" * ({BM25_K1} + 1.0)"
               f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
               f" + {BM25_B} * dl * CAST(n_docs AS DOUBLE) / n_toks))"
               f" * 1e9")}) AS BIGINT) AS bm_nano,
           CAST(SUM({_ha_sql(
               "ln(1.0 + tf) * ln(CAST(n_docs AS DOUBLE) / df) * 1e9"
           )}) AS BIGINT) AS tfidf_nano
    FROM hits h
    JOIN df_t USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
    GROUP BY 1, 2
), ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY bm_nano DESC, doc_id) AS r_bm25,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY tfidf_nano DESC, doc_id) AS r_tfidf
    FROM scored
), per_src AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_ranked,
           CAST(MIN(CASE WHEN r_bm25 <= {NDCG_K} THEN r_tfidf END)
                AS INT) AS first_rel_rank
    FROM ranked GROUP BY 1
)
SELECT source, n_ranked, first_rel_rank,
       CAST(1000000 // first_rel_rank AS BIGINT) AS rr_ppm,
       CAST(first_rel_rank <= 1 AS INT) AS hit1,
       CAST(first_rel_rank <= 3 AS INT) AS hit3,
       CAST(first_rel_rank <= 10 AS INT) AS hit10
FROM per_src ORDER BY source
""", "per-source MRR + hit@k of TF-IDF ranking vs BM25 relevance")


# --------------------------------------------- engine tuning advisor
ETA_TARGET_PART_BYTES = 8 * 1024 * 1024   # fixture-scale partition target
ETA_BROADCAST_BYTES = 10 * 1024 * 1024    # autoBroadcastJoinThreshold


def engine_tuning_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-driven tuning advice for the three fact tables — the
    ANALYZE-to-knobs step an engine runs before sizing a job: byte
    estimates come from exact per-row widths (string lengths + fixed
    numeric widths, the in-memory columnar estimate), and the advice
    is pure integer arithmetic on them: shuffle-partition count at a
    {ETA_TARGET_PART_BYTES}-byte target (fixture-scale; production
    would use 128 MB), next-power-of-two bucket count, and a
    broadcastability verdict at the default 10 MB threshold. One scan
    per table, one row per table out."""
    specs = {
        "lineitem": ("length(l_returnflag) + length(l_linestatus)"
                     " + 3 * 8 + 4 + 4 * 8 + 8"),
        "orders": ("length(o_orderstatus) + length(o_orderpriority)"
                   " + 2 * 8 + 8 + 8"),
        "events": ("length(event_type) + length(coalesce(props, ''))"
                   " + 4 * 8"),
    }
    pow2 = ("case " + " ".join(
        f"when advised_partitions <= {1 << p} then {1 << p}"
        for p in range(11)) + " else 2048 end")
    out = None
    for name, width in specs.items():
        t = load_table(spark, sf_dir, name)
        part = (t.agg(F.count(F.lit(1)).alias("n_rows"),
                      F.sum(F.expr(f"cast(({width}) as bigint)"))
                      .alias("est_bytes"))
                .select(F.lit(name).alias("table_name"), "n_rows",
                        "est_bytes",
                        F.expr(f"greatest(1, est_bytes"
                               f" div {ETA_TARGET_PART_BYTES})")
                        .alias("advised_partitions"))
                .withColumn("advised_buckets", F.expr(pow2))
                .withColumn("broadcastable", F.expr(
                    f"cast(est_bytes <= {ETA_BROADCAST_BYTES} as int)")))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("table_name")


def _eta_oracle() -> str:
    specs = {
        "lineitem": ("length(l_returnflag) + length(l_linestatus)"
                     " + 3 * 8 + 4 + 4 * 8 + 8"),
        "orders": ("length(o_orderstatus) + length(o_orderpriority)"
                   " + 2 * 8 + 8 + 8"),
        "events": ("length(event_type) + length(coalesce(props, ''))"
                   " + 4 * 8"),
    }
    parts = []
    for name, width in specs.items():
        pow2 = ("CASE " + " ".join(
            f"WHEN GREATEST(1, SUM(CAST(({width}) AS BIGINT))"
            f" // {ETA_TARGET_PART_BYTES}) <= {1 << p} THEN {1 << p}"
            for p in range(11)) + " ELSE 2048 END")
        parts.append(f"""
SELECT '{name}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(({width}) AS BIGINT)) AS BIGINT) AS est_bytes,
       CAST(GREATEST(1, SUM(CAST(({width}) AS BIGINT))
            // {ETA_TARGET_PART_BYTES}) AS BIGINT) AS advised_partitions,
       CAST({pow2} AS BIGINT) AS advised_buckets,
       CAST(CASE WHEN SUM(CAST(({width}) AS BIGINT))
                 <= {ETA_BROADCAST_BYTES} THEN 1 ELSE 0 END AS INT)
           AS broadcastable
FROM {name}""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name"


register("engine_tuning_advisor", engine_tuning_advisor, _eta_oracle(),
         "stats-driven shuffle/bucket/broadcast sizing advice per table")


# --------------------------------------- compression-entropy advisor
def compression_entropy_advisor(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Codec advisor from zero-order character entropy per source: the
    Shannon bound H (bits/char) is the floor any entropy coder can
    reach without context modeling, so H/8 estimates the best-case
    compressed fraction and ranks which sources deserve a heavier
    codec or dictionary encoding. One char-position explode collapses
    map-side into the (source x charset) census — the shuffle key is
    the alphabet, never the corpus; each cell's -p*log2(p) term is
    half-away-quantized to integer nano-bits BEFORE the per-source
    sum, so the entropy is order-free exact. Output also carries the
    distinct-char count (the dictionary-encoding signal)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    chars = (docs
             .select("source",
                     F.explode(F.expr("sequence(1, length(text))"))
                     .alias("i"), "text")
             .select("source", F.expr("substring(text, i, 1)").alias("ch")))
    census = chars.groupBy("source", "ch").agg(
        F.count(F.lit(1)).alias("c"))
    tot = census.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct"))
    term = _ha_sql("1e9 * (cast(c as double) / n)"
                   " * (ln(cast(n as double) / c) / ln(2.0))")
    return (census.join(tot, "source")
            .select("source", "n", "n_distinct",
                    F.expr(term).alias("t_nano"))
            .groupBy("source")
            .agg(F.max("n").alias("n_chars"),
                 F.max("n_distinct").alias("n_distinct_chars"),
                 F.expr("sum(t_nano) div 1000000").alias("entropy_millibits"),
                 F.expr("sum(t_nano) div 8000").alias("est_ratio_ppm"))
            .orderBy("source"))


_CEA_TERM = _ha_sql("1e9 * (CAST(c AS DOUBLE) / n)"
                    " * (LN(CAST(n AS DOUBLE) / c) / LN(2.0))")

register("compression_entropy_advisor", compression_entropy_advisor, f"""
WITH chars AS (
    SELECT source, substr(text, i, 1) AS ch
    FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
), census AS (
    SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c
    FROM chars GROUP BY 1, 2
), tot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM census GROUP BY 1
), terms AS (
    SELECT census.source, tot.n, tot.n_distinct,
           {_CEA_TERM} AS t_nano
    FROM census JOIN tot ON census.source = tot.source
)
SELECT source, MAX(n) AS n_chars,
       MAX(n_distinct) AS n_distinct_chars,
       CAST(SUM(t_nano) // 1000000 AS BIGINT) AS entropy_millibits,
       CAST(SUM(t_nano) // 8000 AS BIGINT) AS est_ratio_ppm
FROM terms GROUP BY source ORDER BY source
""", "zero-order char entropy per source -> codec/dictionary advice")


# --------------------------------------------------- RLE advisor
def engine_rle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length-encoding advisor for the event_type column under
    two physical layouts: hour-clustered arrival order vs
    user-clustered order — the layout decision behind columnar
    encoding pickers (RLE pays off only if the chosen sort order
    creates runs; the SAME column can be incompressible in one order
    and 1000x in another). Runs RESET at the cluster boundary (hour /
    user), which is exactly what a partitioned layout gives the
    encoder and keeps every window PARTITIONED — no global total
    order anywhere, so the plan scales with the cluster key's
    cardinality, not a single sorted partition. Run starts are exact
    integer lag compares; both engines compute the identical reset
    semantics."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns", "event_id",
        F.expr("ts_ns div 3600000000000").alias("hr"))
    tot = ev.groupBy().agg(F.count(F.lit(1)).alias("n_rows"))

    def runs(part_col, name):
        w = Window.partitionBy(part_col).orderBy("ts_ns", "event_id")
        return (ev.withColumn("prev", F.lag("event_type").over(w))
                .agg(F.sum(F.expr(
                    "case when prev is null or prev != event_type"
                    " then 1 else 0 end")).alias("n_runs"))
                .select(F.lit(name).alias("sort_order"), "n_runs"))

    both = (runs("hr", "by_hour_time")
            .unionByName(runs("user_id", "by_user_time")))
    return (both.crossJoin(F.broadcast(tot))
            .select("sort_order",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("n_runs").cast("long").alias("n_runs"),
                    F.expr("n_runs * 1000000 div n_rows")
                    .alias("rle_ratio_ppm"))
            .orderBy("sort_order"))


register("engine_rle_advisor", engine_rle_advisor, """
WITH ev AS (
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns, event_id,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 3600000000000 AS hr
    FROM events
), by_hour AS (
    SELECT 'by_hour_time' AS sort_order,
           CAST(SUM(CASE WHEN prev IS NULL OR prev != event_type
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM (SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY hr
                     ORDER BY ts_ns, event_id) AS prev
          FROM ev)
), by_user AS (
    SELECT 'by_user_time' AS sort_order,
           CAST(SUM(CASE WHEN prev IS NULL OR prev != event_type
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM (SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts_ns, event_id) AS prev
          FROM ev)
)
SELECT sort_order, (SELECT COUNT(*) FROM ev) AS n_rows, n_runs,
       n_runs * 1000000 // (SELECT COUNT(*) FROM ev) AS rle_ratio_ppm
FROM (SELECT * FROM by_hour UNION ALL SELECT * FROM by_user)
ORDER BY sort_order
""", "RLE run counts for event_type under two clustered layouts")
