"""Data-quality validation and audience set-analysis operators.

The pre-ingest gate of a training-data pipeline ("does this snapshot
satisfy its contract?") plus exact set-overlap analytics, each in its
scale-correct decomposition:

- column profile: a Deequ-style constraint report — completeness,
  uniqueness, range, domain and pattern conformance — computed in ONE
  scan as a single wide aggregate row, then unpivoted to (column,
  metric, value) tuples with stack(). Every metric is an integer
  (ranges in cents), so the report hashes exactly.
- audience overlap: exact pairwise user-set intersections between
  event types WITHOUT a fact self-join. Each user reduces to one type
  BITMASK row; mask frequencies form a model-size table (<= 2^T rows
  for T types), and every |A ∩ B| / |A ∪ B| is then computed on that
  tiny table. Bounded for T <= ~20 types (2^20 = 1M mask rows); past
  that the same answer comes from basket_brand_lift's per-row sorted
  pair explode, which is linear in T^2 per user instead.
- churn hazard: the discrete-time hazard table of the Kaplan-Meier
  estimator — per lifetime-day: churns, at-risk counts (a cumulative
  window over the bounded day domain) and the ppm hazard. The
  cumulative product (the survival curve itself) is deliberately NOT
  emitted: it is a float product whose last ulp could differ between
  engines; the hazard table carries the same information in exact
  integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import clip_bin

DAY_NS = 86_400_000_000_000


# -------------------------------------------- Deequ-style DQ report
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint metrics over the orders snapshot, one scan: row count,
    key uniqueness (distinct == n), per-column null counts, price range
    in integer cents, status-domain violations and priority-pattern
    violations. The wide 1-row aggregate unpivots via stack() — the
    whole report is a single job with no shuffle beyond the aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("key_distinct"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .alias("custkey_nulls"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .alias("price_nulls"),
        F.min(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .alias("price_min_cents"),
        F.max(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .alias("price_max_cents"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0)
              .otherwise(1)).alias("status_violations"),
        F.sum(F.when(F.col("o_orderpriority").rlike("^[1-5]-"), 0)
              .otherwise(1)).alias("priority_violations"),
    )
    return agg.selectExpr(
        "stack(8,"
        " 'o_orderkey',     'n_rows',              n_rows,"
        " 'o_orderkey',     'n_distinct',          key_distinct,"
        " 'o_custkey',      'n_null',              custkey_nulls,"
        " 'o_totalprice',   'n_null',              price_nulls,"
        " 'o_totalprice',   'min_cents',           price_min_cents,"
        " 'o_totalprice',   'max_cents',           price_max_cents,"
        " 'o_orderstatus',  'n_out_of_domain',     status_violations,"
        " 'o_orderpriority','n_nonconforming',     priority_violations"
        ") AS (column_name, metric, value)"
    ).orderBy("column_name", "metric")


register("dq_column_profile", dq_column_profile, """
WITH agg AS (
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderkey) AS key_distinct,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS custkey_nulls,
           SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
               AS price_nulls,
           MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
               AS price_min_cents,
           MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
               AS price_max_cents,
           SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END)
               AS status_violations,
           SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                    THEN 0 ELSE 1 END) AS priority_violations
    FROM orders
)
SELECT column_name, metric, CAST(value AS BIGINT) AS value FROM (
    SELECT 'o_orderkey' AS column_name, 'n_rows' AS metric,
           n_rows AS value FROM agg
    UNION ALL SELECT 'o_orderkey', 'n_distinct', key_distinct FROM agg
    UNION ALL SELECT 'o_custkey', 'n_null', custkey_nulls FROM agg
    UNION ALL SELECT 'o_totalprice', 'n_null', price_nulls FROM agg
    UNION ALL SELECT 'o_totalprice', 'min_cents', price_min_cents FROM agg
    UNION ALL SELECT 'o_totalprice', 'max_cents', price_max_cents FROM agg
    UNION ALL SELECT 'o_orderstatus', 'n_out_of_domain',
                     status_violations FROM agg
    UNION ALL SELECT 'o_orderpriority', 'n_nonconforming',
                     priority_violations FROM agg
)
ORDER BY column_name, metric
""", "one-scan Deequ-style constraint report, unpivoted to metric rows")


# ------------------------------------- exact audience overlap matrix
def overlap_frame(ev_raw: DataFrame) -> DataFrame:
    """Core of audience_overlap_matrix over any (user_id, event_type)
    frame — exposed for the replica scale-up test. Only pairs with a
    NONZERO intersection are emitted (the oracle's user self-join can
    never see a disjoint pair, so the contract is pinned there too).
    Masks are bigint: correct through 62 types, and assert_true on the
    bit position fails loudly past that instead of silently wrapping."""
    ev = ev_raw.select("user_id", "event_type").distinct()
    types = (ev.select("event_type").distinct()
             .withColumn("bit", F.row_number().over(
                 Window.orderBy("event_type")) - 1)
             .withColumn("bit", F.when(F.assert_true(F.col("bit") < 62)
                                       .isNull(), F.col("bit"))))
    masks = (ev.join(F.broadcast(types), "event_type")
             .groupBy("user_id")
             .agg(F.sum(F.expr(
                 "shiftleft(cast(1 AS bigint), cast(bit AS int))"))
                 .alias("mask")))
    mask_freq = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n_users"))
    pairs = (types.alias("a").crossJoin(types.alias("b"))
             .filter(F.col("a.event_type") < F.col("b.event_type"))
             .select(F.col("a.event_type").alias("type_a"),
                     F.col("b.event_type").alias("type_b"),
                     F.col("a.bit").alias("bit_a"),
                     F.col("b.bit").alias("bit_b")))
    joined = F.broadcast(pairs).crossJoin(mask_freq)
    has_a = F.expr(
        "(mask div shiftleft(cast(1 AS bigint), cast(bit_a AS int))) % 2 = 1")
    has_b = F.expr(
        "(mask div shiftleft(cast(1 AS bigint), cast(bit_b AS int))) % 2 = 1")
    return (joined.groupBy("type_a", "type_b")
            .agg(F.sum(F.when(has_a, F.col("n_users")).otherwise(0))
                 .alias("n_a"),
                 F.sum(F.when(has_b, F.col("n_users")).otherwise(0))
                 .alias("n_b"),
                 F.sum(F.when(has_a & has_b, F.col("n_users")).otherwise(0))
                 .alias("n_both"))
            .filter(F.col("n_both") > 0)
            .select("type_a", "type_b", "n_a", "n_b", "n_both",
                    F.expr("n_both * 1000000 div (n_a + n_b - n_both)")
                    .alias("jaccard_ppm"))
            .orderBy("type_a", "type_b"))


def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap between event types via the
    bitmask reduction: one distinct pass gives (user, type), a
    broadcast row_number over the sorted type dimension assigns bit
    positions, each user folds to a single integer mask, and mask
    FREQUENCIES (a <= 2^T-row model table) answer every |A∩B|, |A∪B|
    and Jaccard exactly — the corpus is touched once and no user ever
    meets another user in a join."""
    return overlap_frame(load_table(spark, sf_dir, "events"))


register("audience_overlap_matrix", audience_overlap_matrix, """
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), per_type AS (
    SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
), ab AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(n_both * 1000000 // (pa.n + pb.n - n_both) AS BIGINT)
           AS jaccard_ppm
FROM ab
JOIN per_type pa ON type_a = pa.event_type
JOIN per_type pb ON type_b = pb.event_type
ORDER BY type_a, type_b
""", "exact audience Jaccard matrix via bitmask reduction (no user join)")


# -------------------------------- wide-regime audience overlap twin
def overlap_wide_frame(ev_raw: DataFrame) -> DataFrame:
    """audience_overlap_matrix's answer via the basket-style sorted
    pair explode (basket_brand_lift's shape) instead of the bitmask
    fold: each user reduces to ONE sorted type array (bounded by the
    type dimension), pairs explode from the array with the index-offset
    lambda — per-user work is T^2, with NO 2^T mask-domain anywhere —
    so this is the registered path for the >~20-type regime where the
    mask table outgrows its model-size budget (and past 62 types, where
    the bigint mask cannot exist at all). Per-type audience sizes
    attach via one broadcast; intersections never join users to users.
    Same output contract as the bitmask twin — a test pins frame
    equality between the two paths on the same input."""
    ev = ev_raw.select("user_id", "event_type").distinct()
    sets = (ev.groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("types")))
    pairs = (sets.select(F.explode(F.expr(
        "flatten(transform(types, (x, i) ->"
        " transform(slice(types, i + 2, size(types)),"
        " y -> struct(x AS type_a, y AS type_b))))")).alias("p"))
        .select("p.type_a", "p.type_b"))
    n_both = (pairs.groupBy("type_a", "type_b")
              .agg(F.count(F.lit(1)).alias("n_both")))
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (n_both
            .join(F.broadcast(per_type.select(
                F.col("event_type").alias("type_a"),
                F.col("n").alias("n_a"))), "type_a")
            .join(F.broadcast(per_type.select(
                F.col("event_type").alias("type_b"),
                F.col("n").alias("n_b"))), "type_b")
            .select("type_a", "type_b", "n_a", "n_b", "n_both",
                    F.expr("n_both * 1000000 div (n_a + n_b - n_both)")
                    .alias("jaccard_ppm"))
            .orderBy("type_a", "type_b"))


def audience_overlap_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap for the wide-type regime: the
    sorted-pair-explode decomposition (see overlap_wide_frame), linear
    in users x T^2 instead of mask-domain-bounded. Emits the identical
    matrix as audience_overlap_matrix wherever both are defined."""
    return overlap_wide_frame(load_table(spark, sf_dir, "events"))


register("audience_overlap_wide", audience_overlap_wide, """
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), per_type AS (
    SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
), ab AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(n_both * 1000000 // (pa.n + pb.n - n_both) AS BIGINT)
           AS jaccard_ppm
FROM ab
JOIN per_type pa ON type_a = pa.event_type
JOIN per_type pb ON type_b = pb.event_type
ORDER BY type_a, type_b
""", "audience Jaccard matrix via sorted pair explode (>20-type regime)")


# ----------------------------------------- discrete churn hazard
def hazard_frame(ev: DataFrame) -> DataFrame:
    """Core of user_churn_hazard over any (user_id, ts_ns) frame —
    exposed for the replica scale-up test."""
    life = (ev.groupBy("user_id")
            .agg(F.expr(f"(max(ts_ns) - min(ts_ns)) div {DAY_NS}")
                 .alias("lifetime_d")))
    per_day = life.groupBy("lifetime_d").agg(
        F.count(F.lit(1)).alias("n_churned"))
    w = (Window.orderBy("lifetime_d")
         .rowsBetween(Window.unboundedPreceding, -1))
    tot = per_day.agg(F.sum("n_churned").alias("n_total"))
    return (per_day.crossJoin(F.broadcast(tot))
            .withColumn("n_at_risk",
                        F.col("n_total")
                        - F.coalesce(F.sum("n_churned").over(w), F.lit(0)))
            .select("lifetime_d", "n_churned", "n_at_risk",
                    F.expr("n_churned * 1000000 div n_at_risk")
                    .alias("hazard_ppm"))
            .orderBy("lifetime_d"))


def user_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard table: per user lifetime (days
    between first and last event), the number churning at each
    lifetime-day and the at-risk count (everyone whose lifetime is >=
    that day — a cumulative window over the BOUNDED lifetime-day
    domain), with the hazard in integer ppm. The float survival
    product is deliberately left to the consumer; every emitted value
    here is exact."""
    return hazard_frame(load_table(spark, sf_dir, "events")
                        .select("user_id", "ts_ns"))


register("user_churn_hazard", user_churn_hazard, f"""
WITH life AS (
    SELECT user_id,
           (MAX(CAST(epoch_us(ts) AS BIGINT)) * 1000
            - MIN(CAST(epoch_us(ts) AS BIGINT)) * 1000) // {DAY_NS}
               AS lifetime_d
    FROM events GROUP BY user_id
), per_day AS (
    SELECT lifetime_d, COUNT(*) AS n_churned FROM life GROUP BY lifetime_d
), tot AS (SELECT CAST(SUM(n_churned) AS BIGINT) AS n_total FROM per_day)
SELECT lifetime_d, n_churned,
       n_total - COALESCE(CAST(SUM(n_churned) OVER (
           ORDER BY lifetime_d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS n_at_risk,
       CAST(n_churned * 1000000 // (n_total - COALESCE(CAST(SUM(n_churned)
           OVER (ORDER BY lifetime_d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0)) AS BIGINT) AS hazard_ppm
FROM per_day CROSS JOIN tot
ORDER BY lifetime_d
""", "discrete Kaplan-Meier hazard table in exact integers")


# -------------------------------- weighted median at scale
N_WM_BINS = 1024


def weighted_median_frame(li: DataFrame) -> DataFrame:
    """Core of lineitem_weighted_median over any (l_returnflag,
    l_extendedprice, w) frame — exposed for the replica scale-up
    test."""
    stats = li.agg(F.min("l_extendedprice").alias("mn"),
                   F.max("l_extendedprice").alias("mx"))
    binned = (li.crossJoin(F.broadcast(stats))
              .select("l_returnflag", "w", "mn", "mx",
                      clip_bin(F.col("l_extendedprice"), F.col("mn"),
                               F.col("mx"), N_WM_BINS).alias("bin")))
    per_bin = binned.groupBy("l_returnflag", "bin").agg(
        F.sum("w").alias("bw"),
        F.first("mn").alias("mn"), F.first("mx").alias("mx"))
    wcum = Window.partitionBy("l_returnflag").orderBy("bin")
    tot = per_bin.groupBy("l_returnflag").agg(F.sum("bw").alias("tw"))
    hits = (per_bin
            .withColumn("cum", F.sum("bw").over(wcum))
            .join(F.broadcast(tot), "l_returnflag")
            .filter(F.col("cum") * 2 >= F.col("tw")))
    return (hits.groupBy("l_returnflag")
            .agg(F.first("tw").alias("total_weight"),
                 F.min("bin").alias("median_bin"),
                 F.first("mn").alias("mn"), F.first("mx").alias("mx"))
            .select("l_returnflag", "total_weight", "median_bin",
                    F.floor((F.col("mn") + F.col("median_bin")
                             * (F.col("mx") - F.col("mn")) / N_WM_BINS)
                            * 100).cast("long").alias("median_lo_cents"))
            .orderBy("l_returnflag"))


def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag, via the
    quantized-histogram decomposition: prices bin into 1024 equi-width
    buckets from a broadcast 1-row min/max, weights aggregate per
    (flag, bin), and the median bin is the first whose doubled
    cumulative weight reaches the total — a window over <= flags x 1024
    rows, NEVER a per-group sort of the fact table. Bin resolution is
    the operator contract (same trade as events_value_ks_drift); the
    emitted bin lower bound uses the identical IEEE expression on both
    engines."""
    return weighted_median_frame(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice",
            F.col("l_quantity").cast("long").alias("w")))


register("lineitem_weighted_median", lineitem_weighted_median, f"""
WITH stats AS (
    SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
    FROM lineitem
), binned AS (
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS w, mn, mx,
           CASE WHEN mx = mn THEN 0 ELSE
                LEAST({N_WM_BINS - 1},
                      CAST(FLOOR((l_extendedprice - mn) * {N_WM_BINS}
                                 / (mx - mn)) AS BIGINT)) END AS bin
    FROM lineitem CROSS JOIN stats
), per_bin AS (
    SELECT l_returnflag, bin, CAST(SUM(w) AS BIGINT) AS bw,
           ANY_VALUE(mn) AS mn, ANY_VALUE(mx) AS mx
    FROM binned GROUP BY 1, 2
), tot AS (
    SELECT l_returnflag, CAST(SUM(bw) AS BIGINT) AS tw
    FROM per_bin GROUP BY 1
), hits AS (
    SELECT p.l_returnflag, p.bin, p.mn, p.mx, t.tw,
           CAST(SUM(p.bw) OVER (PARTITION BY p.l_returnflag
                                ORDER BY p.bin) AS BIGINT) AS cum
    FROM per_bin p JOIN tot t ON p.l_returnflag = t.l_returnflag
)
SELECT l_returnflag, ANY_VALUE(tw) AS total_weight,
       MIN(bin) AS median_bin,
       CAST(FLOOR((ANY_VALUE(mn) + MIN(bin)
                   * (ANY_VALUE(mx) - ANY_VALUE(mn)) / {N_WM_BINS}) * 100)
            AS BIGINT) AS median_lo_cents
FROM hits WHERE cum * 2 >= tw
GROUP BY l_returnflag ORDER BY l_returnflag
""", "quantity-weighted median via quantized histogram (no fact sort)")


# ----------------------------------- robust (median/MAD) outliers
MAD_K = 3   # flag rows beyond 3 MADs


def lineitem_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per return flag: median and MAD (median
    absolute deviation) of the extended price over the shared 1024-bin
    quantized domain, then the count of rows beyond 3 MADs. Both
    medians are first-crossing scans of cumulative windows over the
    BOUNDED bin table (never a fact sort), and every emitted number is
    an exact integer — the z-score twin (events_anomaly_zscore) breaks
    under heavy tails; this is the estimator that doesn't."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    stats = li.agg(F.min("l_extendedprice").alias("mn"),
                   F.max("l_extendedprice").alias("mx"))
    binned = (li.crossJoin(F.broadcast(stats))
              .select("l_returnflag",
                      clip_bin(F.col("l_extendedprice"), F.col("mn"),
                               F.col("mx"), N_WM_BINS).alias("bin")))
    # four consumers (median, deviations, MAD, final count) branch off
    # per_bin; caching the <= flags x 1024-row aggregate keeps the
    # lineitem scan + binning to ONE pass instead of four
    per_bin = binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("n")).cache()
    tot = per_bin.groupBy("l_returnflag").agg(F.sum("n").alias("nt"))
    wb = Window.partitionBy("l_returnflag").orderBy("bin")
    med = (per_bin.withColumn("cum", F.sum("n").over(wb))
           .join(F.broadcast(tot), "l_returnflag")
           .filter(F.col("cum") * 2 >= F.col("nt"))
           .groupBy("l_returnflag").agg(F.min("bin").alias("med")))
    dev = (per_bin.join(F.broadcast(med), "l_returnflag")
           .select("l_returnflag", F.abs(F.col("bin") - F.col("med"))
                   .alias("d"), "n")
           .groupBy("l_returnflag", "d").agg(F.sum("n").alias("nd")))
    wd = Window.partitionBy("l_returnflag").orderBy("d")
    mad = (dev.withColumn("cum", F.sum("nd").over(wd))
           .join(F.broadcast(tot), "l_returnflag")
           .filter(F.col("cum") * 2 >= F.col("nt"))
           .groupBy("l_returnflag").agg(F.min("d").alias("mad")))
    return (per_bin
            .join(F.broadcast(med), "l_returnflag")
            .join(F.broadcast(mad), "l_returnflag")
            .join(F.broadcast(tot), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(F.first("nt").alias("n_rows"),
                 F.first("med").alias("median_bin"),
                 F.first("mad").alias("mad_bins"),
                 F.sum(F.when(F.abs(F.col("bin") - F.col("med"))
                              > MAD_K * F.col("mad"), F.col("n"))
                       .otherwise(0)).alias("n_outliers"))
            .select("l_returnflag", "n_rows", "median_bin", "mad_bins",
                    "n_outliers",
                    F.expr("n_outliers * 1000000 div n_rows")
                    .alias("outlier_ppm"))
            .orderBy("l_returnflag"))


register("lineitem_mad_outliers", lineitem_mad_outliers, f"""
WITH stats AS (
    SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
    FROM lineitem
), binned AS (
    SELECT l_returnflag,
           CASE WHEN mx = mn THEN 0 ELSE
                LEAST({N_WM_BINS - 1},
                      CAST(FLOOR((l_extendedprice - mn) * {N_WM_BINS}
                                 / (mx - mn)) AS BIGINT)) END AS bin
    FROM lineitem CROSS JOIN stats
), per_bin AS (
    SELECT l_returnflag, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2
), tot AS (
    SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS nt
    FROM per_bin GROUP BY 1
), med AS (
    SELECT l_returnflag, MIN(bin) AS med FROM (
        SELECT p.l_returnflag, p.bin, t.nt,
               CAST(SUM(p.n) OVER (PARTITION BY p.l_returnflag
                                   ORDER BY p.bin) AS BIGINT) AS cum
        FROM per_bin p JOIN tot t USING (l_returnflag)
    ) WHERE cum * 2 >= nt GROUP BY 1
), dev AS (
    SELECT p.l_returnflag, ABS(p.bin - m.med) AS d,
           CAST(SUM(p.n) AS BIGINT) AS nd
    FROM per_bin p JOIN med m USING (l_returnflag)
    GROUP BY 1, 2
), mad AS (
    SELECT l_returnflag, MIN(d) AS mad FROM (
        SELECT v.l_returnflag, v.d, t.nt,
               CAST(SUM(v.nd) OVER (PARTITION BY v.l_returnflag
                                    ORDER BY v.d) AS BIGINT) AS cum
        FROM dev v JOIN tot t USING (l_returnflag)
    ) WHERE cum * 2 >= nt GROUP BY 1
)
SELECT p.l_returnflag, ANY_VALUE(t.nt) AS n_rows,
       ANY_VALUE(m.med) AS median_bin, ANY_VALUE(a.mad) AS mad_bins,
       CAST(SUM(CASE WHEN ABS(p.bin - m.med) > {MAD_K} * a.mad
                THEN p.n ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN ABS(p.bin - m.med) > {MAD_K} * a.mad
                THEN p.n ELSE 0 END) * 1000000 // ANY_VALUE(t.nt)
            AS BIGINT) AS outlier_ppm
FROM per_bin p
JOIN med m USING (l_returnflag)
JOIN mad a USING (l_returnflag)
JOIN tot t USING (l_returnflag)
GROUP BY p.l_returnflag ORDER BY p.l_returnflag
""", "median/MAD robust outlier profile over the quantized bin domain")


# ------------------------------------- deterministic Poisson bootstrap
# Inverse-CDF thresholds for Poisson(1) in integer ppm, computed ONCE
# and embedded as literals in BOTH engines' plans (the Benford
# convention): a uniform u in [0, 1e6) maps to the bootstrap weight w =
# #times the row enters the replicate. P(w > 9) < 1e-7 is truncated to
# 9 — part of the operator contract, mirrored exactly in the oracle.
import math as _math

BOOT_R = 64
_pois_cum, _acc = [], 0.0
for _k in range(9):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _pois_cum.append(round(_acc * 1_000_000))
_POIS_CASE = ("CASE " + " ".join(
    f"WHEN u < {c} THEN {k}" for k, c in enumerate(_pois_cum))
    + " ELSE 9 END")

# Per-(row, replicate) uniform WITHOUT per-row string hashing: the
# weight expression runs rows x 64 times, and md5-of-concat there is
# ~10x the whole query's remaining cost (13.1 s -> ~1.5 s at sf0.1).
# Three Knuth multiplicative rounds mod 2^31 with XOR-SHIFT mixes
# between and after them — pure int64-safe integer arithmetic,
# bit-identical on both engines. The xorshift steps matter: bare
# multiplicative rounds compose to an AFFINE map of (key, r), so
# per-row replicate weights would form a fixed-increment lattice and
# the bootstrap SE (the query's deliverable) deviates 25-30% on
# sequential key sets (collapsing ~5x when values correlate with
# keys). Folding high bits down (h ^ h>>13 / h>>7) between multiplies
# breaks the linearity; the measured SE-vs-true-Poisson ratio over 8
# disjoint sequential-key blocks with key-linear values is
# 0.99 +/- 0.13 (tests/test_r7_kernels.py pins the generator).
# Keys are reduced mod 2^31 first, and every intermediate stays
# < 2^31 (xorshift of a <2^31 value is <2^31), so the 2654435761
# products stay under 2^63 at any key magnitude.
_KNUTH, _M31 = 2654435761, 2147483648
_SPARK_H1 = (f"(pmod(pmod(o_orderkey, {_M31}) * {_KNUTH}, {_M31}))")
_SPARK_M1 = f"({_SPARK_H1} ^ shiftright({_SPARK_H1}, 13))"
_SPARK_H2 = f"(pmod(({_SPARK_M1} + r) * {_KNUTH}, {_M31}))"
_SPARK_M2 = f"({_SPARK_H2} ^ shiftright({_SPARK_H2}, 7))"
_SPARK_H3 = f"(pmod({_SPARK_M2} * {_KNUTH}, {_M31}))"
_SPARK_U = f"({_SPARK_H3} ^ shiftright({_SPARK_H3}, 13)) % 1000000"
_DUCK_H1 = f"(((o_orderkey % {_M31}) * {_KNUTH}) % {_M31})"
_DUCK_M1 = f"xor({_DUCK_H1}, {_DUCK_H1} >> 13)"
_DUCK_H2 = f"((({_DUCK_M1} + r) * {_KNUTH}) % {_M31})"
_DUCK_M2 = f"xor({_DUCK_H2}, {_DUCK_H2} >> 7)"
_DUCK_H3 = f"(({_DUCK_M2} * {_KNUTH}) % {_M31})"
_DUCK_U = f"xor({_DUCK_H3}, {_DUCK_H3} >> 13) % 1000000"


def bootstrap_frame(fact: DataFrame) -> DataFrame:
    """Core of orders_bootstrap_ci over any (o_orderkey, n_name, cents)
    frame — exposed for the replica scale-up test."""
    base = fact.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("sum(cents) div count(1)").alias("mean_cents"))
    reps = (fact
            .select("o_orderkey", "n_name", "cents",
                    F.explode(F.expr(f"sequence(0, {BOOT_R - 1})")).alias("r"))
            .withColumn("u", F.expr(_SPARK_U))
            .withColumn("w", F.expr(_POIS_CASE))
            .groupBy("n_name", "r")
            .agg(F.sum("w").alias("sw"),
                 F.sum(F.col("w") * F.col("cents")).alias("swc"))
            .filter(F.col("sw") > 0)
            .withColumn("mean_r", F.expr("swc div sw")))
    spread = reps.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.sum("mean_r").alias("sm"),
        F.sum(F.col("mean_r") * F.col("mean_r")).alias("sm2"))
    return (base.join(spread, "n_name")
            .select("n_name", "n_orders", "mean_cents", "n_replicates",
                    F.round(F.sqrt((F.col("n_replicates") * F.col("sm2")
                                    - F.col("sm") * F.col("sm"))
                                   / (F.col("n_replicates")
                                      * (F.col("n_replicates") - 1))), 2)
                    .alias("boot_se_cents"))
            .withColumn("ci_lo_cents",
                        F.round(F.col("mean_cents")
                                - 1.96 * F.col("boot_se_cents"), 2))
            .withColumn("ci_hi_cents",
                        F.round(F.col("mean_cents")
                                + 1.96 * F.col("boot_se_cents"), 2))
            .orderBy("n_name"))


def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap standard error and 95% CI for the mean order
    value per nation — uncertainty quantification in ONE distributed
    pass, the way resampling actually runs at lake scale (Poisson
    bootstrap: each row independently enters replicate r with weight
    ~ Poisson(1), so no replicate ever materializes a resampled
    table). The weight is a xorshift-mixed Knuth-multiplicative
    integer uniform (see _SPARK_U) pushed through the
    compile-time inverse-CDF literals above — fully deterministic and
    engine-identical. The fact explodes x64 replicates but aggregates
    map-side into (nation, r) partials, so the shuffle is nations x 64
    rows no matter the corpus size. Replicate means are integer cents
    (div-truncated — the quantization contract); their spread
    aggregates via exact integer sum/sumsq (means ~1e7 cents keep
    64 * mean^2 ~ 1e16 inside int64), and the only float work is the
    final sqrt/1.96 multiply on exact integers."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    return bootstrap_frame(
        orders
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "n_name", "cents"))


register("orders_bootstrap_ci", orders_bootstrap_ci, f"""
WITH fact AS (
    SELECT o_orderkey, n_name,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
), base AS (
    SELECT n_name, COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mean_cents
    FROM fact GROUP BY n_name
), reps AS (
    SELECT n_name, r, CAST(SUM(w * cents) AS BIGINT)
                          // CAST(SUM(w) AS BIGINT) AS mean_r
    FROM (
        SELECT n_name, cents, r,
               {_POIS_CASE.replace('WHEN u <', 'WHEN uu <')} AS w
        FROM (
            SELECT f.n_name, f.cents, rr.r, {_DUCK_U} AS uu
            FROM fact f
            CROSS JOIN (SELECT UNNEST(range(0, {BOOT_R})) AS r) rr
        ) withu
    ) t
    GROUP BY n_name, r HAVING SUM(w) > 0
), spread AS (
    SELECT n_name, COUNT(*) AS n_replicates,
           CAST(SUM(mean_r) AS BIGINT) AS sm,
           CAST(SUM(mean_r * mean_r) AS BIGINT) AS sm2
    FROM reps GROUP BY n_name
)
SELECT b.n_name, b.n_orders, b.mean_cents, s.n_replicates,
       ROUND(SQRT(CAST(s.n_replicates * s.sm2 - s.sm * s.sm AS DOUBLE)
                  / (s.n_replicates * (s.n_replicates - 1))), 2)
           AS boot_se_cents,
       ROUND(b.mean_cents
             - 1.96 * ROUND(SQRT(CAST(s.n_replicates * s.sm2
                                      - s.sm * s.sm AS DOUBLE)
                                 / (s.n_replicates * (s.n_replicates - 1))),
                            2), 2) AS ci_lo_cents,
       ROUND(b.mean_cents
             + 1.96 * ROUND(SQRT(CAST(s.n_replicates * s.sm2
                                      - s.sm * s.sm AS DOUBLE)
                                 / (s.n_replicates * (s.n_replicates - 1))),
                            2), 2) AS ci_hi_cents
FROM base b JOIN spread s ON b.n_name = s.n_name ORDER BY b.n_name
""", "deterministic Poisson-bootstrap SE/CI for mean order value")


# ------------------------- Spearman rank correlation (quantized ranks)
N_SP_BINS = 256


def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between extended price and quantity
    per return flag — the robust-rank complement of o26's Pearson: ties
    are handled with MIDRANKS and the monotone (not linear) association
    is measured. Ranks NEVER total-order the fact table: price
    quantizes into the shared 256-bin broadcast-range domain (clip_bin;
    the <=bin-width rank quantization is the operator contract,
    mirrored in the oracle) and quantity is already discrete, so
    midranks come from the two bounded MARGINAL histograms (2*cum_below
    + cnt + 1, exact integer doubled midranks), normalized to integer
    ppm of 2n. Sufficient sums accumulate over the JOINT histogram
    (flag x 256 x ~50 cells) as DECIMAL(38,0) on Spark / HUGEINT on
    DuckDB — exact at any corpus size (terms <= cnt * 1e12, sums <=
    n * 1e12 < 1e38 up to 1e26 rows) and order-free, so the one float
    evaluation at the end sees identical inputs on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("qv"))
    stats = li.agg(F.min("cents").alias("mn_c"), F.max("cents").alias("mx_c"))
    binned = li.crossJoin(F.broadcast(stats)).select(
        "flag", "qv",
        clip_bin(F.col("cents"), F.col("mn_c"), F.col("mx_c"),
                 N_SP_BINS).alias("pbin"))
    joint = binned.groupBy("flag", "pbin", "qv").agg(
        F.count(F.lit(1)).alias("cnt"))
    tot = joint.groupBy("flag").agg(F.sum("cnt").alias("n"))
    wp = Window.partitionBy("flag").orderBy("pbin")
    marg_p = (joint.groupBy("flag", "pbin").agg(F.sum("cnt").alias("cp"))
              .withColumn("mx2", 2 * (F.sum("cp").over(wp) - F.col("cp"))
                          + F.col("cp") + 1)
              .join(F.broadcast(tot), "flag")
              .select("flag", "pbin",
                      F.expr("mx2 * 500000 div n").alias("mxp")))
    wq = Window.partitionBy("flag").orderBy("qv")
    marg_q = (joint.groupBy("flag", "qv").agg(F.sum("cnt").alias("cq"))
              .withColumn("my2", 2 * (F.sum("cq").over(wq) - F.col("cq"))
                          + F.col("cq") + 1)
              .join(F.broadcast(tot), "flag")
              .select("flag", "qv",
                      F.expr("my2 * 500000 div n").alias("myq")))
    cells = (joint.join(F.broadcast(marg_p), ["flag", "pbin"])
             .join(F.broadcast(marg_q), ["flag", "qv"]))
    sums = (cells.groupBy("flag")
            .agg(F.sum("cnt").alias("n"),
                 F.expr("sum(cast(cnt as decimal(20,0)) * mxp)").alias("sx"),
                 F.expr("sum(cast(cnt as decimal(20,0)) * myq)").alias("sy"),
                 F.expr("sum(cast(cnt as decimal(20,0)) * mxp * mxp)")
                 .alias("sxx"),
                 F.expr("sum(cast(cnt as decimal(20,0)) * myq * myq)")
                 .alias("syy"),
                 F.expr("sum(cast(cnt as decimal(20,0)) * mxp * myq)")
                 .alias("sxy")))
    rho = F.expr(
        "(cast(sxy as double) / n - (cast(sx as double) / n)"
        " * (cast(sy as double) / n))"
        " / sqrt((cast(sxx as double) / n - (cast(sx as double) / n)"
        "         * (cast(sx as double) / n))"
        "        * (cast(syy as double) / n - (cast(sy as double) / n)"
        "           * (cast(sy as double) / n)))")
    return (sums.select(F.col("flag").alias("l_returnflag"),
                        F.col("n").alias("n_items"),
                        (F.round(rho, 6) + 0.0).alias("spearman_rho"))
            .orderBy("l_returnflag"))


register("lineitem_spearman_corr", lineitem_spearman_corr, f"""
WITH li AS (
    SELECT l_returnflag AS flag,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qv
    FROM lineitem
), stats AS (SELECT MIN(cents) AS mn_c, MAX(cents) AS mx_c FROM li),
binned AS (
    SELECT flag, qv,
           CASE WHEN mx_c = mn_c THEN 0 ELSE
                LEAST({N_SP_BINS - 1},
                      CAST(FLOOR((cents - mn_c) * {N_SP_BINS}
                                 / (mx_c - mn_c)) AS BIGINT)) END AS pbin
    FROM li CROSS JOIN stats
), joint AS (
    SELECT flag, pbin, qv, COUNT(*) AS cnt FROM binned GROUP BY 1, 2, 3
), tot AS (
    SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n FROM joint GROUP BY flag
), marg_p AS (
    SELECT m.flag, m.pbin,
           (2 * (CAST(SUM(m.cp) OVER (PARTITION BY m.flag ORDER BY m.pbin)
                      AS BIGINT) - m.cp) + m.cp + 1) * 500000 // t.n AS mxp
    FROM (SELECT flag, pbin, CAST(SUM(cnt) AS BIGINT) AS cp
          FROM joint GROUP BY flag, pbin) m
    JOIN tot t ON m.flag = t.flag
), marg_q AS (
    SELECT m.flag, m.qv,
           (2 * (CAST(SUM(m.cq) OVER (PARTITION BY m.flag ORDER BY m.qv)
                      AS BIGINT) - m.cq) + m.cq + 1) * 500000 // t.n AS myq
    FROM (SELECT flag, qv, CAST(SUM(cnt) AS BIGINT) AS cq
          FROM joint GROUP BY flag, qv) m
    JOIN tot t ON m.flag = t.flag
), sums AS (
    SELECT j.flag, CAST(SUM(j.cnt) AS BIGINT) AS n,
           SUM(CAST(j.cnt AS HUGEINT) * p.mxp) AS sx,
           SUM(CAST(j.cnt AS HUGEINT) * q.myq) AS sy,
           SUM(CAST(j.cnt AS HUGEINT) * p.mxp * p.mxp) AS sxx,
           SUM(CAST(j.cnt AS HUGEINT) * q.myq * q.myq) AS syy,
           SUM(CAST(j.cnt AS HUGEINT) * p.mxp * q.myq) AS sxy
    FROM joint j
    JOIN marg_p p ON j.flag = p.flag AND j.pbin = p.pbin
    JOIN marg_q q ON j.flag = q.flag AND j.qv = q.qv
    GROUP BY j.flag
)
SELECT flag AS l_returnflag, n AS n_items,
       ROUND((CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
              * (CAST(sy AS DOUBLE) / n))
             / sqrt((CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n))
                    * (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n))), 6) + 0.0
           AS spearman_rho
FROM sums ORDER BY l_returnflag
""", "tie-corrected Spearman rank correlation over quantized midranks")


# --------------------------------------- k-anonymity / l-diversity audit
KANON_K = 5


def privacy_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a dataset leaves the pipeline: treat
    (nation, order year, order priority) as the quasi-identifier and
    o_orderstatus as the sensitive attribute, then measure k-anonymity
    (the smallest equivalence-class size — any release is only as
    anonymous as its loneliest class), l-diversity (the smallest number
    of distinct sensitive values within a class) and how much of the
    data sits in classes below k=5. One fact scan into the
    QI-class aggregate (nations x years x priorities — model-size),
    then a 1-row summary; every metric is an exact integer. At lake
    scale the class aggregate is exactly the k-anonymity working set —
    it grows with the QI domain, never the row count."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    classes = (orders
               .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
               .groupBy("c_nationkey",
                        F.year("o_orderdate").alias("yr"),
                        F.col("o_orderpriority").alias("prio"))
               .agg(F.count(F.lit(1)).alias("sz"),
                    F.countDistinct("o_orderstatus").alias("l_div")))
    return classes.agg(
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("k_anonymity"),
        F.min("l_div").alias("l_diversity"),
        F.sum(F.when(F.col("sz") < KANON_K, 1).otherwise(0))
        .alias("classes_below_k"),
        F.sum(F.when(F.col("sz") < KANON_K, F.col("sz")).otherwise(0))
        .alias("rows_below_k"),
    ).select(
        "n_rows", "n_classes", "k_anonymity", "l_diversity",
        "classes_below_k", "rows_below_k",
        F.expr("rows_below_k * 1000000 div n_rows").alias("below_k_ppm"),
    )


register("privacy_kanon_audit", privacy_kanon_audit, f"""
WITH classes AS (
    SELECT c_nationkey, year(o_orderdate) AS yr, o_orderpriority AS prio,
           COUNT(*) AS sz,
           COUNT(DISTINCT o_orderstatus) AS l_div
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3
)
SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
       COUNT(*) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       CAST(MIN(l_div) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN sz < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS classes_below_k,
       CAST(SUM(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
           AS rows_below_k,
       CAST(SUM(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
           * 1000000 // CAST(SUM(sz) AS BIGINT) AS below_k_ppm
FROM classes
""", "k-anonymity / l-diversity release audit over the QI class table")


# ------------------------------------------- Gopher-style rule flags
# Rule constants tuned so every rule has both outcomes on the fixture
# at all scale factors (all integer cross-multiplications — no float
# thresholds anywhere):
GQ_MIN_WORDS, GQ_MAX_WORDS = 15, 90
GQ_MWL_LO_X10, GQ_MWL_HI_X10 = 43, 47   # mean word length in [4.3, 4.7]
GQ_STOP_DEN = 25                        # stopword fraction >= 1/25 = 4%
GQ_MAX_WORDLEN = 7                      # longest token <= 7 chars
_GQ_STOPS = ("the", "a", "of", "to", "and")


def doc_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document quality census (the repetition/charclass
    rules live in text_repetition_ratio / text_charclass_profile; this
    operator covers the length-and-lexicon family): per doc, integer
    flags for word-count bounds, mean-word-length band, minimum
    stopword fraction, and maximum token length — every threshold an
    exact integer cross-multiplication, so no float ever decides a
    flag. Output: per-source rule pass counts and the all-rules pass
    rate in ppm. One token explode, doc-keyed reduce, source-keyed
    final aggregate — the standard quality-gate shape."""
    stop_list = ", ".join(f"'{w}'" for w in _GQ_STOPS)
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.explode(F.expr("split(lower(text), ' ')")).alias("t")))
    per_doc = (toks.groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).alias("nw"),
                    F.sum(F.length("t")).alias("chars"),
                    F.max(F.length("t")).alias("maxw"),
                    F.sum(F.expr(f"cast(t in ({stop_list}) as int)"))
                    .alias("sw")))
    flagged = per_doc.select(
        "source",
        F.expr(f"cast(nw between {GQ_MIN_WORDS} and {GQ_MAX_WORDS} as int)")
        .alias("f_wc"),
        F.expr(f"cast(chars * 10 between {GQ_MWL_LO_X10} * nw"
               f" and {GQ_MWL_HI_X10} * nw as int)").alias("f_mwl"),
        F.expr(f"cast(sw * {GQ_STOP_DEN} >= nw as int)").alias("f_stop"),
        F.expr(f"cast(maxw <= {GQ_MAX_WORDLEN} as int)").alias("f_maxw"))
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("f_wc").alias("pass_wordcount"),
                 F.sum("f_mwl").alias("pass_meanwordlen"),
                 F.sum("f_stop").alias("pass_stopword"),
                 F.sum("f_maxw").alias("pass_maxwordlen"),
                 F.sum(F.expr("f_wc * f_mwl * f_stop * f_maxw"))
                 .alias("pass_all"))
            .withColumn("pass_all_ppm",
                        F.expr("pass_all * 1000000 div n_docs"))
            .orderBy("source"))


register("doc_gopher_quality_flags", doc_gopher_quality_flags, f"""
WITH toks AS (
    SELECT doc_id, source, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), per_doc AS (
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS nw,
           CAST(SUM(length(t)) AS BIGINT) AS chars,
           CAST(MAX(length(t)) AS BIGINT) AS maxw,
           CAST(SUM(CASE WHEN t IN ({", ".join(f"'{w}'" for w in _GQ_STOPS)})
                         THEN 1 ELSE 0 END) AS BIGINT) AS sw
    FROM toks GROUP BY 1, 2
), flagged AS (
    SELECT source,
           CASE WHEN nw BETWEEN {GQ_MIN_WORDS} AND {GQ_MAX_WORDS}
                THEN 1 ELSE 0 END AS f_wc,
           CASE WHEN chars * 10 BETWEEN {GQ_MWL_LO_X10} * nw
                     AND {GQ_MWL_HI_X10} * nw THEN 1 ELSE 0 END AS f_mwl,
           CASE WHEN sw * {GQ_STOP_DEN} >= nw THEN 1 ELSE 0 END AS f_stop,
           CASE WHEN maxw <= {GQ_MAX_WORDLEN} THEN 1 ELSE 0 END AS f_maxw
    FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_wc) AS BIGINT) AS pass_wordcount,
       CAST(SUM(f_mwl) AS BIGINT) AS pass_meanwordlen,
       CAST(SUM(f_stop) AS BIGINT) AS pass_stopword,
       CAST(SUM(f_maxw) AS BIGINT) AS pass_maxwordlen,
       CAST(SUM(f_wc * f_mwl * f_stop * f_maxw) AS BIGINT) AS pass_all,
       CAST(SUM(f_wc * f_mwl * f_stop * f_maxw) * 1000000 // COUNT(*)
            AS BIGINT) AS pass_all_ppm
FROM flagged GROUP BY source ORDER BY source
""", "Gopher-style length/lexicon quality rules, per-source pass rates")


# ------------------------------------- DP-style noisy count release
DP_MAG_SALT = "dpmag_"
DP_SIGN_SALT = "dpsign_"


def privacy_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-style noisy count release + utility audit,
    completing the privacy family (k-anon / l-diversity / t-closeness
    audit the DATA; this audits the RELEASE mechanism): per event
    type, the released count is the true count plus two-sided
    geometric noise — magnitude = length of the run of leading high
    hex digits ([8-f]) of a salted md5 (P(k >= j) = 2^-j exactly, the
    geometric mechanism at eps = ln 2), sign from the first digit of
    a second salt. The noise is a pure string/integer computation on
    a deterministic hash — no RNG state, no floats — so the release
    is bit-identical cross-engine while following the real mechanism
    shape (in production the hash input would be a secret per-release
    nonce). Counts are one key-sized aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    mag = (f"length(regexp_extract(md5(concat('{DP_MAG_SALT}',"
           " event_type)), '^([89a-f]*)', 1))")
    sign = (f"case when ascii(substring(md5(concat('{DP_SIGN_SALT}',"
            " event_type)), 1, 1)) < 56 then 1 else -1 end")
    return (per
            .withColumn("noise", F.expr(f"({sign}) * ({mag})"))
            .withColumn("n_released",
                        F.expr("greatest(0, n_true + noise)"))
            .select("event_type", "n_true", "noise", "n_released",
                    F.expr("abs(n_released - n_true)").alias("abs_err"),
                    F.expr("abs(n_released - n_true) * 1000000"
                           " div greatest(n_true, 1)").alias("err_ppm"))
            .orderBy("event_type"))


register("privacy_dp_count_release", privacy_dp_count_release, f"""
WITH per AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
    FROM events GROUP BY 1
), noised AS (
    SELECT event_type, n_true,
           (CASE WHEN ascii(substr(md5('{DP_SIGN_SALT}' || event_type),
                                   1, 1)) < 56
                 THEN 1 ELSE -1 END)
           * CAST(length(regexp_extract(
                 md5('{DP_MAG_SALT}' || event_type), '^([89a-f]*)', 1))
             AS BIGINT) AS noise
    FROM per
)
SELECT event_type, n_true, noise,
       CAST(GREATEST(0, n_true + noise) AS BIGINT) AS n_released,
       CAST(ABS(GREATEST(0, n_true + noise) - n_true) AS BIGINT)
           AS abs_err,
       CAST(ABS(GREATEST(0, n_true + noise) - n_true) * 1000000
            // GREATEST(n_true, 1) AS BIGINT) AS err_ppm
FROM noised ORDER BY event_type
""", "geometric-mechanism noisy count release with utility audit")


# --------------------------------------- char-bigram KL by source
from .monitor_eval import _ha_sql as _kl_ha  # noqa: E402


def source_bigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram KL divergence of each source against the
    pooled corpus: KL(p_s || q) = sum_b p ln(p/q) — the stylometric
    outlier detector that flags a source whose character statistics
    (language, encoding, boilerplate, generator) diverge from the
    rest before any model-based scorer runs. Every source bigram is
    present in the corpus by construction, so q > 0 and no smoothing
    enters; each cell's term is half-away-quantized to integer
    nano-nats BEFORE the per-source sum (order-free exact). The
    explode collapses map-side into the (source x bigram) census —
    shuffle keys are the bounded bigram alphabet."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    bigrams = (docs
               .select("source",
                       F.explode(F.expr("sequence(1, length(text) - 1)"))
                       .alias("i"), "text")
               .select("source",
                       F.expr("substring(text, i, 2)").alias("bg")))
    census = bigrams.groupBy("source", "bg").agg(
        F.count(F.lit(1)).alias("c"))
    stot = census.groupBy("source").agg(F.sum("c").alias("ns"))
    ctot = census.groupBy("bg").agg(F.sum("c").alias("cb"))
    n_all = census.agg(F.sum("c").alias("nn"))
    term = _kl_ha("1e9 * (cast(c as double) / ns)"
                  " * ln((cast(c as double) / ns)"
                  " / (cast(cb as double) / nn))")
    return (census.join(stot, "source").join(ctot, "bg")
            .crossJoin(F.broadcast(n_all))
            .select("source", "ns",
                    F.expr(term).alias("t_nano"))
            .groupBy("source")
            .agg(F.max("ns").alias("n_bigrams"),
                 F.expr("sum(t_nano) div 1000").alias("kl_micro"))
            .orderBy("source"))


_KL_TERM = _kl_ha("1e9 * (CAST(c AS DOUBLE) / ns)"
                  " * LN((CAST(c AS DOUBLE) / ns)"
                  " / (CAST(cb AS DOUBLE) / nn))")

register("source_bigram_kl", source_bigram_kl, f"""
WITH census AS (
    SELECT source, substr(text, i, 2) AS bg, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents, UNNEST(range(1, length(text))) AS t(i)
    GROUP BY 1, 2
), stot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM census GROUP BY 1
), ctot AS (
    SELECT bg, CAST(SUM(c) AS BIGINT) AS cb FROM census GROUP BY 1
), n_all AS (
    SELECT CAST(SUM(c) AS BIGINT) AS nn FROM census
), terms AS (
    SELECT census.source, stot.ns, {_KL_TERM} AS t_nano
    FROM census
    JOIN stot ON census.source = stot.source
    JOIN ctot ON census.bg = ctot.bg
    CROSS JOIN n_all
)
SELECT source, MAX(ns) AS n_bigrams,
       CAST(SUM(t_nano) // 1000 AS BIGINT) AS kl_micro
FROM terms GROUP BY source ORDER BY source
""", "char-bigram KL divergence of each source vs the pooled corpus")


# --------------------------------------- doc-length lognormal fit
def doc_length_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of the document token-length distribution — the
    standard shape assumption behind length-based curation filters
    (doc_perplexity_filter, doc_gopher_quality_flags): mu/sigma come
    from exact integer sums of the micro-quantized per-doc ln(length)
    (each doc's ln is half-away-quantized BEFORE the corpus sum, so
    the moments are order-free), and the moment check compares the
    ACTUAL mean length against the fitted exp(mu + sigma²/2) in ppm —
    a one-row goodness gate: far from 1e6 means the lognormal
    assumption (and every filter built on it) is off. y_micro² sums
    hold int64 to ~4e5 docs; past that the q accumulator rides
    DECIMAL(38,0) as usual."""
    lens = (load_table(spark, sf_dir, "documents")
            .select(F.expr("size(split(lower(text), ' '))").alias("n_tok"))
            .filter(F.col("n_tok") >= 1)
            .select("n_tok", F.expr(_kl_ha(
                "1e6 * ln(cast(n_tok as double))")).alias("y")))
    agg = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("st"),
        F.sum("y").alias("s"), F.sum(F.expr("y * y")).alias("q"))
    mu = "(cast(s as double) / n / 1e6)"
    var = ("((cast(n as double) * q - cast(s as double) * s)"
           " / (cast(n as double) * (n - 1)) / 1e12)")
    pred = f"exp({mu} + {var} / 2)"
    act = "(cast(st as double) / n)"
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.expr(_kl_ha(f"({mu}) * 1e6")).alias("mu_micro"),
        F.expr(_kl_ha(f"sqrt({var}) * 1e6")).alias("sigma_micro"),
        F.expr("st * 1000 div n").alias("mean_actual_milli"),
        F.expr(_kl_ha(f"({pred}) * 1e3")).alias("mean_pred_milli"),
        F.expr(_kl_ha(f"({act}) / ({pred}) * 1e6")).alias("ratio_ppm"))


_LN_MU = "(CAST(s AS DOUBLE) / n / 1e6)"
_LN_VAR = ("((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)"
           " / (CAST(n AS DOUBLE) * (n - 1)) / 1e12)")
_LN_PRED = f"EXP({_LN_MU} + {_LN_VAR} / 2)"
_LN_ACT = "(CAST(st AS DOUBLE) / n)"

register("doc_length_lognormal_fit", doc_length_lognormal_fit, f"""
WITH lens AS (
    SELECT n_tok, {_kl_ha("1e6 * LN(CAST(n_tok AS DOUBLE))")} AS y
    FROM (SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT)
              AS n_tok
          FROM documents)
    WHERE n_tok >= 1
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_tok) AS BIGINT) AS st,
           CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y * y) AS BIGINT) AS q
    FROM lens
)
SELECT n AS n_docs,
       {_kl_ha(f"({_LN_MU}) * 1e6")} AS mu_micro,
       {_kl_ha(f"SQRT({_LN_VAR}) * 1e6")} AS sigma_micro,
       st * 1000 // n AS mean_actual_milli,
       {_kl_ha(f"({_LN_PRED}) * 1e3")} AS mean_pred_milli,
       {_kl_ha(f"({_LN_ACT}) / ({_LN_PRED}) * 1e6")} AS ratio_ppm
FROM agg
""", "lognormal fit of doc token lengths + moment-ratio goodness gate")


# --------------------------------------- conditional char entropy rate
def source_char_entropy_rate(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Order-1 character entropy rate per source: H(c2 | c1) =
    H(bigram) - H(unigram) in bits — the context-aware compressibility
    bound the zero-order advisor (compression_entropy_advisor)
    overstates (an order-1 coder reaches the conditional rate, not
    H1). Both entropies come from the same two censuses, each cell's
    -p*log2(p) term half-away-quantized to nano-bits before the
    per-source sum (order-free). Redundancy ppm = 1 - rate/H1 says
    how much an order-1 model buys over order-0. Census domains are
    the alphabet and its square — the shuffle never carries the
    corpus."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def census(width):
        return (docs
                .select("source",
                        F.explode(F.expr(
                            f"sequence(1, length(text) - {width - 1})"))
                        .alias("i"), "text")
                .select("source",
                        F.expr(f"substring(text, i, {width})").alias("g"))
                .groupBy("source", "g").agg(F.count(F.lit(1)).alias("c")))

    term = _kl_ha("1e9 * (cast(c as double) / n)"
                  " * (ln(cast(n as double) / c) / ln(2.0))")

    def entropy(cen, alias):
        tot = cen.groupBy("source").agg(F.sum("c").alias("n"))
        return (cen.join(tot, "source")
                .select("source", F.expr(term).alias("t"))
                .groupBy("source").agg(F.sum("t").alias(alias)))

    h1 = entropy(census(1), "h1_nano")
    h2 = entropy(census(2), "h2_nano")
    return (h1.join(h2, "source")
            .select("source",
                    F.expr("h1_nano div 1000000").alias("h1_millibits"),
                    F.expr("h2_nano div 1000000").alias("h2_millibits"),
                    F.expr("(h2_nano - h1_nano) div 1000000")
                    .alias("rate_millibits"),
                    F.expr("(h1_nano - (h2_nano - h1_nano)) * 1000000"
                           " div h1_nano").alias("redundancy_ppm"))
            .orderBy("source"))


_CER_TERM = _kl_ha("1e9 * (CAST(c AS DOUBLE) / n)"
                   " * (LN(CAST(n AS DOUBLE) / c) / LN(2.0))")


def _cer_census_sql(width: int, name: str) -> str:
    return f"""{name}_cen AS (
    SELECT source, substr(text, i, {width}) AS g,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM documents,
         UNNEST(range(1, length(text) + 1 - {width - 1})) AS t(i)
    GROUP BY 1, 2
), {name} AS (
    SELECT source, CAST(SUM(t) AS BIGINT) AS {name}_nano
    FROM (SELECT cen.source, {_CER_TERM} AS t
          FROM {name}_cen cen
          JOIN (SELECT source, CAST(SUM(c) AS BIGINT) AS n
                FROM {name}_cen GROUP BY 1) tot
            ON cen.source = tot.source)
    GROUP BY source
)"""


register("source_char_entropy_rate", source_char_entropy_rate, f"""
WITH {_cer_census_sql(1, "h1")},
{_cer_census_sql(2, "h2")}
SELECT h1.source,
       h1_nano // 1000000 AS h1_millibits,
       h2_nano // 1000000 AS h2_millibits,
       (h2_nano - h1_nano) // 1000000 AS rate_millibits,
       (h1_nano - (h2_nano - h1_nano)) * 1000000 // h1_nano
           AS redundancy_ppm
FROM h1 JOIN h2 ON h1.source = h2.source
ORDER BY h1.source
""", "order-1 char entropy rate + redundancy per source (two censuses)")


# --------------------------------------------- pairwise source JSD
JSD_TOPK = 10
_LN2_NANO = 693_147_181  # round(ln(2) * 1e9) — shared constant


def source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions, reported as the JSD_TOPK MOST SIMILAR pairs — the
    redundancy radar that says which sources tell the mixture
    allocator the same thing. The decomposition keeps the vocabulary
    join linear: for tokens PRESENT in both sources the cell term is
    0.5*p*ln(2p/(p+q)) + 0.5*q*ln(2q/(p+q)); the mass each side holds
    in tokens ABSENT from the other contributes exactly
    0.5*ln(2)*(1 - covered) in closed form — no full-outer explosion,
    only the shared-token join (vocabulary-keyed) plus per-pair
    covered-mass sums. Every cell term quantizes to nano-nats before
    the per-pair integer sum; the top-K cut is a distributed
    TakeOrdered over the source-pair frame (sources² rows)."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("source",
                    F.explode(F.split(F.lower("text"), " ")).alias("tok")))
    census = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    tot = census.groupBy("source").agg(F.sum("c").alias("n"))
    cen = census.join(tot, "source")
    a = cen.select(F.col("source").alias("s1"), "tok",
                   F.col("c").alias("c1"), F.col("n").alias("n1"))
    b = cen.select(F.col("source").alias("s2"), "tok",
                   F.col("c").alias("c2"), F.col("n").alias("n2"))
    shared = a.join(b, ["tok"]).filter(F.col("s1") < F.col("s2"))
    term = _kl_ha(
        "1e9 * (0.5 * (cast(c1 as double) / n1)"
        " * ln(2.0 * (cast(c1 as double) / n1)"
        " / (cast(c1 as double) / n1 + cast(c2 as double) / n2))"
        " + 0.5 * (cast(c2 as double) / n2)"
        " * ln(2.0 * (cast(c2 as double) / n2)"
        " / (cast(c1 as double) / n1 + cast(c2 as double) / n2)))")
    pair = (shared
            .select("s1", "s2", "c1", "n1", "c2", "n2",
                    F.expr(term).alias("t_nano"))
            .groupBy("s1", "s2")
            .agg(F.sum("t_nano").alias("shared_nano"),
                 F.sum("c1").alias("cov1"), F.max("n1").alias("n1"),
                 F.sum("c2").alias("cov2"), F.max("n2").alias("n2")))
    absent = (f"({_LN2_NANO} - {_LN2_NANO} * cov1 div n1) div 2"
              f" + ({_LN2_NANO} - {_LN2_NANO} * cov2 div n2) div 2")
    return (pair
            .withColumn("jsd_nano", F.expr(f"shared_nano + {absent}"))
            .select("s1", "s2",
                    F.expr("jsd_nano div 1000").alias("jsd_micro"))
            .orderBy("jsd_micro", "s1", "s2").limit(JSD_TOPK))


_JSD_TERM = _kl_ha(
    "1e9 * (0.5 * (CAST(c1 AS DOUBLE) / n1)"
    " * LN(2.0 * (CAST(c1 AS DOUBLE) / n1)"
    " / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2))"
    " + 0.5 * (CAST(c2 AS DOUBLE) / n2)"
    " * LN(2.0 * (CAST(c2 AS DOUBLE) / n2)"
    " / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)))")

register("source_jsd_matrix", source_jsd_matrix, f"""
WITH census AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT source, UNNEST(string_split(lower(text), ' ')) AS tok
          FROM documents)
    GROUP BY 1, 2
), tot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM census GROUP BY 1
), cen AS (
    SELECT census.source, census.tok, census.c, tot.n
    FROM census JOIN tot ON census.source = tot.source
), pair AS (
    SELECT a.source AS s1, b.source AS s2,
           CAST(SUM({_JSD_TERM}) AS BIGINT) AS shared_nano,
           CAST(SUM(a.c) AS BIGINT) AS cov1, MAX(a.n) AS n1,
           CAST(SUM(b.c) AS BIGINT) AS cov2, MAX(b.n) AS n2
    FROM (SELECT source, tok, c AS c1, n AS n1, c, n FROM cen) a
    JOIN (SELECT source, tok, c AS c2, n AS n2, c, n FROM cen) b
      ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
)
SELECT s1, s2,
       CAST((shared_nano
             + ({_LN2_NANO} - {_LN2_NANO} * cov1 // n1) // 2
             + ({_LN2_NANO} - {_LN2_NANO} * cov2 // n2) // 2)
            // 1000 AS BIGINT) AS jsd_micro
FROM pair
ORDER BY jsd_micro, s1, s2 LIMIT {JSD_TOPK}
""", "top-10 most similar source pairs by unigram Jensen-Shannon")
