"""Warehouse diagnostics and revenue-concentration analytics: dynamic
equi-width histograms, hot-key skew profiling, Pareto concentration,
and year-over-year growth.

The engine-ops family (what ANALYZE TABLE / a skew advisor / a revenue
dashboard run all day), each in its scale-correct decomposition:

- histogram: the value range comes from a ONE-ROW global aggregate
  broadcast back over the scan (never a driver-side collect-then-
  filter loop); binning is a codegen'd expression, counts are exact
  integers.
- skew profile: per-key counts + the global totals attach via a 1-row
  broadcast — the diagnosis that decides when q_salted_agg's salting
  is warranted.
- Pareto: revenue quantized to integer cents (floor(x*100): identical
  double arithmetic on both engines) so distributed sums have ONE
  exact value; deciles come from a total-ordered ntile, never a
  driver-side sort.
- YoY: two-key agg + LAG over the model-size (nation, year) frame.

All outputs are integer or explicitly rounded, so driver hashes are
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_BINS = 16


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 16-bin histogram of o_totalprice with a DYNAMIC range:
    stats (min, max) are a one-row aggregate broadcast-joined back over
    the scan, so the whole plan is two passes over the column and zero
    driver round-trips. Bin membership is the same IEEE expression on
    both engines -> exact integer counts."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    stats = orders.agg(F.min("o_totalprice").alias("mn"),
                       F.max("o_totalprice").alias("mx"))
    binned = orders.crossJoin(F.broadcast(stats)).select(
        F.least(F.lit(N_BINS - 1),
                F.floor((F.col("o_totalprice") - F.col("mn")) * N_BINS
                        / (F.col("mx") - F.col("mn")))).alias("bin"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").alias("revenue_cents"))
            .orderBy("bin"))


register("price_histogram", price_histogram, f"""
WITH stats AS (
    SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT LEAST({N_BINS - 1},
             CAST(FLOOR((o_totalprice - mn) * {N_BINS} / (mx - mn)) AS BIGINT))
           AS bin,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders CROSS JOIN stats
GROUP BY 1 ORDER BY 1
""", "dynamic-range equi-width histogram via broadcast 1-row stats")


TOP_KEYS = 20


def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis over events.user_id: the top 20 keys with
    integer parts-per-million share and the skew factor vs a uniform
    spread (count * n_keys / total). This is the profiling step that
    tells an operator whether a key needs q_salted_agg's salting or
    AQE skew handling; totals attach via a 1-row broadcast. Top-20
    selection is orderBy+limit — Spark compiles it to a distributed
    TakeOrdered (per-partition top-k, then a 20-row merge), never a
    single-partition global window over the key aggregate."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(F.sum("n").alias("total"),
                      F.count(F.lit(1)).alias("n_keys"))
    return (per_key
            .orderBy(F.col("n").desc(), "user_id").limit(TOP_KEYS)
            .crossJoin(F.broadcast(tot))
            .select("user_id", "n",
                    F.expr("n * 1000000 div total").alias("share_ppm"),
                    (F.round(F.col("n") * F.col("n_keys") / F.col("total"), 4)
                     + 0.0).alias("skew_factor"))
            .orderBy(F.col("n").desc(), "user_id"))


register("skew_key_profile", skew_key_profile, f"""
WITH per_key AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), tot AS (
    SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM per_key
), ranked AS (
    SELECT user_id, n, total, n_keys,
           ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
    FROM per_key CROSS JOIN tot
)
SELECT user_id, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
       ROUND(CAST(n * n_keys AS DOUBLE) / total, 4) + 0.0 AS skew_factor
FROM ranked WHERE rk <= {TOP_KEYS} ORDER BY n DESC, user_id
""", "hot-key share and skew-factor diagnosis (salting decision input)")


N_DECILES = 10


N_PARETO_BINS = 4096


def customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration ("do the top 10% of customers carry 40% of
    revenue?"): per-customer cents-exact revenue, bucketed into deciles
    WITHOUT any total order over the customer aggregate (VERDICT r7 ask
    #4; the previous ntile was a one-task global sort). Mechanism: a
    broadcast (min, max, n, total) aggregate keys an all-integer
    equi-width histogram of revenue ({N_PARETO_BINS} bins, bin 0 =
    richest); the cumulative bin counts — a window over the bounded
    histogram, never the customers — assign each BIN its decile as
    1 + (customers_in_richer_bins * 10) div n. Equal-count up to bin
    granularity (the documented quantization: a bin never splits), and
    every bucketing step is exact integer arithmetic so both engines
    agree bit-for-bit — no interpolated float cutpoints to flip a
    boundary customer. Decile 1 = top revenue."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice") * 100)
        .cast("long").alias("cents"))
    per_cust = orders.groupBy("o_custkey").agg(F.sum("cents").alias("rev"))
    rng = per_cust.agg(F.min("rev").alias("mn"), F.max("rev").alias("mx"),
                       F.count(F.lit(1)).alias("n"),
                       F.sum("rev").alias("total"))
    binned = (per_cust.crossJoin(F.broadcast(rng))
              .withColumn("bin", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(N_PARETO_BINS - 1),
                          F.expr(f"((mx - rev) * {N_PARETO_BINS})"
                                 f" div (mx - mn + 1)")))))
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    wb = (Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, -1))
    dec = (hist.withColumn("cprev", F.coalesce(F.sum("cnt").over(wb),
                                               F.lit(0)))
           .crossJoin(F.broadcast(rng.select("n")))
           .select("bin", (F.lit(1) + F.expr("(cprev * 10) div n"))
                   .cast("int").alias("decile")))
    return (binned.join(F.broadcast(dec), "bin")
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("rev").alias("revenue_cents"),
                 (F.round((F.sum("rev") / F.first("total")) * 100, 6)
                  + 0.0).alias("revenue_share_pct"))
            .orderBy("decile"))


register("customer_pareto", customer_pareto, f"""
WITH per_cust AS (
    SELECT o_custkey,
           SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS rev
    FROM orders GROUP BY o_custkey
), rng AS (
    SELECT MIN(rev) AS mn, MAX(rev) AS mx, COUNT(*) AS n,
           SUM(rev) AS total
    FROM per_cust
), binned AS (
    SELECT o_custkey, rev, n, total,
           CASE WHEN mx = mn THEN 0
                ELSE LEAST({N_PARETO_BINS - 1},
                           ((mx - rev) * {N_PARETO_BINS}) // (mx - mn + 1))
           END AS bin
    FROM per_cust CROSS JOIN rng
), hist AS (
    SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin
), dec AS (
    SELECT bin,
           CAST(1 + (COALESCE(SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10)
               // r.n AS INT) AS decile
    FROM hist CROSS JOIN (SELECT n FROM rng) r
)
SELECT d.decile, COUNT(*) AS n_customers,
       CAST(SUM(b.rev) AS BIGINT) AS revenue_cents,
       ROUND(CAST(SUM(b.rev) AS DOUBLE) / ANY_VALUE(b.total) * 100, 6) + 0.0
           AS revenue_share_pct
FROM binned b JOIN dec d USING (bin)
GROUP BY d.decile ORDER BY d.decile
""", "Pareto revenue deciles via integer histogram cutpoints (no total order)")


def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: orders joined through
    the broadcast customer->nation dims, cents-exact yearly sums, LAG
    growth over the model-size (nation, year) frame. The fact scan
    shuffles once on the grouping key; the window never touches it."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    yearly = (orders
              .join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey)
              .groupBy("n_name", "yr")
              .agg(F.sum("cents").alias("revenue_cents")))
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue_cents").over(w)
    return (yearly
            .select("n_name", "yr", "revenue_cents",
                    (F.round((F.col("revenue_cents") - prev) / prev * 100, 4)
                     + 0.0).alias("yoy_pct"))
            .orderBy("n_name", "yr"))


register("nation_revenue_yoy", nation_revenue_yoy, """
WITH yearly AS (
    SELECT n_name, EXTRACT(year FROM o_orderdate) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT n_name, CAST(yr AS INT) AS yr, revenue_cents,
       ROUND(CAST(revenue_cents
                  - LAG(revenue_cents) OVER (PARTITION BY n_name ORDER BY yr)
              AS DOUBLE)
             / LAG(revenue_cents) OVER (PARTITION BY n_name ORDER BY yr)
             * 100, 4) + 0.0 AS yoy_pct
FROM yearly ORDER BY n_name, yr
""", "cents-exact yearly revenue with LAG year-over-year growth")


# ------------------------------------------------ market-basket lift
MIN_SUPPORT = 10


def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (market basket) over order/brand baskets:
    support, confidence and lift for every brand pair that co-occurs in
    >= MIN_SUPPORT orders. Scale shape: baskets reduce to ONE sorted
    brand array per order (bounded by the 25-brand dimension), pairs
    explode from the array with an index-offset lambda — no basket
    self-join ever touches the fact table — and the per-brand totals +
    grand total attach via broadcasts. Lift's float division happens
    once per surviving pair (dimension² rows) and is rounded."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select("l_orderkey", "p_brand").distinct())
    baskets = (ob.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("p_brand")).alias("brands")))
    pairs = baskets.select(F.explode(F.expr(
        "flatten(transform(brands, (x, i) ->"
        " transform(slice(brands, i + 2, size(brands)),"
        " y -> struct(x AS brand_a, y AS brand_b))))")).alias("p")) \
        .select("p.brand_a", "p.brand_b")
    sup = pairs.groupBy("brand_a", "brand_b") \
        .agg(F.count(F.lit(1)).alias("support_ab")) \
        .filter(F.col("support_ab") >= MIN_SUPPORT)
    bcnt = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("s"))
    tot = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (sup
            .join(F.broadcast(bcnt.select(F.col("p_brand").alias("brand_a"),
                                          F.col("s").alias("sa"))), "brand_a")
            .join(F.broadcast(bcnt.select(F.col("p_brand").alias("brand_b"),
                                          F.col("s").alias("sb"))), "brand_b")
            .crossJoin(F.broadcast(tot))
            .select("brand_a", "brand_b", "support_ab",
                    F.expr("support_ab * 1000000 div sa")
                    .alias("confidence_ppm"),
                    (F.round(F.col("support_ab") * F.col("n_orders")
                             / (F.col("sa") * F.col("sb")), 6) + 0.0)
                    .alias("lift"))
            .orderBy("brand_a", "brand_b"))


register("basket_brand_lift", basket_brand_lift, f"""
WITH ob AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
), sup AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           COUNT(*) AS support_ab
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}
), bcnt AS (
    SELECT p_brand, COUNT(*) AS s FROM ob GROUP BY p_brand
), tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob)
SELECT brand_a, brand_b, support_ab,
       CAST(support_ab * 1000000 // sa.s AS BIGINT) AS confidence_ppm,
       ROUND(CAST(support_ab AS DOUBLE) * n_orders / (sa.s * sb.s), 6)
           + 0.0 AS lift
FROM sup
JOIN bcnt sa ON sup.brand_a = sa.p_brand
JOIN bcnt sb ON sup.brand_b = sb.p_brand
CROSS JOIN tot
ORDER BY brand_a, brand_b
""", "market-basket brand association: support/confidence/lift")


# --------------------------------------------------- RFM segmentation
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    against the corpus max date — a 1-row broadcast, never a driver
    round-trip), frequency (order count) and monetary (cents-exact
    revenue) scored 1-3 by fixed thresholds, aggregated per segment.
    Every scoring input is an integer, so the segment assignment is
    deterministic on both engines; only the final per-segment average
    is floating point, and it is rounded."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("epoch_day"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    ref = orders.agg(F.max("epoch_day").alias("ref_day"))
    rfm = (orders.crossJoin(F.broadcast(ref))
           .groupBy("o_custkey")
           .agg((F.first("ref_day") - F.max("epoch_day")).alias("recency_d"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum("cents").alias("monetary_cents")))
    seg = rfm.select(
        F.expr("CASE WHEN recency_d < 365 THEN 3"
               " WHEN recency_d < 1095 THEN 2 ELSE 1 END").alias("r_score"),
        F.expr("CASE WHEN frequency >= 15 THEN 3"
               " WHEN frequency >= 8 THEN 2 ELSE 1 END").alias("f_score"),
        F.expr("CASE WHEN monetary_cents >= 200000000 THEN 3"
               " WHEN monetary_cents >= 80000000 THEN 2 ELSE 1 END")
        .alias("m_score"),
        "monetary_cents")
    return (seg.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 (F.round(F.avg("monetary_cents") / 100.0, 4) + 0.0)
                 .alias("avg_monetary"))
            .orderBy("r_score", "f_score", "m_score"))


register("orders_rfm_segments", orders_rfm_segments, """
WITH o AS (
    SELECT o_custkey,
           CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS epoch_day,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), ref AS (SELECT MAX(epoch_day) AS ref_day FROM o),
rfm AS (
    SELECT o_custkey,
           ANY_VALUE(ref_day) - MAX(epoch_day) AS recency_d,
           COUNT(*) AS frequency,
           CAST(SUM(cents) AS BIGINT) AS monetary_cents
    FROM o CROSS JOIN ref GROUP BY o_custkey
), seg AS (
    SELECT CASE WHEN recency_d < 365 THEN 3
                WHEN recency_d < 1095 THEN 2 ELSE 1 END AS r_score,
           CASE WHEN frequency >= 15 THEN 3
                WHEN frequency >= 8 THEN 2 ELSE 1 END AS f_score,
           CASE WHEN monetary_cents >= 200000000 THEN 3
                WHEN monetary_cents >= 80000000 THEN 2 ELSE 1 END AS m_score,
           monetary_cents
    FROM rfm
)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       COUNT(*) AS n_customers,
       ROUND(AVG(monetary_cents) / 100.0, 4) + 0.0 AS avg_monetary
FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""", "integer-thresholded RFM segmentation with broadcast reference date")


# -------------------------------------------- audience diversity
def events_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-diversity diagnosis per event type: Gini-Simpson index
    (1 - Σp²) and the inverse-Simpson "effective user count" — the
    concentration metrics that complement skew_key_profile's top-k
    view. Chosen over Shannon entropy deliberately: Σn_u² is an exact
    INTEGER (no per-term log whose last-ulp could differ between
    engines), so the whole statistic is integer arithmetic until the
    two final rounded divisions."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_user = (ev.groupBy("event_type", "user_id")
                .agg(F.count(F.lit(1)).alias("n_u")))
    return (per_user.groupBy("event_type")
            .agg(F.sum("n_u").alias("n_events"),
                 F.count(F.lit(1)).alias("n_users"),
                 F.sum(F.col("n_u") * F.col("n_u")).alias("sum_sq"))
            .select("event_type", "n_events", "n_users",
                    (F.round(F.lit(1.0) - F.col("sum_sq")
                             / (F.col("n_events") * F.col("n_events")), 6)
                     + 0.0).alias("simpson"),
                    (F.round(F.col("n_events") * F.col("n_events")
                             / F.col("sum_sq"), 4) + 0.0)
                    .alias("effective_users"))
            .orderBy("event_type"))


register("events_diversity_profile", events_diversity_profile, """
WITH per_user AS (
    SELECT event_type, user_id, COUNT(*) AS n_u
    FROM events GROUP BY 1, 2
), agg AS (
    SELECT event_type,
           CAST(SUM(n_u) AS BIGINT) AS n_events,
           COUNT(*) AS n_users,
           CAST(SUM(n_u * n_u) AS BIGINT) AS sum_sq
    FROM per_user GROUP BY event_type
)
SELECT event_type, n_events, n_users,
       ROUND(1.0 - CAST(sum_sq AS DOUBLE) / (n_events * n_events), 6) + 0.0
           AS simpson,
       ROUND(CAST(n_events AS DOUBLE) * n_events / sum_sq, 4) + 0.0
           AS effective_users
FROM agg ORDER BY event_type
""", "integer-exact Simpson diversity / effective audience per event type")


# -------------------------------------------- Herfindahl concentration
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per nation —
    the antitrust-style complement to supplier_gini_by_nation (HHI
    weights the LARGE suppliers, Gini the whole curve; monitoring both
    catches different failure shapes). Cents-exact revenue per
    supplier, integer ppm share per supplier (the floor quantization is
    the operator contract, mirrored in the oracle), hhi_ppm =
    sum(share_ppm^2) div 1e6 — shares <= 1e6 keep every square <=
    1e12 and any realistic supplier count far inside int64. Ranks and
    shares run over the supplier AGGREGATE (dimension-sized), never
    the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("cents"))
    per_supp = li.groupBy("l_suppkey").agg(F.sum("cents").alias("rev"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    shares = (per_supp
              .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
              .join(F.broadcast(nation),
                    supp.s_nationkey == nation.n_nationkey)
              .withColumn("tot", F.sum("rev").over(
                  Window.partitionBy("n_name")))
              .withColumn("share_ppm", F.expr("rev * 1000000 div tot")))
    return (shares.groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.first("tot").alias("total_cents"),
                 F.expr("sum(share_ppm * share_ppm) div 1000000")
                 .alias("hhi_ppm"))
            .orderBy("n_name"))


register("supplier_hhi_by_nation", supplier_hhi_by_nation, """
WITH per_supp AS (
    SELECT l_suppkey,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS rev
    FROM lineitem GROUP BY l_suppkey
), shares AS (
    SELECT n_name, rev,
           CAST(SUM(rev) OVER (PARTITION BY n_name) AS BIGINT) AS tot,
           rev * 1000000 // CAST(SUM(rev) OVER (PARTITION BY n_name)
                                 AS BIGINT) AS share_ppm
    FROM per_supp
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, COUNT(*) AS n_suppliers,
       ANY_VALUE(tot) AS total_cents,
       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares GROUP BY n_name ORDER BY n_name
""", "integer Herfindahl revenue-concentration index per nation")


# ------------------------------------------ Benford first-digit audit
# Expected first-digit shares log10(1 + 1/d) in integer ppm, computed
# ONCE here and embedded as literals in BOTH engines' plans — neither
# engine evaluates a log at runtime, so there is no libm/rounding edge
# to disagree on.
import math as _math

BENFORD_PPM = {d: round(_math.log10(1 + 1 / d) * 1_000_000)
               for d in range(1, 10)}
_BENFORD_CASE = ("CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()) + " END")


def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the classic
    fabricated-data / unit-mixing detector for financial columns. The
    first significant digit comes from the CENTS integer's decimal
    string (substring of a bigint cast — bit-identical on both engines;
    float log10 near power-of-ten boundaries is not), counts aggregate
    per digit (9 groups), and observed shares are integer ppm against
    the broadcast total. Expected shares are compile-time literals
    (BENFORD_PPM above). One fact scan into a 9-row aggregate — the
    same plan at any scale; dev_ppm is the exact-integer per-digit
    excess over the Benford expectation."""
    cents = (load_table(spark, sf_dir, "orders")
             .select(F.floor(F.col("o_totalprice") * 100).cast("long")
                     .alias("cents"))
             .filter(F.col("cents") > 0))
    per_digit = (cents
                 .select(F.substring(F.col("cents").cast("string"), 1, 1)
                         .cast("int").alias("digit"))
                 .groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders")))
    tot = per_digit.agg(F.sum("n_orders").alias("n_total"))
    return (per_digit.crossJoin(F.broadcast(tot))
            .select("digit", "n_orders",
                    F.expr("n_orders * 1000000 div n_total").alias("obs_ppm"),
                    F.expr(_BENFORD_CASE).cast("long").alias("exp_ppm"))
            .withColumn("dev_ppm",
                        F.col("obs_ppm") - F.col("exp_ppm"))
            .orderBy("digit"))


register("benford_digit_profile", benford_digit_profile, f"""
WITH cents AS (
    SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE FLOOR(o_totalprice * 100) > 0
), per_digit AS (
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           COUNT(*) AS n_orders
    FROM cents GROUP BY 1
), tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM per_digit)
SELECT digit, n_orders,
       n_orders * 1000000 // n_total AS obs_ppm,
       CAST({_BENFORD_CASE} AS BIGINT) AS exp_ppm,
       n_orders * 1000000 // n_total
           - CAST({_BENFORD_CASE} AS BIGINT) AS dev_ppm
FROM per_digit CROSS JOIN tot ORDER BY digit
""", "Benford first-digit audit of order amounts, integer ppm shares")


# ------------------------------------ Wilson lower-bound return rates
def part_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return-rate ranking by the Wilson 95% LOWER confidence
    bound — the standard fix for naive-rate rankings where a brand with
    2/2 returns outranks one with 180/1000: the bound shrinks toward
    zero for thin evidence. One fact scan into a brand-sized aggregate
    (k returned, n total as exact integers); the Wilson formula is the
    only float work, evaluated once per brand row with an IDENTICAL
    expression tree on both engines (z^2 embedded as the literal 3.8416
    so neither engine re-derives it), rounded to 6. ret_ppm is the
    exact-integer naive rate for comparison."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
                 .groupBy("p_brand")
                 .agg(F.count(F.lit(1)).alias("n_items"),
                      F.sum("ret").alias("n_returned")))
    ph = F.col("n_returned") / F.col("n_items")
    n = F.col("n_items").cast("double")
    lb = ((ph + F.lit(3.8416) / (2 * n)
           - 1.96 * F.sqrt((ph * (1 - ph) + F.lit(3.8416) / (4 * n)) / n))
          / (1 + F.lit(3.8416) / n))
    return (per_brand
            .select("p_brand", "n_items", "n_returned",
                    F.expr("n_returned * 1000000 div n_items")
                    .alias("ret_ppm"),
                    (F.round(lb, 6) + 0.0).alias("wilson_lb"))
            .orderBy("p_brand"))


register("part_return_rate_wilson", part_return_rate_wilson, """
WITH per_brand AS (
    SELECT p_brand, COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
)
SELECT p_brand, n_items, n_returned,
       n_returned * 1000000 // n_items AS ret_ppm,
       ROUND((CAST(n_returned AS DOUBLE) / n_items
              + 3.8416 / (2 * CAST(n_items AS DOUBLE))
              - 1.96 * SQRT((CAST(n_returned AS DOUBLE) / n_items
                             * (1 - CAST(n_returned AS DOUBLE) / n_items)
                             + 3.8416 / (4 * CAST(n_items AS DOUBLE)))
                            / CAST(n_items AS DOUBLE)))
             / (1 + 3.8416 / CAST(n_items AS DOUBLE)), 6) + 0.0 AS wilson_lb
FROM per_brand ORDER BY p_brand
""", "Wilson 95% lower-bound return-rate ranking per brand")


# ------------------------------------- Theil-Sen robust revenue trend
def nation_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust monthly-revenue trend per nation: the median of
    all pairwise slopes (c2-c1)/(m2-m1) over the nation's monthly
    totals — a single outlier month barely moves it, where OLS swings.
    The pair space is (months choose 2) on the MONTHLY AGGREGATE
    (calendar-bounded: ~84 months -> ~3.5k pairs per nation), never the
    fact table, so the quadratic lives entirely in dimension-sized
    data. Slopes are integer milli-cents-per-month (floor-quantized,
    the contract); the median is the LOWER median (element (n+1) div 2
    of the slope order, ties broken by the earlier month pair via the
    ORDER BY) — fully deterministic on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    monthly = (orders
               .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
               .join(F.broadcast(nation),
                     cust.c_nationkey == nation.n_nationkey)
               .groupBy("n_name",
                        F.expr("year(o_orderdate) * 12 + month(o_orderdate)")
                        .alias("mkey"))
               .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
                    .alias("cents")))
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = (a.join(b, (F.col("a.n_name") == F.col("b.n_name"))
                     & (F.col("a.mkey") < F.col("b.mkey")))
              .select(F.col("a.n_name").alias("n_name"),
                      F.expr("(b.cents - a.cents) * 1000"
                             " div (b.mkey - a.mkey)").alias("slope_milli"),
                      F.col("a.mkey").alias("m1"), F.col("b.mkey").alias("m2")))
    w = Window.partitionBy("n_name").orderBy("slope_milli", "m1", "m2")
    ranked = (slopes
              .withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count(F.lit(1)).over(
                  Window.partitionBy("n_name"))))
    return (ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
            .select("n_name", F.col("cnt").alias("n_pairs"),
                    F.col("slope_milli").alias("theilsen_slope_milli"))
            .orderBy("n_name"))


register("nation_theilsen_trend", nation_theilsen_trend, """
WITH monthly AS (
    SELECT n_name,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS mkey,
           SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
), slopes AS (
    SELECT a.n_name,
           (b.cents - a.cents) * 1000 // (b.mkey - a.mkey) AS slope_milli,
           a.mkey AS m1, b.mkey AS m2
    FROM monthly a JOIN monthly b
      ON a.n_name = b.n_name AND a.mkey < b.mkey
), ranked AS (
    SELECT n_name, slope_milli,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY slope_milli, m1, m2) AS rn,
           COUNT(*) OVER (PARTITION BY n_name) AS cnt
    FROM slopes
)
SELECT n_name, CAST(cnt AS BIGINT) AS n_pairs,
       CAST(slope_milli AS BIGINT) AS theilsen_slope_milli
FROM ranked WHERE rn = (cnt + 1) // 2 ORDER BY n_name
""", "Theil-Sen median-of-slopes robust monthly revenue trend per nation")


# --------------------------------------------------- user activity Gini
from .monitor_eval import _ha_sql as _ug_ha  # noqa: E402

UG_BINS = 4096


def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user event activity WITHOUT a total
    order over users — the customer_pareto cutpoint mechanism driving
    the grouped-data (trapezoid) Gini: per-user counts bucket into a
    broadcast UG_BINS-cell equi-width histogram, and
    G = 1 - sum_b p_b * (L_{b-1} + L_b) runs over the ASCENDING bin
    spine's exact integer cumulative counts and masses (the standard
    grouped estimator; within-bin equality is the documented bin-
    granularity quantization — at 4096 cells the bias is far below
    the ppm report). One fact shuffle to per-user counts; everything
    after is histogram-sized. The inequality lens on user telemetry:
    a rising Gini means a shrinking heavy core generates the data —
    sampling and privacy review both want that number."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    rng = per.agg(F.min("c").alias("mn"), F.max("c").alias("mx"),
                  F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    binned = (per.crossJoin(F.broadcast(rng))
              .withColumn("bin", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(UG_BINS - 1),
                          F.expr(f"((c - mn) * {UG_BINS})"
                                 f" div (mx - mn + 1)")))))
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("c").alias("sb"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    terms = (hist
             .withColumn("n_prev", F.coalesce(F.sum("nb").over(wb),
                                              F.lit(0)))
             .withColumn("s_prev", F.coalesce(F.sum("sb").over(wb),
                                              F.lit(0)))
             .crossJoin(F.broadcast(rng.select("n", "s"))))
    # p_b*(L_prev + L_b) = nb*(2*s_prev + sb) / (n*s) — quantize each
    # bin's term to nano before the (bounded) sum for the order-free
    # integer total
    term = _ug_ha("1e9 * cast(nb as double) * (2 * s_prev + sb)"
                  " / (cast(n as double) * s)")
    agg = terms.select(F.expr(term).alias("t_nano"), "n", "s").groupBy(
        "n", "s").agg(F.sum("t_nano").alias("lorenz_nano"))
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.expr("s * 1000 div n").alias("mean_events_milli"),
        F.expr("cast((1000000000 - lorenz_nano) div 1000 as bigint)")
        .alias("gini_ppm"))


_UG_TERM = _ug_ha("1e9 * CAST(nb AS DOUBLE) * (2 * s_prev + sb)"
                  " / (CAST(n AS DOUBLE) * s)")

register("user_activity_gini", user_activity_gini, f"""
WITH per AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1
), rng AS (
    SELECT MIN(c) AS mn, MAX(c) AS mx, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s
    FROM per
), binned AS (
    SELECT c,
           CASE WHEN mx = mn THEN 0
                ELSE LEAST({UG_BINS - 1},
                           ((c - mn) * {UG_BINS}) // (mx - mn + 1))
           END AS bin
    FROM per CROSS JOIN rng
), hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(c) AS BIGINT) AS sb
    FROM binned GROUP BY bin
), terms AS (
    SELECT h.nb, h.sb,
           COALESCE(SUM(h.nb) OVER (ORDER BY h.bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_prev,
           COALESCE(SUM(h.sb) OVER (ORDER BY h.bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS s_prev,
           r.n, r.s
    FROM hist h CROSS JOIN rng r
), agg AS (
    SELECT n, s, CAST(SUM({_UG_TERM}) AS BIGINT) AS lorenz_nano
    FROM terms GROUP BY 1, 2
)
SELECT n AS n_users, s * 1000 // n AS mean_events_milli,
       CAST((1000000000 - lorenz_nano) // 1000 AS BIGINT) AS gini_ppm
FROM agg
""", "grouped-data Gini of per-user activity via histogram cutpoints")
