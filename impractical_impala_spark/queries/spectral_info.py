"""Round-8 wave 1: spectral periodicity, distributional drift rigor,
effect sizes, and information-theoretic dependence — the monitoring
layer a training-data pipeline runs continuously over its event
telemetry and corpus manifests.

- Goertzel-style periodogram: spectral line amplitude of the hourly
  event-count sequence at candidate periods (12 h / 24 h / 7 d). The
  trig tables are fixed-point integer literals embedded IDENTICALLY in
  both engines, so the correlation sums are exact integers; hours with
  zero events contribute zero to every sum, which means no calendar
  spine materializes at all — the aggregate domain is (period, residue),
  at most 12+24+168 = 204 cells regardless of corpus size.
- Cramér-von Mises drift: the integrated-squared-ECDF-gap companion to
  the sup-norm KS test, over the same shared 256-bin quantized domain;
  the ppm ECDF gaps are exact integers and the weighted square-sum
  accumulates in DECIMAL(38,0)/HUGEINT before ONE rounded float.
- Effect sizes: Cohen's d (from exact centi-unit sufficient statistics,
  the Welch-t pattern) and Cliff's delta (from the 256-bin histogram
  pair counts, the Mann-Whitney pattern) — the "is the shift LARGE"
  companions to the significance tests.
- Mutual information: exact-count MI of event_type x daypart with
  per-cell nano-int quantization so the <= types x 4 term sum is
  order-free exact integer arithmetic.
- Fold balance audit: deterministic multiplicative-hash 5-fold split
  of the documents corpus with a per-fold chi-square balance check
  against the source marginals — the split-infrastructure audit that
  catches a fold capturing a source's documents wholesale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table
from .drift import HOUR_NS, clip_bin

# --------------------------------------------- Goertzel periodogram
PERIODS = (12, 24, 168)  # hours: half-day, diurnal, weekly
TRIG_SCALE = 1_000_000


def _trig_rows() -> list[tuple[int, int, int, int]]:
    """(period, residue, cos_micro, sin_micro) fixed-point table —
    generated ONCE here and embedded as literals in both engines, so
    there is no trig evaluation anywhere in the query plans."""
    rows = []
    for p in PERIODS:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append((p, r, int(round(math.cos(ang) * TRIG_SCALE)),
                         int(round(math.sin(ang) * TRIG_SCALE))))
    return rows


_TRIG_SCHEMA = T.StructType([
    T.StructField("period", T.LongType()),
    T.StructField("r", T.LongType()),
    T.StructField("cosm", T.LongType()),
    T.StructField("sinm", T.LongType()),
])


def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral line amplitude of the hourly event-count sequence at
    each candidate period: sc = sum_t x_t cos(2 pi t/P), ss likewise
    with sin, amplitude ratio = sqrt(sc^2+ss^2) / (N * scale). Hours
    bin by integer division, residues by t mod P, so the count
    aggregate is keyed on at most sum(PERIODS)=204 (period, residue)
    cells — one fact scan, one bounded shuffle, broadcast trig join.
    sc/ss stay exact int64 while N * TRIG_SCALE < 9.2e18 (N ~ 9e12
    events); past that the sums move to DECIMAL(38,0) like the CvM
    accumulator below. sqrt/divide run on exact integers <= 2^53, so
    the one float expression is engine-identical."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts_ns div {HOUR_NS}").alias("t"))
    per_res = (ev
               .select("t", F.explode(F.array(
                   *[F.lit(p) for p in PERIODS])).alias("period"))
               .select("period", F.expr("t % period").alias("r"))
               .groupBy("period", "r").agg(F.count(F.lit(1)).alias("cnt")))
    trig = spark.createDataFrame(_trig_rows(), _TRIG_SCHEMA)
    sums = (per_res.join(F.broadcast(trig), ["period", "r"])
            .groupBy("period")
            .agg(F.sum("cnt").alias("n"),
                 F.sum(F.col("cnt") * F.col("cosm")).alias("sc"),
                 F.sum(F.col("cnt") * F.col("sinm")).alias("ss")))
    amp = F.sqrt(F.col("sc") * F.col("sc").cast("double")
                 + F.col("ss") * F.col("ss").cast("double")) \
        / (F.col("n").cast("double") * TRIG_SCALE)
    return (sums.select("period", "n", "sc", "ss",
                        (F.round(amp, 6) + 0.0).alias("amp_ratio"))
            .orderBy("period"))


_TRIG_VALUES = ",\n".join(
    f"({p}, {r}, {c}, {s})" for p, r, c, s in _trig_rows())

register("events_periodogram", events_periodogram, f"""
WITH ev AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS t
    FROM events
), trig(period, r, cosm, sinm) AS (
    VALUES {_TRIG_VALUES}
), per_res AS (
    SELECT p.period, ev.t % p.period AS r, COUNT(*) AS cnt
    FROM ev CROSS JOIN (SELECT DISTINCT period FROM trig) p
    GROUP BY 1, 2
), sums AS (
    SELECT pr.period,
           CAST(SUM(pr.cnt) AS BIGINT) AS n,
           CAST(SUM(pr.cnt * tg.cosm) AS BIGINT) AS sc,
           CAST(SUM(pr.cnt * tg.sinm) AS BIGINT) AS ss
    FROM per_res pr JOIN trig tg
      ON pr.period = tg.period AND pr.r = tg.r
    GROUP BY pr.period
)
SELECT period, n, sc, ss,
       ROUND(SQRT(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
             / (CAST(n AS DOUBLE) * {TRIG_SCALE}), 6) + 0.0 AS amp_ratio
FROM sums ORDER BY period
""", "fixed-point periodogram of hourly event counts at 12h/24h/7d")


# ------------------------------------------ Cramér-von Mises drift
N_CVM_BINS = 256


def events_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between the early and
    late half of each event type's value stream, over the shared
    256-bin quantized domain (events_value_ks_drift's contract): where
    KS reads the single worst ECDF gap, CvM integrates the SQUARED gap
    over the whole distribution, weighting each bin by its pooled
    mass — sensitive to broad mid-distribution shifts KS under-reads.
    cvm = sum_b (ca_b + cb_b) * d_ppm(b)^2 / (1e12 * N), with
    d_ppm the exact integer ppm ECDF gap. The square-sum accumulates
    as DECIMAL(38,0) (HUGEINT in the oracle): |term| <= N * 1e12, so
    int64 would wrap past ~9e6 rows per type — the accumulator is
    chosen for the 100 TB case, not patched later."""
    # NULL values would create a NULL bin that sorts NULLS-FIRST in
    # Spark but NULLS-LAST in DuckDB inside the cumulative windows —
    # filter them like events_value_ks_drift does
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "ts_ns", "value"))
    stats = ev.agg(F.min("value").alias("mn_v"), F.max("value").alias("mx_v"),
                   F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        clip_bin(F.col("value"), F.col("mn_v"), F.col("mx_v"),
                 N_CVM_BINS).alias("bin"),
        F.expr("CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END").alias("early"))
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum("early").alias("ca"),
        F.sum(F.lit(1) - F.col("early")).alias("cb"))
    tot = per_bin.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = (Window.partitionBy("event_type").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gaps = (per_bin.join(F.broadcast(tot), "event_type")
            .withColumn("d_ppm",
                        F.expr("sum(ca) over (partition by event_type"
                               " order by bin) * 1000000 div na")
                        - F.expr("sum(cb) over (partition by event_type"
                                 " order by bin) * 1000000 div nb")))
    return (gaps.groupBy("event_type")
            .agg(F.max("na").alias("n_early"), F.max("nb").alias("n_late"),
                 F.sum(((F.col("ca") + F.col("cb")) * F.col("d_ppm")
                        * F.col("d_ppm")).cast("decimal(38,0)"))
                 .alias("ssum"))
            .select("event_type", "n_early", "n_late",
                    (F.round(F.col("ssum").cast("double")
                             / (F.lit(1e12) * (F.col("n_early")
                                               + F.col("n_late"))), 6)
                     + 0.0).alias("cvm"))
            .orderBy("event_type"))


register("events_cvm_drift", events_cvm_drift, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns, value
    FROM events WHERE value IS NOT NULL
), stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v,
           (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns
    FROM ev
), binned AS (
    SELECT event_type,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_CVM_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_CVM_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin,
           CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END AS early
    FROM ev CROSS JOIN stats
), per_bin AS (
    SELECT event_type, bin,
           CAST(SUM(early) AS BIGINT) AS ca,
           CAST(SUM(1 - early) AS BIGINT) AS cb
    FROM binned GROUP BY 1, 2
), tot AS (
    SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
           CAST(SUM(cb) AS BIGINT) AS nb
    FROM per_bin GROUP BY event_type
), gaps AS (
    SELECT p.event_type, t.na, t.nb, p.ca, p.cb,
           SUM(p.ca) OVER (PARTITION BY p.event_type ORDER BY p.bin)
               * 1000000 // t.na
           - SUM(p.cb) OVER (PARTITION BY p.event_type ORDER BY p.bin)
               * 1000000 // t.nb AS d_ppm
    FROM per_bin p JOIN tot t USING (event_type)
)
SELECT event_type, MAX(na) AS n_early, MAX(nb) AS n_late,
       ROUND(CAST(SUM(CAST((ca + cb) AS HUGEINT) * d_ppm * d_ppm)
                  AS DOUBLE)
             / (1e12 * (MAX(na) + MAX(nb))), 6) + 0.0 AS cvm
FROM gaps GROUP BY event_type ORDER BY event_type
""", "two-sample Cramér-von Mises drift over the 256-bin domain")


# --------------------------------- effect sizes (Cohen d, Cliff delta)
def events_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Cliff's delta for each event type's early-vs-late
    value shift — the EFFECT-SIZE companions to the Welch-t and
    Mann-Whitney significance tests (a 100 TB stream makes everything
    'significant'; these say whether the shift is big). d comes from
    exact centi-unit sufficient statistics (the Welch pattern);
    delta = (#greater - #less) / (na*nb) comes from the 256-bin
    histogram via cumulative opposite-half counts (the MW pattern —
    same-bin pairs count as ties, the documented quantization).
    Overflow ladder: greater/less sums are bounded by na*nb, int64 to
    ~3e9 rows per half; the centi^2 sum matches the Welch bound."""
    # NULL values: counts would include rows the centi sums skip, and
    # the NULL bin sorts at opposite ends of the two engines' windows
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "ts_ns", "value",
                  F.floor(F.col("value") * 100).cast("long")
                  .alias("centi")))
    stats = ev.agg(F.min("value").alias("mn_v"), F.max("value").alias("mx_v"),
                   F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    base = (ev.crossJoin(F.broadcast(stats))
            .withColumn("early", F.expr(
                "CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END"))
            .withColumn("bin", clip_bin(F.col("value"), F.col("mn_v"),
                                        F.col("mx_v"), N_CVM_BINS)))
    suff = base.groupBy("event_type").agg(
        F.sum("early").alias("na"),
        F.sum(F.lit(1) - F.col("early")).alias("nb"),
        F.sum(F.col("early") * F.col("centi")).alias("sa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")).alias("sb"),
        F.sum(F.col("early") * F.col("centi") * F.col("centi")).alias("qa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")
              * F.col("centi")).alias("qb"))
    per_bin = base.groupBy("event_type", "bin").agg(
        F.sum("early").alias("ca"),
        F.sum(F.lit(1) - F.col("early")).alias("cb"))
    cum = (per_bin
           .withColumn("cb_below",
                       F.coalesce(F.expr(
                           "sum(cb) over (partition by event_type"
                           " order by bin rows between unbounded preceding"
                           " and 1 preceding)"), F.lit(0)))
           .withColumn("cb_tot", F.expr(
               "sum(cb) over (partition by event_type)")))
    pairs = cum.groupBy("event_type").agg(
        F.sum(F.col("ca") * F.col("cb_below")).alias("greater"),
        F.sum(F.col("ca") * (F.col("cb_tot") - F.col("cb_below")
                             - F.col("cb"))).alias("less"))
    va = ("((cast(na as double)*qa - cast(sa as double)*sa)"
          "/(cast(na as double)*(na-1)))")
    vb = ("((cast(nb as double)*qb - cast(sb as double)*sb)"
          "/(cast(nb as double)*(nb-1)))")
    pooled = (f"sqrt(((na-1)*{va} + (nb-1)*{vb})"
              f"/(cast(na as double) + nb - 2))")
    # degenerate-half guard (the events_gumbel_maxima n>=2 pattern):
    # without it Spark's non-ANSI 0/0 yields NULL while DuckDB's IEEE
    # division yields Inf/NaN — an explicit NULL keeps engines aligned
    d = (f"CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE "
         f"((cast(sa as double)/na - cast(sb as double)/nb)"
         f" / {pooled}) END")
    delta = ("CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE "
             "round((greater - less)"
             " / (cast(na as double) * nb), 4) + 0.0 END")
    return (suff.join(pairs, "event_type")
            .select("event_type", F.col("na").alias("n_early"),
                    F.col("nb").alias("n_late"),
                    (F.round(F.expr(d), 4) + 0.0).alias("cohens_d"),
                    F.expr(delta).alias("cliffs_delta"))
            .orderBy("event_type"))


register("events_effect_sizes", events_effect_sizes, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns,
           value, CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events WHERE value IS NOT NULL
), stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v,
           (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns
    FROM ev
), base AS (
    SELECT event_type, centi,
           CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END AS early,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_CVM_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_CVM_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin
    FROM ev CROSS JOIN stats
), suff AS (
    SELECT event_type,
           CAST(SUM(early) AS BIGINT) AS na,
           CAST(SUM(1 - early) AS BIGINT) AS nb,
           CAST(SUM(early * centi) AS BIGINT) AS sa,
           CAST(SUM((1 - early) * centi) AS BIGINT) AS sb,
           CAST(SUM(early * centi * centi) AS BIGINT) AS qa,
           CAST(SUM((1 - early) * centi * centi) AS BIGINT) AS qb
    FROM base GROUP BY event_type
), per_bin AS (
    SELECT event_type, bin,
           CAST(SUM(early) AS BIGINT) AS ca,
           CAST(SUM(1 - early) AS BIGINT) AS cb
    FROM base GROUP BY 1, 2
), cum AS (
    SELECT event_type, ca, cb,
           COALESCE(SUM(cb) OVER (PARTITION BY event_type ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS cb_below,
           SUM(cb) OVER (PARTITION BY event_type) AS cb_tot
    FROM per_bin
), pairs AS (
    SELECT event_type,
           CAST(SUM(ca * cb_below) AS BIGINT) AS greater,
           CAST(SUM(ca * (cb_tot - cb_below - cb)) AS BIGINT) AS less
    FROM cum GROUP BY event_type
)
SELECT s.event_type, s.na AS n_early, s.nb AS n_late,
       CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE
       ROUND((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)
             / SQRT(((na-1)*((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)
                             /(CAST(na AS DOUBLE)*(na-1)))
                     + (nb-1)*((CAST(nb AS DOUBLE)*qb
                                - CAST(sb AS DOUBLE)*sb)
                               /(CAST(nb AS DOUBLE)*(nb-1))))
                    /(CAST(na AS DOUBLE) + nb - 2)), 4) + 0.0
       END AS cohens_d,
       CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE
       ROUND((p.greater - p.less)
             / (CAST(s.na AS DOUBLE) * s.nb), 4) + 0.0
       END AS cliffs_delta
FROM suff s JOIN pairs p USING (event_type)
ORDER BY s.event_type
""", "Cohen's d + Cliff's delta per event type, early vs late half")


# ------------------------------------------------ mutual information
def events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count mutual information (and normalized MI) between
    event_type and daypart: MI = sum_xy (n_xy/N) ln(n_xy*N/(n_x*n_y)).
    The contingency table is model-sized (types x 4), marginals attach
    by broadcast, and each cell's float term quantizes to nano-units
    before an exact integer sum, so the result is identical under any
    partitioning (a <=20-term double SUM would already round stably at
    6 dp, but the integer path removes the question). One output row:
    the dependence audit a feature-store runs before declaring two
    categorical columns redundant."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"((ts_ns div {HOUR_NS}) % 24) div 6").alias("daypart"))
    obs = ev.groupBy("event_type", "daypart").agg(
        F.count(F.lit(1)).alias("nxy"))
    row_t = obs.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    col_t = obs.groupBy("daypart").agg(F.sum("nxy").alias("ny"))
    n_tot = obs.agg(F.sum("nxy").alias("n"))
    cells = (obs.join(F.broadcast(row_t), "event_type")
             .join(F.broadcast(col_t), "daypart")
             .crossJoin(F.broadcast(n_tot)))
    mi_term = ("cast(round((nxy / cast(n as double))"
               " * ln(nxy * cast(n as double) / (cast(nx as double) * ny))"
               " * 1e9) as bigint)")
    hx_term = ("cast(round(-(nx / cast(n as double))"
               " * ln(nx / cast(n as double)) * 1e9) as bigint)")
    hy_term = ("cast(round(-(ny / cast(n as double))"
               " * ln(ny / cast(n as double)) * 1e9) as bigint)")
    mi = cells.agg(F.sum(F.expr(mi_term)).alias("mi_nano"),
                   F.max("n").alias("n"))
    hx = (row_t.crossJoin(F.broadcast(n_tot))
          .agg(F.sum(F.expr(hx_term)).alias("hx_nano")))
    hy = (col_t.crossJoin(F.broadcast(n_tot))
          .agg(F.sum(F.expr(hy_term)).alias("hy_nano")))
    return (mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
            .select(F.col("n").alias("n_events"),
                    (F.round(F.col("mi_nano") / 1e9, 6) + 0.0)
                    .alias("mi_nats"),
                    (F.round(F.col("hx_nano") / 1e9, 6) + 0.0)
                    .alias("h_type_nats"),
                    (F.round(F.col("hy_nano") / 1e9, 6) + 0.0)
                    .alias("h_daypart_nats"),
                    (F.round(F.col("mi_nano")
                             / F.least(F.col("hx_nano"),
                                       F.col("hy_nano")).cast("double"),
                             6) + 0.0).alias("nmi")))


register("events_mutual_information", events_mutual_information, f"""
WITH ev AS (
    SELECT event_type,
           ((CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS}) % 24) // 6
               AS daypart
    FROM events
), obs AS (
    SELECT event_type, daypart, CAST(COUNT(*) AS BIGINT) AS nxy
    FROM ev GROUP BY 1, 2
), row_t AS (
    SELECT event_type, CAST(SUM(nxy) AS BIGINT) AS nx FROM obs GROUP BY 1
), col_t AS (
    SELECT daypart, CAST(SUM(nxy) AS BIGINT) AS ny FROM obs GROUP BY 1
), n_tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM obs),
mi AS (
    SELECT CAST(SUM(CAST(ROUND((nxy / CAST(n AS DOUBLE))
               * LN(nxy * CAST(n AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * ny)) * 1e9) AS BIGINT))
           AS BIGINT) AS mi_nano,
           MAX(n) AS n
    FROM obs JOIN row_t USING (event_type) JOIN col_t USING (daypart)
    CROSS JOIN n_tot
), hx AS (
    SELECT CAST(SUM(CAST(ROUND(-(nx / CAST(n AS DOUBLE))
               * LN(nx / CAST(n AS DOUBLE)) * 1e9) AS BIGINT))
           AS BIGINT) AS hx_nano
    FROM row_t CROSS JOIN n_tot
), hy AS (
    SELECT CAST(SUM(CAST(ROUND(-(ny / CAST(n AS DOUBLE))
               * LN(ny / CAST(n AS DOUBLE)) * 1e9) AS BIGINT))
           AS BIGINT) AS hy_nano
    FROM col_t CROSS JOIN n_tot
)
SELECT n AS n_events,
       ROUND(mi_nano / 1e9, 6) + 0.0 AS mi_nats,
       ROUND(hx_nano / 1e9, 6) + 0.0 AS h_type_nats,
       ROUND(hy_nano / 1e9, 6) + 0.0 AS h_daypart_nats,
       ROUND(mi_nano / CAST(LEAST(hx_nano, hy_nano) AS DOUBLE), 6) + 0.0
           AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hy
""", "exact-count MI / normalized MI of event_type x daypart")


# ------------------------------------------------ fold balance audit
N_FOLDS = 5
FOLD_MULT = 2_654_435_761  # Knuth multiplicative hash constant
FOLD_MOD = 4_294_967_296


def fold_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold split of the documents corpus by
    multiplicative id-hash, with a per-fold chi-square balance check
    against the source marginals — catches the classic split bug where
    an id-correlated source lands wholesale in one fold (leaking it
    out of training). Cells are folds x sources (model-sized), cell
    chi-square terms quantize to micro-units for an order-free exact
    sum. The hash is plain int64 arithmetic, identical in both
    engines; document ids up to ~3.4e9 keep the product in int64."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr(f"(doc_id * {FOLD_MULT}) % {FOLD_MOD} % {N_FOLDS}")
        .alias("fold"))
    obs = docs.groupBy("fold", "source").agg(F.count(F.lit(1)).alias("o"))
    fold_t = obs.groupBy("fold").agg(F.sum("o").alias("nf"))
    src_t = obs.groupBy("source").agg(F.sum("o").alias("ns"))
    n_tot = obs.agg(F.sum("o").alias("n"))
    term = ("cast(round(pow(o - cast(nf as double) * ns / n, 2)"
            " / (cast(nf as double) * ns / n) * 1e6) as bigint)")
    return (obs.join(F.broadcast(fold_t), "fold")
            .join(F.broadcast(src_t), "source")
            .crossJoin(F.broadcast(n_tot))
            .groupBy("fold")
            .agg(F.max("nf").alias("n_docs"),
                 F.min("o").alias("min_cell"),
                 F.max("o").alias("max_cell"),
                 F.sum(F.expr(term)).alias("chi2_micro"))
            .select("fold", "n_docs", "min_cell", "max_cell",
                    (F.round(F.col("chi2_micro") / 1e6, 4) + 0.0)
                    .alias("chi2_fold"))
            .orderBy("fold"))


register("fold_balance_audit", fold_balance_audit, f"""
WITH docs AS (
    SELECT source,
           (doc_id * {FOLD_MULT}) % {FOLD_MOD} % {N_FOLDS} AS fold
    FROM documents
), obs AS (
    SELECT fold, source, CAST(COUNT(*) AS BIGINT) AS o
    FROM docs GROUP BY 1, 2
), fold_t AS (SELECT fold, CAST(SUM(o) AS BIGINT) AS nf FROM obs GROUP BY 1),
src_t AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ns FROM obs GROUP BY 1),
n_tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
SELECT fold, MAX(nf) AS n_docs,
       CAST(MIN(o) AS BIGINT) AS min_cell,
       CAST(MAX(o) AS BIGINT) AS max_cell,
       ROUND(CAST(SUM(CAST(ROUND(POW(o - CAST(nf AS DOUBLE) * ns / n, 2)
                / (CAST(nf AS DOUBLE) * ns / n) * 1e6) AS BIGINT))
             AS BIGINT) / 1e6, 4) + 0.0 AS chi2_fold
FROM obs JOIN fold_t USING (fold) JOIN src_t USING (source)
CROSS JOIN n_tot
GROUP BY fold ORDER BY fold
""", "hash 5-fold split balance audit (chi-square vs source marginals)")


# ---------------------------------------------- Granger causality
from .monitor_eval import _ha_sql as _gc_ha  # noqa: E402
from .stat_tests import (  # noqa: E402
    _OLS_B0 as _GC_B0, _OLS_B1 as _GC_B1, _OLS_B2 as _GC_B2)

# the Cramer beta strings are engine-agnostic SQL (used verbatim in
# both the Spark plan and the DuckDB oracle, like lineitem_price_ols)
_GC_B0_SQL, _GC_B1_SQL, _GC_B2_SQL = _GC_B0, _GC_B1, _GC_B2

GC_PAIRS = (("click", "purchase"), ("purchase", "click"))
GC_F_CRIT_MICRO = 3_841_459  # F(1, inf) at alpha = 0.05, micro


def events_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality between the click and purchase daily-count
    series, both directions: does yesterday's X improve today's Y
    prediction beyond yesterday's Y? The unrestricted OLS
    (1, y_lag, x_lag) and restricted (1, y_lag) fits both come from
    EXACT integer sufficient sums over the zero-filled day spine
    (normal equations in closed form — no iterative fitting), the
    F statistic F = (RSS_r - RSS_u) * (n - 3) / RSS_u quantizes to
    micro with shared half-away rounding, and the verdict compares
    against the pre-quantized F(1, inf) critical value. The fact
    table reduces once to (day, type) counts; everything after is
    day-spine cardinality."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_ns div 86400000000000").alias("d"))
    daily = ev.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return granger_from_daily(daily)


def granger_from_daily(daily: DataFrame, *,
                       suff_as_double: bool = False) -> DataFrame:
    """Core of events_granger_causality over any (d, event_type, c)
    daily-count frame covering ALL types (the day range derives from
    the counts — identical to the raw-event range). Shared with the
    streaming twin's finalizer (streaming/granger.py): the
    hourly-count state folds hr div 24 with exact integer sums, so the
    streamed F panel is bit-equal to the batch one by construction.
    Fresh-exprId same-name aliases guard every re-referenced lineage
    (the memory-sink gotcha; no-op Projects in the batch plan).

    ``suff_as_double``: the Cramer determinant strings multiply THREE
    sufficient statistics in integer (n*s11*s22-scale) — exact and
    in-range for daily COUNTS, but the whole-unit daily VALUE series
    (events_granger_value) puts s11*s22 near 2e22, past int64 on both
    engines (Spark wraps silently in non-ANSI mode; DuckDB raised —
    caught at the r14 oracle gate). With the flag, the exactly
    accumulated integer sums are cast to double BEFORE the beta
    arithmetic; the expression text is identical on both engines, so
    the one float evaluation is bit-reproducible cross-engine. Default
    False keeps the count path's plan byte-identical."""
    # sorted: set iteration order is per-process (PYTHONHASHSEED) and
    # flipped the IN-list between sessions — see te_from_daily
    cnt = daily.filter(F.col("event_type").isin(
        *sorted({t for pair in GC_PAIRS for t in pair})))
    rng = daily.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    spine = rng.select(F.explode(F.expr("sequence(dmin, dmax)")).alias("d"))
    out = None
    for x_t, y_t in GC_PAIRS:
        wide = (spine.select(F.col("d").alias("d"))
                .join(cnt.filter(F.col("event_type") == x_t)
                      .select(F.col("d").alias("d"),
                              F.col("c").alias("xc")), "d", "left")
                .join(cnt.filter(F.col("event_type") == y_t)
                      .select(F.col("d").alias("d"),
                              F.col("c").alias("yc")), "d", "left")
                .select("d", F.coalesce("xc", F.lit(0)).alias("xc"),
                        F.coalesce("yc", F.lit(0)).alias("yc")))
        w = Window.orderBy("d")
        pts = (wide
               .withColumn("x1", F.lag("yc").over(w))
               .withColumn("x2", F.lag("xc").over(w))
               .filter(F.col("x1").isNotNull())
               .select(F.col("yc").alias("y"), "x1", "x2"))
        suff = pts.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
            F.sum(F.expr("x1 * x1")).alias("s11"),
            F.sum(F.expr("x1 * x2")).alias("s12"),
            F.sum(F.expr("x2 * x2")).alias("s22"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x1 * y")).alias("s1y"),
            F.sum(F.expr("x2 * y")).alias("s2y"),
            F.sum(F.expr("y * y")).alias("syy"))
        if suff_as_double:
            suff = suff.select(*[F.col(c).cast("double").alias(c)
                                 for c in suff.columns])
        sst = ("(cast(syy as double)"
               " - cast(sy as double)*cast(sy as double)/n)")
        ess_u = (f"({_GC_B0}*cast(sy as double)"
                 f" + {_GC_B1}*cast(s1y as double)"
                 f" + {_GC_B2}*cast(s2y as double)"
                 " - cast(sy as double)*cast(sy as double)/n)")
        ess_r = ("((cast(n as double)*s1y - cast(s1 as double)*sy)"
                 " * (cast(n as double)*s1y - cast(s1 as double)*sy)"
                 " / (cast(n as double)"
                 " * (cast(n as double)*s11"
                 " - cast(s1 as double)*s1)))")
        f_stat = (f"((({ess_u}) - ({ess_r})) * (n - 3.0))"
                  f" / (({sst}) - ({ess_u}))")
        part = (suff.select(
            F.lit(f"{x_t}->{y_t}").alias("direction"),
            F.col("n").cast("long").alias("n_days"),
            F.expr(_gc_ha(f"{f_stat} * 1e6")).alias("f_micro"))
            .withColumn("causal", F.expr(
                f"cast(f_micro > {GC_F_CRIT_MICRO} as int)")))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("direction")


def _gc_oracle() -> str:
    sst = ("(CAST(syy AS DOUBLE)"
           " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)")
    ess_u = (f"({_GC_B0_SQL}*CAST(sy AS DOUBLE)"
             f" + {_GC_B1_SQL}*CAST(s1y AS DOUBLE)"
             f" + {_GC_B2_SQL}*CAST(s2y AS DOUBLE)"
             " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)")
    ess_r = ("((CAST(n AS DOUBLE)*s1y - CAST(s1 AS DOUBLE)*sy)"
             " * (CAST(n AS DOUBLE)*s1y - CAST(s1 AS DOUBLE)*sy)"
             " / (CAST(n AS DOUBLE)"
             " * (CAST(n AS DOUBLE)*s11 - CAST(s1 AS DOUBLE)*s1)))")
    f_stat = (f"((({ess_u}) - ({ess_r})) * (n - 3.0))"
              f" / (({sst}) - ({ess_u}))")
    parts = []
    for x_t, y_t in GC_PAIRS:
        parts.append(f"""
SELECT '{x_t}->{y_t}' AS direction,
       CAST(n AS BIGINT) AS n_days,
       {_gc_ha(f"{f_stat} * 1e6")} AS f_micro,
       CAST(CASE WHEN {_gc_ha(f"{f_stat} * 1e6")} > {GC_F_CRIT_MICRO}
            THEN 1 ELSE 0 END AS INT) AS causal
FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
           CAST(SUM(x1*x1) AS BIGINT) AS s11,
           CAST(SUM(x1*x2) AS BIGINT) AS s12,
           CAST(SUM(x2*x2) AS BIGINT) AS s22,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x1*y) AS BIGINT) AS s1y,
           CAST(SUM(x2*y) AS BIGINT) AS s2y,
           CAST(SUM(y*y) AS BIGINT) AS syy
    FROM (
        SELECT yc AS y,
               LAG(yc) OVER (ORDER BY d) AS x1,
               LAG(xc) OVER (ORDER BY d) AS x2
        FROM (
            SELECT s.d,
                   COALESCE(x.c, 0) AS xc, COALESCE(y.c, 0) AS yc
            FROM (SELECT UNNEST(range(dmin, dmax + 1)) AS d
                  FROM (SELECT MIN(CAST(epoch_us(ts) AS BIGINT) * 1000
                                   // 86400000000000) AS dmin,
                               MAX(CAST(epoch_us(ts) AS BIGINT) * 1000
                                   // 86400000000000) AS dmax
                        FROM events)) s
            LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) * 1000
                              // 86400000000000 AS d, COUNT(*) AS c
                       FROM events WHERE event_type = '{x_t}'
                       GROUP BY 1) x ON s.d = x.d
            LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) * 1000
                              // 86400000000000 AS d, COUNT(*) AS c
                       FROM events WHERE event_type = '{y_t}'
                       GROUP BY 1) y ON s.d = y.d))
    WHERE x1 IS NOT NULL)""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY direction"


register("events_granger_causality", events_granger_causality,
         _gc_oracle(),
         "two-direction Granger F-test on daily click/purchase counts")


# --------------------------------------------------- Hurst exponent
import math as _math

from .monitor_eval import _ha_sql as _ha  # noqa: E402

HURST_MS = (1, 2, 3, 5)  # aggregation block sizes
# ln(m) pre-quantized to micro — fixed PUBLIC constants shared by both
# engines, so the 4-point log-log regression is pure integer x-values
HURST_LNM_MICRO = {m: int(_math.floor(_math.log(m) * 1e6 + 0.5))
                   for m in HURST_MS}


def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily total event count by the
    aggregated-variance method: variance of block means at block
    sizes m in HURST_MS falls like m^(2H-2), so H = 1 + slope/2 of
    the ln-var vs ln-m line — the long-memory diagnostic that says
    whether load fluctuations average out (H=0.5, Poisson-like) or
    persist (H>0.5, self-similar traffic: capacity planning must not
    assume sqrt-n smoothing). Block SUMS are exact integers off the
    zero-filled day spine (tail days beyond k*m truncate, the
    standard estimator); each ln-variance quantizes to micro, the ln m
    x-values are pre-quantized module constants, and the 4-point OLS
    slope is one float expression over those integers. Day-spine
    cardinality throughout."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 86400000000000").alias("d"))
    cnt = ev.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    return hurst_from_daily(cnt)


def hurst_from_daily(cnt: DataFrame) -> DataFrame:
    """Core of events_hurst_exponent over any global (d, c) daily-count
    frame (the day range derives from the counts — identical to the
    raw-event range). Shared with the streaming twin's finalizer
    (streaming/hurst.py): the hourly-count state folds hr div 24
    summed over all types with exact integer sums, so the streamed
    Hurst estimate is bit-equal to the batch one by construction.
    Fresh-exprId same-name aliases guard the re-referenced count
    lineage (the memory-sink gotcha; no-op Projects in the batch
    plan)."""
    rng = cnt.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    right = cnt.select(F.col("d").alias("d"), F.col("c").alias("c"))
    spine = (rng.select(
        F.explode(F.expr("sequence(dmin, dmax)")).alias("d"), "dmin",
        F.expr("dmax - dmin + 1").alias("n"))
        .join(right, "d", "left")
        .select(F.expr("d - dmin").alias("i"), "n",
                F.coalesce("c", F.lit(0)).alias("x")))
    ms = ", ".join(str(m) for m in HURST_MS)
    blocks = (spine
              .withColumn("m", F.explode(F.expr(f"array({ms})")))
              .filter(F.expr("i < (n div m) * m"))
              .groupBy("m", F.expr("i div m").alias("b"))
              .agg(F.sum("x").alias("s"), F.max("n").alias("n")))
    per_m = blocks.groupBy("m").agg(
        F.count(F.lit(1)).alias("k"), F.sum("s").alias("ss"),
        F.sum(F.expr("s * s")).alias("qq"))
    # var of block MEANS = (k*qq - ss^2) / (k*(k-1)) / m^2
    v = ("((cast(k as double) * qq - cast(ss as double) * ss)"
         " / (cast(k as double) * (k - 1))"
         " / (cast(m as double) * m))")
    lx_case = ("case " + " ".join(
        f"when m = {m} then {HURST_LNM_MICRO[m]}" for m in HURST_MS)
        + " end")
    pts = per_m.select(
        "m", "k", F.expr(f"cast({lx_case} as bigint)").alias("lx"),
        F.expr(_ha(f"1e6 * ln({v})")).alias("ly"))
    agg = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
        F.sum(F.expr("lx * ly")).alias("sxy"),
        F.sum(F.expr("lx * lx")).alias("sxx"),
        F.max(F.expr("case when m = 1 then k end")).alias("n_days"))
    slope = ("((cast(np as double) * sxy - cast(sx as double) * sy)"
             " / (cast(np as double) * sxx - cast(sx as double) * sx))")
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.expr(_ha(f"({slope}) * 1e6")).alias("slope_micro"),
        F.expr(_ha(f"(1.0 + ({slope}) / 2) * 1e6")).alias("hurst_micro"))


def _hurst_oracle() -> str:
    lx_case = ("CASE " + " ".join(
        f"WHEN m = {m} THEN {HURST_LNM_MICRO[m]}" for m in HURST_MS)
        + " END")
    v = ("((CAST(k AS DOUBLE) * qq - CAST(ss AS DOUBLE) * ss)"
         " / (CAST(k AS DOUBLE) * (k - 1))"
         " / (CAST(m AS DOUBLE) * m))")
    slope = ("((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))")
    ms = ", ".join(str(m) for m in HURST_MS)
    return f"""
WITH ev AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS d
    FROM events
), cnt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1),
rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT s.d - r.dmin AS i, r.dmax - r.dmin + 1 AS n,
           COALESCE(cnt.c, 0) AS x
    FROM rng r,
         (SELECT UNNEST(range((SELECT dmin FROM rng),
                              (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN cnt ON s.d = cnt.d
), blocks AS (
    SELECT mm.m, i // mm.m AS b, CAST(SUM(x) AS BIGINT) AS s,
           MAX(n) AS n
    FROM spine, (SELECT UNNEST([{ms}]) AS m) mm
    WHERE i < (n // mm.m) * mm.m
    GROUP BY 1, 2
), per_m AS (
    SELECT m, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(s) AS BIGINT) AS ss,
           CAST(SUM(s * s) AS BIGINT) AS qq
    FROM blocks GROUP BY 1
), pts AS (
    SELECT m, k, CAST({lx_case} AS BIGINT) AS lx,
           {_ha(f"1e6 * LN({v})")} AS ly
    FROM per_m
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
           CAST(SUM(lx * ly) AS BIGINT) AS sxy,
           CAST(SUM(lx * lx) AS BIGINT) AS sxx,
           CAST(MAX(CASE WHEN m = 1 THEN k END) AS BIGINT) AS n_days
    FROM pts
)
SELECT n_days,
       {_ha(f"({slope}) * 1e6")} AS slope_micro,
       {_ha(f"(1.0 + ({slope}) / 2) * 1e6")} AS hurst_micro
FROM agg
"""


register("events_hurst_exponent", events_hurst_exponent,
         _hurst_oracle(),
         "Hurst exponent (aggregated-variance method) of daily load")


# ---------------------------------------------- Rayleigh diurnal test
RAY_Z_CRIT_MICRO = 2_995_732  # -ln(0.05) in micro units


def _ray_trig_case(fn) -> str:
    """24-arm CASE mapping hour-of-day -> micro fixed-point cos/sin
    of 2*pi*h/24 — the periodogram trig-table discipline, embedded
    identically in both engines."""
    arms = " ".join(
        f"WHEN {h} THEN {int(round(fn(2.0 * math.pi * h / 24) * 1e6))}"
        for h in range(24))
    return f"CASE h {arms} END"


def events_rayleigh_diurnal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of diurnal concentration per event type: hours
    of day map to angles, the mean resultant length
    R = |sum e^(i*theta)| / n says HOW concentrated the daily rhythm
    is, and z = n*R^2 with p ~ exp(-z) says whether it beats
    uniformity — the circular-statistics companion to
    events_chi2_daypart (which bins into 4 dayparts; Rayleigh uses
    the full angular resolution and gives a mean PHASE). The trig
    values are 24 fixed-point micro literals (the periodogram
    discipline), so sc/ss are exact integers off the 24-cell
    (type, hour) census; one sqrt and one atan2 per type follow,
    milli/micro-quantized with shared half-away rounding."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"(ts_ns div {HOUR_NS}) % 24").alias("h"))
    cen = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    cosc = _ray_trig_case(math.cos)
    sinc = _ray_trig_case(math.sin)
    suff = (cen.groupBy("event_type")
            .agg(F.sum("c").alias("n"),
                 F.sum(F.expr(f"c * ({cosc})")).alias("sc"),
                 F.sum(F.expr(f"c * ({sinc})")).alias("ss")))
    r_bar = ("(sqrt(cast(sc as double) * sc + cast(ss as double) * ss)"
             " / (cast(n as double) * 1e6))")
    mean_h = (f"(pmod(atan2(cast(ss as double), cast(sc as double))"
              f" * 24.0 / (2 * pi()) + 24.0, 24.0))")
    z = f"(cast(n as double) * {r_bar} * {r_bar})"
    return (suff.select(
        "event_type", F.col("n").cast("long").alias("n_events"),
        F.expr(_ha(f"({mean_h}) * 1e3")).alias("mean_hour_milli"),
        F.expr(_ha(f"({r_bar}) * 1e6")).alias("r_bar_ppm"),
        F.expr(_ha(f"({z}) * 1e6")).alias("rayleigh_z_micro"),
        F.expr(f"cast({_ha(f'({z}) * 1e6')} >= {RAY_Z_CRIT_MICRO}"
               " as int)").alias("diurnal"))
        .orderBy("event_type"))


_RAY_RBAR = ("(SQRT(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)"
             " / (CAST(n AS DOUBLE) * 1e6))")
_RAY_MEANH = ("((ATAN2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))"
              " * 24.0 / (2 * PI()) + 24.0) % 24.0)")
_RAY_Z = f"(CAST(n AS DOUBLE) * {_RAY_RBAR} * {_RAY_RBAR})"

register("events_rayleigh_diurnal", events_rayleigh_diurnal, f"""
WITH ev AS (
    SELECT event_type,
           (CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS}) % 24 AS h
    FROM events
), cen AS (
    SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), suff AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(c * ({_ray_trig_case(math.cos)})) AS BIGINT) AS sc,
           CAST(SUM(c * ({_ray_trig_case(math.sin)})) AS BIGINT) AS ss
    FROM cen GROUP BY 1
)
SELECT event_type, n AS n_events,
       {_ha(f"({_RAY_MEANH}) * 1e3")} AS mean_hour_milli,
       {_ha(f"({_RAY_RBAR}) * 1e6")} AS r_bar_ppm,
       {_ha(f"({_RAY_Z}) * 1e6")} AS rayleigh_z_micro,
       CAST({_ha(f"({_RAY_Z}) * 1e6")} >= {RAY_Z_CRIT_MICRO} AS INT)
           AS diurnal
FROM suff ORDER BY event_type
""", "Rayleigh circular test of diurnal concentration per event type")
