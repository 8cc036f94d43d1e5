"""Round-8 wave 4: record-linkage blocking, temporal-split hygiene,
link prediction, and model-diagnostic statistics — the curation and
evaluation layer between raw corpus and training run.

- Sorted-neighborhood dedup: the classic record-linkage alternative to
  LSH — normalize, block on a key prefix, sort WITHIN blocks, compare
  each record to its w-1 successors only. O(n·w) comparisons instead of
  O(n²); the block-local sort is a bounded window, never a global total
  order.
- Time-embargoed split audit: the temporal-eval hygiene check — a 70/30
  time split with a 2-day embargo gap, reporting per-type row counts
  and the train/test USER overlap (identity leakage that a purely
  row-level split audit cannot see).
- PACF via Durbin-Levinson: partial autocorrelations at lags 1-3 of the
  hourly count series per event type — the AR-order diagnostic. ACF
  numerators/denominators are n²-scaled exact integers (no mean
  subtraction in float); the 3-level Durbin-Levinson recursion is
  closed-form on the 9-decimal-rounded ACF values.
- Pearson correlation matrix: all 6 pairs of the four lineitem measures
  from ONE scan — 15 DECIMAL(38,0)-accumulated sufficient sums, then
  the long-format matrix unpivots from a single aggregate row.
- Readability profile: Flesch-style reading ease per source from exact
  integer totals (regex word / sentence / vowel-group counts) — the
  text-quality companion that catches OCR junk and boilerplate.
- Adamic-Adar link prediction: supplier-supplier affinity through
  co-supplied parts, inverse-log weighted; candidate pairs are generated
  per part with a roster cap (frequent-blocker drop), never all-pairs.
- Theil-T inequality decomposition: within-nation customer-revenue
  concentration plus each nation's between-group term, from nano-
  quantized order-free integer term sums (the MI/entropy pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import HOUR_NS

# ------------------------------------------ sorted-neighborhood dedup
SNM_KEY_LEN = 40     # sort key: first 40 normalized chars
SNM_SIG_LEN = 64     # comparison signature: first 64 normalized chars
SNM_BLOCK_LEN = 8    # block key: first 8 normalized chars
SNM_WINDOW = 3       # compare each record to its w-1 successors
SNM_MAXDIST = 8      # emit pairs at Levenshtein distance <= this
SNM_TOPK = 200       # deterministic output cap
SNM_RAW_PREFIX = 256  # normalize only this many raw chars (>= 4x SIG_LEN)


def snm_candidate_pairs(docs: DataFrame) -> DataFrame:
    """The SNM candidate-generation core over a (doc_id, text) frame:
    normalize a bounded SNM_RAW_PREFIX-char raw prefix (so per-doc
    regex cost is O(1) in document length), block on the first
    SNM_BLOCK_LEN normalized chars, sort within each block by the
    SNM_KEY_LEN-char key, and compare each doc against its next
    SNM_WINDOW-1 neighbors with Levenshtein over the SNM_SIG_LEN-char
    signature. Returns ALL (doc_a, doc_b, edit_dist) neighbor pairs —
    callers apply their own distance filters/caps. Shared by the
    registered query and the recall audit (queries/scoring_seq.py)."""
    normed = docs.select(
        "doc_id",
        F.expr(f"regexp_replace(lower(substr(text, 1, {SNM_RAW_PREFIX})),"
               " '[^a-z0-9]', '')")
        .alias("norm"))
    keyed = normed.select(
        "doc_id",
        F.expr(f"substr(norm, 1, {SNM_KEY_LEN})").alias("k"),
        F.expr(f"substr(norm, 1, {SNM_SIG_LEN})").alias("sig"),
        F.expr(f"substr(norm, 1, {SNM_BLOCK_LEN})").alias("blk"))
    win = Window.partitionBy("blk").orderBy("k", "doc_id")
    nb = keyed
    pair_frames = []
    for off in range(1, SNM_WINDOW):
        nb = nb.withColumn(f"d{off}", F.lead("doc_id", off).over(win)) \
               .withColumn(f"s{off}", F.lead("sig", off).over(win))
        pair_frames.append(
            nb.filter(F.col(f"d{off}").isNotNull())
              .select(F.col("doc_id").alias("doc_a"),
                      F.col(f"d{off}").alias("doc_b"),
                      F.levenshtein(F.col("sig"), F.col(f"s{off}"))
                      .alias("edit_dist")))
    pairs = pair_frames[0]
    for extra in pair_frames[1:]:
        pairs = pairs.unionByName(extra)
    return pairs


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood-method near-dup candidates over documents
    (see snm_candidate_pairs for the core). The scalable variant of
    Hernandez-Stolfo SNM: blocking first means the sort is a per-block
    window (one shuffle on the block key), NOT a global total order,
    and the comparison count is exactly (w-1)·n. Signature truncation
    bounds per-pair edit-distance cost to SNM_SIG_LEN²; output is
    capped deterministically at SNM_TOPK by (distance, pair) — the cap
    is part of the operator's semantics and mirrored in the oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (snm_candidate_pairs(docs)
            .filter(F.col("edit_dist") <= SNM_MAXDIST)
            .orderBy("edit_dist", "doc_a", "doc_b")
            .limit(SNM_TOPK))


register("dedup_sorted_neighborhood", dedup_sorted_neighborhood, f"""
WITH keyed AS (
    SELECT doc_id,
           substr(regexp_replace(lower(substr(text, 1, {SNM_RAW_PREFIX})),
                                 '[^a-z0-9]', '', 'g'),
                  1, {SNM_KEY_LEN}) AS k,
           substr(regexp_replace(lower(substr(text, 1, {SNM_RAW_PREFIX})),
                                 '[^a-z0-9]', '', 'g'),
                  1, {SNM_SIG_LEN}) AS sig,
           substr(regexp_replace(lower(substr(text, 1, {SNM_RAW_PREFIX})),
                                 '[^a-z0-9]', '', 'g'),
                  1, {SNM_BLOCK_LEN}) AS blk
    FROM documents
), nb AS (
    SELECT doc_id, sig,
           lead(doc_id, 1) OVER win AS d1, lead(sig, 1) OVER win AS s1,
           lead(doc_id, 2) OVER win AS d2, lead(sig, 2) OVER win AS s2
    FROM keyed
    WINDOW win AS (PARTITION BY blk ORDER BY k, doc_id)
), pairs AS (
    SELECT doc_id AS doc_a, d1 AS doc_b,
           CAST(levenshtein(sig, s1) AS INTEGER) AS edit_dist
    FROM nb WHERE d1 IS NOT NULL
    UNION ALL
    SELECT doc_id, d2, CAST(levenshtein(sig, s2) AS INTEGER)
    FROM nb WHERE d2 IS NOT NULL
)
SELECT doc_a, doc_b, edit_dist FROM pairs
WHERE edit_dist <= {SNM_MAXDIST}
ORDER BY edit_dist, doc_a, doc_b LIMIT {SNM_TOPK}
""", "sorted-neighborhood near-dup candidates (blocked window w=3)")

# ------------------------------------------ time-embargoed split audit
EMBARGO_DAYS = 2
TRAIN_FRAC_PCT = 70  # integer percent of the day span


def split_time_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged time-series split audit: cut the event-day span at
    TRAIN_FRAC_PCT% (integer day arithmetic), drop an EMBARGO_DAYS gap
    after the cut, and report per event type the train/embargo/test row
    counts plus the train-test USER overlap — users active on both
    sides of the cut leak identity-level signal that row-level split
    audits cannot see. The day bounds are a 1-row broadcast aggregate;
    the split classification is a map-side expression on the fact scan;
    user overlap reduces per (type, user) before counting — shuffle
    keys are user-dimension-sized, never fact-sized. overlap_ppm is an
    exact integer div against the smaller side's user count."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id",
        F.expr("ts_ns div 86400000000000").alias("day"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cut = bounds.select(
        (F.col("d0")
         + F.expr(f"(d1 - d0) * {TRAIN_FRAC_PCT} div 100")).alias("cut"))
    tagged = ev.crossJoin(F.broadcast(cut)).withColumn(
        "split",
        F.when(F.col("day") < F.col("cut"), F.lit("train"))
         .when(F.col("day") >= F.col("cut") + EMBARGO_DAYS, F.lit("test"))
         .otherwise(F.lit("embargo")))
    rows = (tagged.groupBy("event_type")
            .agg(F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
                 .alias("n_train"),
                 F.sum(F.when(F.col("split") == "embargo", 1).otherwise(0))
                 .alias("n_embargo"),
                 F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
                 .alias("n_test")))
    tu = (tagged.filter(F.col("split") != "embargo")
          .select("event_type", "user_id", "split").distinct()
          .groupBy("event_type", "user_id")
          .agg(F.max(F.when(F.col("split") == "train", 1).otherwise(0))
               .alias("in_train"),
               F.max(F.when(F.col("split") == "test", 1).otherwise(0))
               .alias("in_test")))
    users = (tu.groupBy("event_type")
             .agg(F.sum("in_train").alias("train_users"),
                  F.sum("in_test").alias("test_users"),
                  F.sum(F.col("in_train") * F.col("in_test"))
                  .alias("overlap_users")))
    return (rows.join(users, "event_type")
            .select("event_type", "n_train", "n_embargo", "n_test",
                    "train_users", "test_users", "overlap_users",
                    F.expr("overlap_users * 1000000"
                           " div least(train_users, test_users)")
                    .alias("overlap_ppm"))
            .orderBy("event_type"))


register("split_time_embargo", split_time_embargo, f"""
WITH ev AS (
    SELECT event_type, user_id,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS day
    FROM events
), cut AS (
    SELECT MIN(day) + (MAX(day) - MIN(day)) * {TRAIN_FRAC_PCT} // 100
           AS cut
    FROM ev
), tagged AS (
    SELECT event_type, user_id,
           CASE WHEN day < cut THEN 'train'
                WHEN day >= cut + {EMBARGO_DAYS} THEN 'test'
                ELSE 'embargo' END AS split
    FROM ev CROSS JOIN cut
), rows_t AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN split = 'embargo' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_embargo,
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test
    FROM tagged GROUP BY 1
), tu AS (
    SELECT event_type, user_id,
           MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
           MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
    FROM tagged WHERE split <> 'embargo'
    GROUP BY 1, 2
), users_t AS (
    SELECT event_type,
           CAST(SUM(in_train) AS BIGINT) AS train_users,
           CAST(SUM(in_test) AS BIGINT) AS test_users,
           CAST(SUM(in_train * in_test) AS BIGINT) AS overlap_users
    FROM tu GROUP BY 1
)
SELECT event_type, n_train, n_embargo, n_test,
       train_users, test_users, overlap_users,
       overlap_users * 1000000 // least(train_users, test_users)
       AS overlap_ppm
FROM rows_t JOIN users_t USING (event_type)
ORDER BY event_type
""", "70/30 time split + 2-day embargo: row counts and user leakage")

# ------------------------------------------ PACF via Durbin-Levinson
PACF_R_DECIMALS = 9  # quantize ACF before the D-L recursion


def events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the hourly count series per event
    type at lags 1-3 — the AR-order diagnostic (an AR(p) process cuts
    off after lag p). Dense hourly spine (time-span-bounded) like
    events_hourly_autocorr24, then for each lag k the ACF numerator and
    the shared denominator are n²-scaled EXACT integers:

        n²·num_k = n²·P_k - n·S·(A_k + B_k) + (n-k)·S²
        n²·den   = n²·Q  - n·S²

    with P_k = Σ x_t·x_{t-k}, A_k/B_k the early/late-side partial sums
    over the lapped rows, S = Σx, Q = Σx². Everything reduces in ONE
    aggregation over the lagged spine. r_k rounds to 9 decimals in both
    engines; the 3-level Durbin-Levinson recursion (phi22, phi21,
    phi33) is closed-form arithmetic on those quantized values, so the
    float work is an identical expression tree on identical inputs.
    int64 bound: n²·Q <= 9.2e18 holds to ~3e5 hours at 1e4 events/hour
    (35 years of hourly data); past that the sums move to
    DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return pacf_from_hourly(hourly)


def pacf_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_pacf over any (event_type, hr, cnt) hourly-count
    frame — shared with the streaming twin's finalizer
    (streaming/pacf.py), the fano/cusum/autocorr discipline, so the
    streamed PACF panel is bit-equal to the batch one by construction.
    Fresh-exprId same-name aliases on the spine-join's right side (the
    memory-sink gotcha; no-op Project in the batch plan)."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    wl = Window.partitionBy("event_type").orderBy("hr")
    lagged = dense
    for k in (1, 2, 3):
        lagged = lagged.withColumn(f"p{k}", F.lag("cnt", k).over(wl))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("cnt").alias("s"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("q")]
    for k in (1, 2, 3):
        pk = F.col(f"p{k}")
        aggs += [F.sum(F.col("cnt") * pk).alias(f"pp{k}"),
                 F.sum(F.when(pk.isNotNull(), pk)).alias(f"a{k}"),
                 F.sum(F.when(pk.isNotNull(), F.col("cnt")))
                 .alias(f"b{k}")]
    suff = lagged.groupBy("event_type").agg(*aggs)
    r_exprs = []
    for k in (1, 2, 3):
        num = (f"cast(n*n*pp{k} - n*s*(a{k}+b{k}) + (n-{k})*s*s"
               " as double)")
        den = "cast(n*n*q - n*s*s as double)"
        r_exprs.append(
            F.expr(f"round({num} / {den}, {PACF_R_DECIMALS})")
            .alias(f"r{k}"))
    rdf = suff.select("event_type", F.col("n").alias("n_hours"), *r_exprs)
    phi22 = "((r2 - r1*r1) / (1 - r1*r1))"
    phi21 = f"(r1 * (1 - {phi22}))"
    phi33 = (f"((r3 - {phi21}*r2 - {phi22}*r1)"
             f" / (1 - {phi21}*r1 - {phi22}*r2))")
    return (rdf.select(
                "event_type", "n_hours",
                (F.round(F.col("r1"), 6) + 0.0).alias("acf1"),
                (F.round(F.col("r2"), 6) + 0.0).alias("acf2"),
                (F.round(F.col("r3"), 6) + 0.0).alias("acf3"),
                (F.round(F.col("r1"), 6) + 0.0).alias("pacf1"),
                (F.round(F.expr(phi22), 6) + 0.0).alias("pacf2"),
                (F.round(F.expr(phi33), 6) + 0.0).alias("pacf3"))
            .orderBy("event_type"))


register("events_pacf", events_pacf, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS hr
    FROM events
), hourly AS (
    SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
    FROM hourly GROUP BY 1
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), lagged AS (
    SELECT event_type, cnt,
           lag(cnt, 1) OVER win AS p1,
           lag(cnt, 2) OVER win AS p2,
           lag(cnt, 3) OVER win AS p3
    FROM dense
    WINDOW win AS (PARTITION BY event_type ORDER BY hr)
), suff AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cnt) AS BIGINT) AS s,
           CAST(SUM(cnt * cnt) AS BIGINT) AS q,
           CAST(SUM(cnt * p1) AS BIGINT) AS pp1,
           CAST(SUM(CASE WHEN p1 IS NOT NULL THEN p1 END) AS BIGINT) AS a1,
           CAST(SUM(CASE WHEN p1 IS NOT NULL THEN cnt END) AS BIGINT) AS b1,
           CAST(SUM(cnt * p2) AS BIGINT) AS pp2,
           CAST(SUM(CASE WHEN p2 IS NOT NULL THEN p2 END) AS BIGINT) AS a2,
           CAST(SUM(CASE WHEN p2 IS NOT NULL THEN cnt END) AS BIGINT) AS b2,
           CAST(SUM(cnt * p3) AS BIGINT) AS pp3,
           CAST(SUM(CASE WHEN p3 IS NOT NULL THEN p3 END) AS BIGINT) AS a3,
           CAST(SUM(CASE WHEN p3 IS NOT NULL THEN cnt END) AS BIGINT) AS b3
    FROM lagged GROUP BY 1
), acf AS (
    SELECT event_type, n AS n_hours,
           ROUND(CAST(n*n*pp1 - n*s*(a1+b1) + (n-1)*s*s AS DOUBLE)
                 / CAST(n*n*q - n*s*s AS DOUBLE), {PACF_R_DECIMALS}) AS r1,
           ROUND(CAST(n*n*pp2 - n*s*(a2+b2) + (n-2)*s*s AS DOUBLE)
                 / CAST(n*n*q - n*s*s AS DOUBLE), {PACF_R_DECIMALS}) AS r2,
           ROUND(CAST(n*n*pp3 - n*s*(a3+b3) + (n-3)*s*s AS DOUBLE)
                 / CAST(n*n*q - n*s*s AS DOUBLE), {PACF_R_DECIMALS}) AS r3
    FROM suff
)
SELECT event_type, n_hours,
       ROUND(r1, 6) + 0.0 AS acf1,
       ROUND(r2, 6) + 0.0 AS acf2,
       ROUND(r3, 6) + 0.0 AS acf3,
       ROUND(r1, 6) + 0.0 AS pacf1,
       ROUND(((r2 - r1*r1) / (1 - r1*r1)), 6) + 0.0 AS pacf2,
       ROUND(((r3 - (r1 * (1 - ((r2 - r1*r1) / (1 - r1*r1))))*r2
               - ((r2 - r1*r1) / (1 - r1*r1))*r1)
              / (1 - (r1 * (1 - ((r2 - r1*r1) / (1 - r1*r1))))*r1
                   - ((r2 - r1*r1) / (1 - r1*r1))*r2)), 6) + 0.0 AS pacf3
FROM acf ORDER BY event_type
""", "hourly-count PACF lags 1-3 via closed-form Durbin-Levinson")

# ------------------------------------------ correlation matrix
_CM_VARS = {
    "qty": "CAST(l_quantity AS BIGINT)",
    "price": "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)",
    "disc": "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)",
    "tax": "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)",
}
_CM_PAIRS = [("disc", "price"), ("disc", "qty"), ("disc", "tax"),
             ("price", "qty"), ("price", "tax"), ("qty", "tax")]


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the four lineitem measures
    (quantity, price cents, discount pct, tax pct) in ONE fact scan:
    4 sums, 4 square-sums, and 6 cross-sums reduce to a single
    aggregate row — partial (map-side) combine does almost all the
    work, nothing shuffles but 15 accumulators. Integer units
    (quantity, cents, pct points) make every accumulator exact;
    products of cents (~1e7²=1e14/row) overflow int64 in the SUM at
    ~1e5 rows, so all 10 product sums accumulate DECIMAL(38,0) Spark-
    side (DuckDB SUM(BIGINT) widens to HUGEINT natively). The corr
    formula then runs in double on the one-row result and the matrix
    unpivots driver-free via stack()."""
    li = load_table(spark, sf_dir, "lineitem").select(
        *[F.expr(e).alias(v) for v, e in _CM_VARS.items()])
    aggs = [F.count(F.lit(1)).alias("n")]
    for v in _CM_VARS:
        aggs.append(F.sum(v).alias(f"s_{v}"))
    done = set()
    for x in _CM_VARS:
        for y in _CM_VARS:
            key = tuple(sorted((x, y)))
            if key in done:
                continue
            done.add(key)
            aggs.append(
                F.sum(F.col(x).cast("decimal(38,0)") * F.col(y))
                .alias(f"sp_{key[0]}_{key[1]}"))
    suff = li.agg(*aggs)
    corr = ("round((cast(n as double) * cast(sp_{x}_{y} as double)"
            " - cast(s_{x} as double) * cast(s_{y} as double))"
            " / sqrt((cast(n as double) * cast(sp_{x}_{x} as double)"
            " - cast(s_{x} as double) * cast(s_{x} as double))"
            " * (cast(n as double) * cast(sp_{y}_{y} as double)"
            " - cast(s_{y} as double) * cast(s_{y} as double))), 6)"
            " + 0.0")
    stack_args = ", ".join(
        f"'{x}', '{y}', {corr.format(x=x, y=y)}" for x, y in _CM_PAIRS)
    return (suff.select(
                F.col("n").alias("n_rows"),
                F.expr(f"stack({len(_CM_PAIRS)}, {stack_args})")
                .alias("var_x", "var_y", "corr"))
            .select("var_x", "var_y", "n_rows", "corr")
            .orderBy("var_x", "var_y"))


def _cm_oracle() -> str:
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for v, e in _CM_VARS.items():
        sums.append(f"CAST(SUM({e}) AS HUGEINT) AS s_{v}")
    done = set()
    for x in _CM_VARS:
        for y in _CM_VARS:
            key = tuple(sorted((x, y)))
            if key in done:
                continue
            done.add(key)
            sums.append(f"CAST(SUM({_CM_VARS[x]} * {_CM_VARS[y]})"
                        f" AS HUGEINT) AS sp_{key[0]}_{key[1]}")
    corr = ("ROUND((CAST(n AS DOUBLE) * CAST(sp_{x}_{y} AS DOUBLE)"
            " - CAST(s_{x} AS DOUBLE) * CAST(s_{y} AS DOUBLE))"
            " / sqrt((CAST(n AS DOUBLE) * CAST(sp_{x}_{x} AS DOUBLE)"
            " - CAST(s_{x} AS DOUBLE) * CAST(s_{x} AS DOUBLE))"
            " * (CAST(n AS DOUBLE) * CAST(sp_{y}_{y} AS DOUBLE)"
            " - CAST(s_{y} AS DOUBLE) * CAST(s_{y} AS DOUBLE))), 6)"
            " + 0.0")
    selects = " UNION ALL ".join(
        f"SELECT '{x}' AS var_x, '{y}' AS var_y, n AS n_rows, "
        f"{corr.format(x=x, y=y)} AS corr FROM suff"
        for x, y in _CM_PAIRS)
    return (f"WITH suff AS (SELECT {', '.join(sums)} FROM lineitem) "
            f"{selects} ORDER BY var_x, var_y")


register("lineitem_corr_matrix", lineitem_corr_matrix, _cm_oracle(),
         "pairwise Pearson matrix of 4 measures from one scan")

# ------------------------------------------ readability profile
_RE_WORD = "[A-Za-z]+"
_RE_SENT = "[.!?]+"
_RE_VOWEL = "[aeiouy]+"


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease profile per source: word count,
    sentence count (>=1 per doc), and vowel-group count (the standard
    deterministic syllable proxy) are exact integer regex-match counts
    per document, summed per source; the Flesch formula
    206.835 - 1.015·(W/S) - 84.6·(V/W) runs once per source row. One
    fact scan with map-side expressions, one source-cardinality
    shuffle. The regexes use only character classes, identical in Java
    and RE2 dialects."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr(f"size(regexp_extract_all(text, '{_RE_WORD}', 0))")
        .cast("long").alias("w"),
        F.expr("greatest(1, size(regexp_extract_all(text,"
               f" '{_RE_SENT}', 0)))").cast("long").alias("s"),
        F.expr(f"size(regexp_extract_all(lower(text), '{_RE_VOWEL}', 0))")
        .cast("long").alias("v"))
    flesch = ("round(206.835 - 1.015 * (cast(n_words as double)"
              " / n_sentences) - 84.6 * (cast(n_vowel_groups as double)"
              " / n_words), 4) + 0.0")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("w").alias("n_words"),
                 F.sum("s").alias("n_sentences"),
                 F.sum("v").alias("n_vowel_groups"))
            .select("source", "n_docs", "n_words", "n_sentences",
                    "n_vowel_groups",
                    (F.round(F.col("n_words")
                             / F.col("n_sentences").cast("double"), 4)
                     + 0.0).alias("words_per_sentence"),
                    F.expr(flesch).alias("flesch"))
            .orderBy("source"))


register("text_readability", text_readability, f"""
WITH docs AS (
    SELECT source,
           CAST(len(regexp_extract_all(text, '{_RE_WORD}')) AS BIGINT)
           AS w,
           CAST(greatest(1, len(regexp_extract_all(text, '{_RE_SENT}')))
                AS BIGINT) AS s,
           CAST(len(regexp_extract_all(lower(text), '{_RE_VOWEL}'))
                AS BIGINT) AS v
    FROM documents
), agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           CAST(SUM(s) AS BIGINT) AS n_sentences,
           CAST(SUM(v) AS BIGINT) AS n_vowel_groups
    FROM docs GROUP BY 1
)
SELECT source, n_docs, n_words, n_sentences, n_vowel_groups,
       ROUND(CAST(n_words AS DOUBLE) / n_sentences, 4) + 0.0
       AS words_per_sentence,
       ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_vowel_groups AS DOUBLE) / n_words), 4)
       + 0.0 AS flesch
FROM agg ORDER BY source
""", "Flesch-style readability per source from exact regex counts")

# ------------------------------------------ Adamic-Adar link prediction
AA_PART_CAP = 25   # drop parts co-supplied by more suppliers than this
AA_TOPK = 100
AA_SCALE = 1_000_000


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction between suppliers through co-supplied
    parts: score(a,b) = Σ_parts 1/ln(|suppliers(part)|), the classic
    inverse-log common-neighbor weight (frequent parts say little).
    Candidate generation is per-part with a roster cap — parts whose
    supplier roster exceeds AA_PART_CAP are dropped entirely (the
    frequent-blocker discipline from LSH banding: a mega-part would
    contribute O(cap²) near-zero-weight pairs). Per-part weights
    round(1e6/ln(cnt)) are exact integers computed once per part, so
    the pair score is an order-free integer sum; output caps at
    AA_TOPK deterministically. Shuffle sizes: distinct edge set (one
    fact shuffle), per-part rosters (bounded by cap), pair aggregate
    (<= parts·cap²/2 rows)."""
    su = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    cnt = (su.groupBy("l_partkey")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .filter((F.col("cnt") >= 2) & (F.col("cnt") <= AA_PART_CAP))
           .withColumn("w_micro",
                       F.expr(f"cast(round({AA_SCALE} / ln(cnt))"
                              " as bigint)")))
    eligible = su.join(cnt, "l_partkey")
    a, b = eligible.alias("a"), eligible.alias("b")
    pairs = (a.join(b, (F.col("a.l_partkey") == F.col("b.l_partkey"))
                    & (F.col("a.l_suppkey") < F.col("b.l_suppkey")))
             .select(F.col("a.l_suppkey").alias("supp_a"),
                     F.col("b.l_suppkey").alias("supp_b"),
                     F.col("a.w_micro").alias("w_micro")))
    return (pairs.groupBy("supp_a", "supp_b")
            .agg(F.count(F.lit(1)).alias("n_common_parts"),
                 F.sum("w_micro").alias("score_micro"))
            .orderBy(F.desc("score_micro"), "supp_a", "supp_b")
            .limit(AA_TOPK)
            .select("supp_a", "supp_b", "n_common_parts",
                    (F.round(F.col("score_micro") / AA_SCALE, 4) + 0.0)
                    .alias("aa_score")))


register("graph_adamic_adar", graph_adamic_adar, f"""
WITH su AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), cnt AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(ROUND({AA_SCALE} / ln(COUNT(*))) AS BIGINT) AS w_micro
    FROM su GROUP BY 1
    HAVING COUNT(*) BETWEEN 2 AND {AA_PART_CAP}
), pairs AS (
    SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, c.w_micro
    FROM su a
    JOIN su b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey < b.l_suppkey
    JOIN cnt c ON a.l_partkey = c.l_partkey
), scored AS (
    SELECT supp_a, supp_b,
           CAST(COUNT(*) AS BIGINT) AS n_common_parts,
           CAST(SUM(w_micro) AS BIGINT) AS score_micro
    FROM pairs GROUP BY 1, 2
)
SELECT supp_a, supp_b, n_common_parts,
       ROUND(score_micro / {AA_SCALE}.0, 4) + 0.0 AS aa_score
FROM scored
ORDER BY score_micro DESC, supp_a, supp_b LIMIT {AA_TOPK}
""", "Adamic-Adar supplier link prediction via co-supplied parts")

# ------------------------------------------ Theil-T decomposition
THEIL_SCALE = 1_000_000_000  # nano-quantized per-customer terms


def nation_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T decomposition of customer order-revenue inequality:
    within-nation T_g = Σ_i (x_i/X_g)·ln(x_i·n_g/X_g) over that
    nation's customers, plus the nation's between-group term
    (X_g/X)·ln((X_g/X)/(n_g/n)) — total inequality is Σ share·T_g +
    Σ between. Customers reduce to one cents-revenue row each (one
    fact shuffle); nation totals are a 25-row broadcast; each
    customer's within term is nano-quantized to an integer so the
    per-nation sum is order-free exact (the MI/entropy pattern).
    Customers with no orders don't appear (x·ln x -> 0 continuity).
    x_i·n_g stays in int64 to ~9e18/cents-revenue customers-per-nation
    product — documented headroom past any real retail scale."""
    cust_rev = (load_table(spark, sf_dir, "orders")
                .groupBy("o_custkey")
                .agg(F.sum(F.expr("cast(floor(o_totalprice * 100)"
                                  " as bigint)")).alias("x")))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    per_cust = (cust_rev.join(cust,
                              cust_rev.o_custkey == cust.c_custkey)
                .join(F.broadcast(nation),
                      F.col("c_nationkey") == F.col("n_nationkey"))
                .select("n_name", "x"))
    ntot = (per_cust.groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("ng"), F.sum("x").alias("xg")))
    tot = ntot.agg(F.sum("ng").alias("n"), F.sum("xg").alias("xt"))
    term = (f"cast(round({THEIL_SCALE} * (cast(x as double) / xg)"
            " * ln(cast(x as double) * ng / xg)) as bigint)")
    within = (per_cust.join(F.broadcast(ntot), "n_name")
              .groupBy("n_name")
              .agg(F.max("ng").alias("n_cust"), F.max("xg").alias("xg_c"),
                   F.sum(F.expr(term)).alias("t_nano")))
    between = ("round((cast(xg_c as double) / xt)"
               " * ln((cast(xg_c as double) / xt)"
               " / (cast(n_cust as double) / n)), 6) + 0.0")
    return (within.crossJoin(F.broadcast(tot))
            .select("n_name", "n_cust",
                    F.expr("xg_c * 1000000 div xt").alias("share_ppm"),
                    (F.round(F.col("t_nano") / THEIL_SCALE, 6) + 0.0)
                    .alias("theil_within"),
                    F.expr(between).alias("between_term"))
            .orderBy("n_name"))


register("nation_theil_index", nation_theil_index, f"""
WITH cust_rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
), per_cust AS (
    SELECT n_name, x
    FROM cust_rev
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
), ntot AS (
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng,
           CAST(SUM(x) AS BIGINT) AS xg
    FROM per_cust GROUP BY 1
), tot AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(xg) AS BIGINT) AS xt
    FROM ntot
), within AS (
    SELECT p.n_name, MAX(ng) AS n_cust, MAX(xg) AS xg_c,
           CAST(SUM(CAST(ROUND({THEIL_SCALE}
                * (CAST(x AS DOUBLE) / xg)
                * ln(CAST(x AS DOUBLE) * ng / xg)) AS BIGINT))
                AS BIGINT) AS t_nano
    FROM per_cust p JOIN ntot USING (n_name)
    GROUP BY 1
)
SELECT n_name, n_cust,
       xg_c * 1000000 // xt AS share_ppm,
       ROUND(t_nano / {THEIL_SCALE}.0, 6) + 0.0 AS theil_within,
       ROUND((CAST(xg_c AS DOUBLE) / xt)
             * ln((CAST(xg_c AS DOUBLE) / xt)
                  / (CAST(n_cust AS DOUBLE) / n)), 6) + 0.0
       AS between_term
FROM within CROSS JOIN tot
ORDER BY n_name
""", "Theil-T customer-revenue inequality: within + between by nation")
