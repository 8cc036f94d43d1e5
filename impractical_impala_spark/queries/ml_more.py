"""Distributed-ML support operators: single-pass covariance over the
embedding corpus, fixed-iteration PageRank, winsorized robust stats,
percentile-cut curriculum bucketing, and Markov transition matrices.

The reference computes per-series moments in R (sd/corr/acf —
dtrendandstat_dlog.R:150-219); this module is the extension surface for
the matrix- and graph-shaped statistics a training pipeline needs, each
decomposed to Spark's execution model:

- covariance: sufficient statistics in ONE corpus pass — per-batch
  partial Gram matrices (Arrow-vectorized numpy X^T X inside
  mapInPandas) summed by (i, j), column sums JVM-side via posexplode;
  the d×d result and the final (S_ij - S_i S_j / n) / (n-1) projection
  are model-size. No row of the corpus crosses the shuffle: only d²
  partials per batch do.
- PageRank: rank vector stays distributed (one row per node); each of
  the 3 fixed iterations is one co-partitioned join + map-side-combined
  sum. Fixed iteration count keeps lineage bounded (contrast
  operators/graph.py's converge-and-checkpoint loop, which this
  deliberately does not need).
- winsorized stats / curriculum buckets: percentile cutpoints reduce to
  a model-size frame (per-group or 1-row) broadcast back over the
  corpus — the scalable alternative to a global NTILE window, which
  would funnel the corpus through one task.
- Markov transitions: one shuffle on the sequence key for the lead()
  window, then a tiny-key count matrix; probabilities attach via a
  broadcast join against per-source totals, not a second window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

DIM = 64  # embeddings fixture dimension (TESTDATA.md)


# ------------------------------------------------ single-pass covariance
# Fixed-point quantization scale. Float sums are order-dependent, and a
# distributed sum's order is partition-dependent — so the sufficient
# statistics are computed over floor(x * 1024) integers (1024 is a power
# of two: float32 -> double -> *1024 -> floor is EXACT on both engines),
# making every sum a bigint with one deterministic value. The only
# floating-point ops are the final model-size projection, an identical
# expression tree on both engines. Products |xq| <= ~2^13 summed over
# the corpus stay far inside int64 until ~2^37 rows per (i, j) cell —
# at larger corpora the partials switch to decimal(38).
Q_SCALE = 1024


def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the (quantized) embedding
    corpus via one-pass sufficient statistics: cov_ij = (S_ij - S_i S_j
    / n) / (n - 1), S_ij from per-batch integer numpy Gram partials
    (Arrow-vectorized mapInPandas), S_i from a JVM-side posexplode
    aggregation. Output is d(d+1)/2 model-size rows; no corpus row
    crosses the shuffle — only d² bigint partials per batch do.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        iu = np.triu_indices(DIM)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xq = np.floor(x * Q_SCALE).astype(np.int64)
            g = xq.T @ xq
            yield pd.DataFrame({
                "i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                "s": g[iu]})

    gram = (
        emb.mapInPandas(gram_partials, "i int, j int, s long")
        .groupBy("i", "j").agg(F.sum("s").alias("s_ij"))
    )
    xq = F.floor(F.col("x").cast("double") * Q_SCALE).cast("long")
    stats = (
        emb.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(xq).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    sa = stats.select(F.col("i"), F.col("s").alias("s_i"), "n")
    sb = stats.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    unscale = float(Q_SCALE * Q_SCALE)
    return (
        gram.join(F.broadcast(sa), "i").join(F.broadcast(sb), "j")
        .select(
            "i", "j",
            # + 0.0 folds IEEE -0.0 to +0.0: a tiny negative covariance
            # rounds to zero with an engine-dependent sign otherwise
            (F.round((F.col("s_ij").cast("double")
                      - F.col("s_i").cast("double")
                      * F.col("s_j").cast("double") / F.col("n"))
                     / (F.col("n") - 1) / F.lit(unscale), 6)
             + F.lit(0.0)).alias("cov"))
        .orderBy("i", "j")
    )


register("emb_covariance", emb_covariance, f"""
WITH idx AS (
    SELECT UNNEST(range(1, {DIM} + 1)) AS k
), ex AS (
    SELECT vec_id, k - 1 AS i,
           CAST(FLOOR(CAST(embedding[k] AS DOUBLE) * {Q_SCALE}) AS BIGINT)
               AS xq
    FROM embeddings CROSS JOIN idx
), gram AS (
    SELECT a.i AS i, b.i AS j, SUM(a.xq * b.xq) AS s_ij
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
), stats AS (
    SELECT i, SUM(xq) AS s, COUNT(*) AS n FROM ex GROUP BY i
)
SELECT g.i, g.j,
       ROUND((CAST(g.s_ij AS DOUBLE)
              - CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE) / sa.n)
             / (sa.n - 1) / {float(Q_SCALE * Q_SCALE)}, 6) + 0.0 AS cov
FROM gram g JOIN stats sa ON g.i = sa.i JOIN stats sb ON g.j = sb.i
ORDER BY g.i, g.j
""", "one-pass covariance via integer Gram partials (fixed-point exact)")


# --------------------------------------------------------- pagerank
PR_ITERS = 3
PR_DAMP = 0.85
PR_TOP = 25


def user_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user co-activity graph: users adjacent in the
    sorted roster of each (hour, event_type) cohort are linked, edges
    symmetrized, then 3 damped power iterations. Returns the top 25
    users by rank (ties broken by user_id).

    The graph construction (distinct cohort membership -> per-cohort
    lead()) bounds edges at one per roster adjacency — no cohort
    self-join, so a hot cohort contributes linearly, not quadratically.
    Every node has degree >= 1 by construction (symmetrized), so the
    iteration never drops nodes and needs no dangling-mass correction.
    """
    ev = load_table(spark, sf_dir, "events")
    ua = (ev.select("user_id",
                    F.expr("ts_ns div 3600000000000").alias("hr"),
                    "event_type")
          .distinct())
    w = Window.partitionBy("hr", "event_type").orderBy("user_id")
    e0 = (ua.withColumn("b", F.lead("user_id").over(w))
          .filter(F.col("b").isNotNull())
          .select(F.col("user_id").alias("a"), "b"))
    edges = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
             .distinct())
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d")) \
               .withColumnRenamed("a", "node")
    nrow = deg.agg(F.count(F.lit(1)).alias("n"))
    pr = deg.crossJoin(F.broadcast(nrow)) \
            .select("node", (F.lit(1.0) / F.col("n")).alias("pr"))
    for _ in range(PR_ITERS):
        src = pr.join(deg, "node")
        contrib = (
            edges.join(src, edges.a == src.node)
            .groupBy("b")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("m"))
        )
        pr = (contrib.crossJoin(F.broadcast(nrow))
              .select(F.col("b").alias("node"),
                      ((1 - PR_DAMP) / F.col("n")
                       + PR_DAMP * F.col("m")).alias("pr")))
    return (
        pr.select(F.col("node").alias("user_id"),
                  F.round("pr", 8).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "user_id")
        .limit(PR_TOP)
    )


def _pagerank_oracle() -> str:
    prev = "pr0"
    iters = []
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""pr{k} AS (
    SELECT e.b AS node,
           (1 - {PR_DAMP}) / (SELECT n FROM nn)
           + {PR_DAMP} * SUM(p.pr / d.d) AS pr
    FROM edges e JOIN {prev} p ON p.node = e.a JOIN deg d ON d.node = e.a
    GROUP BY e.b
)""")
        prev = f"pr{k}"
    return f"""
WITH ua AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr, event_type
    FROM events
), e0 AS (
    SELECT a, b FROM (
        SELECT user_id AS a,
               LEAD(user_id) OVER (PARTITION BY hr, event_type
                                   ORDER BY user_id) AS b
        FROM ua
    ) WHERE b IS NOT NULL
), edges AS (
    SELECT DISTINCT a, b FROM (
        SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
    )
), deg AS (
    SELECT a AS node, COUNT(*) AS d FROM edges GROUP BY a
), nn AS (
    SELECT COUNT(*) AS n FROM deg
), pr0 AS (
    SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM deg
), {", ".join(iters)}
SELECT node AS user_id, ROUND(pr, 8) AS pagerank
FROM {prev} ORDER BY pagerank DESC, user_id LIMIT {PR_TOP}
"""


register("user_pagerank", user_pagerank, _pagerank_oracle(),
         "3-iteration damped PageRank over the co-activity graph")


# ------------------------------------------------- winsorized stats
def text_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorized mean of document length: clip at the
    in-group P05/P95 before averaging — the robust-stat companion to
    the plain mean, immune to the long tail a crawl corpus always has.
    Cutpoints reduce to one row per language and broadcast back; the
    corpus is scanned twice but never shuffled beyond the lang-keyed
    aggs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("x"))
    pct = docs.groupBy("lang").agg(
        F.expr("percentile(x, 0.05)").alias("p05"),
        F.expr("percentile(x, 0.95)").alias("p95"))
    return (
        docs.join(F.broadcast(pct), "lang")
        .withColumn("cx", F.least(F.greatest(F.col("x"), F.col("p05")),
                                  F.col("p95")))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("cx"), 6).alias("winsor_mean"),
             F.round(F.avg("x"), 6).alias("raw_mean"))
        .orderBy("lang")
    )


register("text_winsorized_stats", text_winsorized_stats, """
WITH pct AS (
    SELECT lang,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS p05,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS p95
    FROM documents GROUP BY lang
)
SELECT d.lang, COUNT(*) AS n_docs,
       ROUND(AVG(LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), p.p05), p.p95)), 6)
           AS winsor_mean,
       ROUND(AVG(CAST(d.n_chars AS DOUBLE)), 6) AS raw_mean
FROM documents d JOIN pct p USING (lang)
GROUP BY d.lang ORDER BY d.lang
""", "per-language winsorized (P05/P95-clipped) mean length")


# ---------------------------------------------- curriculum bucketing
def curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to 4 curriculum buckets by global length
    quartile and summarize each bucket. The cutpoints are a 1-row
    percentile aggregate broadcast over the corpus — NOT a global
    NTILE window, which would sort the whole corpus in one task. At
    100 TB the exact percentile becomes approx_percentile with the
    same downstream plan (see queries/sketches.py)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("x"))
    cuts = docs.agg(
        F.expr("percentile(x, array(0.25, 0.5, 0.75))").alias("c"))
    bucket = (
        F.when(F.col("x") <= F.col("c")[0], 1)
        .when(F.col("x") <= F.col("c")[1], 2)
        .when(F.col("x") <= F.col("c")[2], 3)
        .otherwise(4)
    ).cast("long")
    return (
        docs.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.min("x"), 2).alias("min_chars"),
             F.round(F.max("x"), 2).alias("max_chars"),
             F.round(F.avg("x"), 6).alias("avg_chars"))
        .orderBy("bucket")
    )


register("curriculum_buckets", curriculum_buckets, """
WITH cuts AS (
    SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS c
    FROM documents
), b AS (
    SELECT CAST(CASE WHEN CAST(n_chars AS DOUBLE) <= c[1] THEN 1
                     WHEN CAST(n_chars AS DOUBLE) <= c[2] THEN 2
                     WHEN CAST(n_chars AS DOUBLE) <= c[3] THEN 3
                     ELSE 4 END AS BIGINT) AS bucket,
           CAST(n_chars AS DOUBLE) AS x
    FROM documents CROSS JOIN cuts
)
SELECT bucket, COUNT(*) AS n_docs,
       ROUND(MIN(x), 2) AS min_chars, ROUND(MAX(x), 2) AS max_chars,
       ROUND(AVG(x), 6) AS avg_chars
FROM b GROUP BY bucket ORDER BY bucket
""", "quartile curriculum buckets via broadcast cutpoints (no global NTILE)")


# ------------------------------------------------ markov transitions
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: counts and row-normalized probabilities for every
    (current, next) event-type pair. ONE corpus pass: a user-keyed
    lead() window, then the #types² model-size count matrix; the
    per-source normalization is a window over that tiny matrix —
    deriving totals from a second aggregation branch would re-run the
    whole corpus subtree (no common-subplan reuse at planning time),
    which the plan test pins by asserting a single parquet scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tr = (ev.withColumn("next_type", F.lead("event_type").over(w))
          .filter(F.col("next_type").isNotNull()))
    cnt = (tr.groupBy(F.col("event_type").alias("src"),
                      F.col("next_type").alias("dst"))
           .agg(F.count(F.lit(1)).alias("n")))
    wsrc = Window.partitionBy("src")
    return (
        cnt.select("src", "dst", "n",
                   F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("p"))
        .orderBy("src", "dst")
    )


register("events_markov_transitions", events_markov_transitions, """
WITH tr AS (
    SELECT event_type AS src, next_type AS dst FROM (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
                   AS next_type
        FROM events
    ) WHERE next_type IS NOT NULL
), cnt AS (
    SELECT src, dst, COUNT(*) AS n FROM tr GROUP BY src, dst
)
SELECT src, dst, n,
       ROUND(n / SUM(n) OVER (PARTITION BY src), 6) AS p
FROM cnt ORDER BY src, dst
""", "per-user event-sequence Markov transition counts + probabilities")


# ------------------------------------- intra-label embedding cohesion
COH_SCALE = 4096  # power of two: quantized components sum exactly
COH_DIM = 64


def emb_intra_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pairwise intra-label (quantized) cosine WITHOUT the pairwise
    join: for unit vectors, sum over pairs of dot(a,b) equals
    (|S|² - Σ|v|²)/2 where S = Σv — so the O(n²) metric-learning QA
    statistic collapses to per-label vector sums, O(n·d) with one
    shuffle on (label, pos). Components are floor-quantized to integers
    AFTER normalization (identical IEEE arithmetic on both engines), so
    every distributed sum has exactly one value — the emb_covariance
    determinism trick applied to a pairwise statistic. At 100 TB the
    per-label state is d+1 integers; no row ever meets another row."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    q = (emb.withColumn(
            "norm",
            F.expr("sqrt(aggregate(v, cast(0.0 as double),"
                   " (acc, x) -> acc + x * x))"))
         .filter(F.col("norm") > 0)
         .select("label", F.expr(
             f"transform(v, x -> cast(floor(x / norm * {COH_SCALE})"
             f" as bigint))").alias("q"))
         .withColumn("qsq", F.expr(
             "aggregate(q, cast(0 as bigint), (acc, x) -> acc + x * x)")))
    possums = (q.select("label", F.posexplode("q").alias("pos", "x"))
               .groupBy("label", "pos").agg(F.sum("x").alias("s")))
    s2 = possums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("s2"))
    per = q.groupBy("label").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("qsq").alias("qsum"))
    return (per.join(s2, "label").filter(F.col("n") >= 2)
            .select("label", "n",
                    (F.round((F.col("s2") - F.col("qsum"))
                             / (F.col("n") * (F.col("n") - 1))
                             / float(COH_SCALE * COH_SCALE), 6) + 0.0)
                    .alias("mean_intra_cos"))
            .orderBy("label"))


register("emb_intra_label_cohesion", emb_intra_label_cohesion, f"""
WITH nv AS (
    SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), q AS (
    SELECT label,
           list_transform(v, x -> CAST(FLOOR(x / norm * {COH_SCALE})
                                       AS BIGINT)) AS q
    FROM (SELECT label, v,
                 sqrt(list_reduce(list_transform(v, x -> x * x),
                                  (acc, x) -> acc + x)) AS norm
          FROM nv)
    WHERE norm > 0
), qs AS (
    SELECT label, q,
           CAST(list_reduce(list_transform(q, x -> x * x),
                            (acc, x) -> acc + x) AS BIGINT) AS qsq
    FROM q
), possums AS (
    SELECT label, k, CAST(SUM(q[k]) AS BIGINT) AS s
    FROM qs, (SELECT UNNEST(range(1, {COH_DIM} + 1)) AS k) ks
    GROUP BY label, k
), s2 AS (
    SELECT label, CAST(SUM(s * s) AS BIGINT) AS s2 FROM possums GROUP BY label
), per AS (
    SELECT label, COUNT(*) AS n, CAST(SUM(qsq) AS BIGINT) AS qsum FROM qs
    GROUP BY label
)
SELECT per.label, per.n,
       ROUND(CAST(s2.s2 - per.qsum AS DOUBLE)
             / (per.n * (per.n - 1)) / {float(COH_SCALE * COH_SCALE)}, 6)
           + 0.0 AS mean_intra_cos
FROM per JOIN s2 ON per.label = s2.label
WHERE per.n >= 2 ORDER BY per.label
""", "intra-label mean pairwise cosine via the sum-of-vectors identity")


# ----------------------- dominant principal direction (power iteration)
PCA_ITERS = 128  # convergence needs gap^iters << 1; fixture gap ~0.93
PCA_VNORM = 16384       # eigenvector fixed-point scale (2^14)
PCA_SNORM = 1 << 20     # normalized-matrix fixed-point scale


def _trunc_div(a, b):
    """Integer division truncating toward zero — the Spark `div` /
    DuckDB `//` semantics (Python's // floors, which differs on
    negatives; numpy likewise)."""
    import numpy as np
    q = np.abs(a) // np.abs(b)
    return np.where((a < 0) != (b < 0), -q, q)


def _collect_gram(spark: SparkSession, sf_dir: str) -> list:
    """Shared Gram-collection plan of the PCA queries: corpus ->
    Arrow-batched integer partials -> d(d+1)/2 bigint cells -> the ONE
    audited model-size collect of this module."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        iu = np.triu_indices(DIM)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xq = np.floor(x * Q_SCALE).astype(np.int64)
            g = xq.T @ xq
            yield pd.DataFrame({
                "i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                "s": g[iu]})

    gram = (emb.mapInPandas(gram_partials, "i int, j int, s long")
            .groupBy("i", "j").agg(F.sum("s").alias("s_ij")))
    return gram.collect()  # model-size: d(d+1)/2 = 2080 bigint cells


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus via power
    iteration in EXACT fixed-point integer arithmetic end to end — the
    numerical-linear-algebra pattern that survives distribution: the
    corpus reduces to the d x d integer second-moment matrix S (the
    emb_covariance Gram partials: Arrow-batched integer numpy, only d^2
    bigint partials per batch cross the shuffle), the matrix is
    model-size (4096 rows), and the iteration runs on it driver-side
    (the ann_ivf_trained discipline for model-size state). S normalizes
    to PCA_SNORM fixed-point by its max |entry|, v starts at the
    all-ones vector x PCA_VNORM, and every step is
        w = S_norm @ v;  v' = w * PCA_VNORM trunc-div max|w|
    — pure int64 (|w| <= d * 2^20 * 2^14 = 2^40), identical in Python,
    Spark and the machine-generated unrolled-CTE DuckDB oracle; sign is
    pinned by the deterministic start vector. Corpus-size bound: the
    normalization S * PCA_SNORM must fit int64, i.e. max|S| < 2^43;
    with |x|<=1, Q_SCALE=1024, d=64 that is ~8M vectors — guarded by
    an explicit driver-side OverflowError (numpy would otherwise wrap
    silently while the oracle raises), documented in SCALE.md. Emits the 64 loadings in
    1/1024 units plus the Rayleigh quotient of the final iterate
    (integer sufficient products, one float division at the end).
    Uncentered second moment by design: embedding corpora are
    mean-reduced upstream and the uncentered form keeps every
    accumulation exact without the n*S_i*S_j overflow ladder."""
    import numpy as np
    import pandas as pd

    rows = _collect_gram(spark, sf_dir)
    S = np.zeros((DIM, DIM), dtype=np.int64)
    for r in rows:
        S[r.i, r.j] = r.s_ij
        S[r.j, r.i] = r.s_ij
    smax = int(np.abs(S).max())
    # Normalization overflow bound: S * PCA_SNORM must stay inside
    # int64 (numpy would silently wrap where the DuckDB oracle raises
    # on BIGINT overflow — divergent failure modes). smax <= n * d *
    # (Q_SCALE*|x|_max)^2, so with |x|<=1 and Q_SCALE=1024 the bound
    # trips at ~2^43/d ~ 8M vectors; beyond that, reduce Q_SCALE or
    # split PCA_SNORM into a post-division scale (see SCALE.md).
    if smax * PCA_SNORM >= 1 << 63:
        raise OverflowError(
            f"emb_pca_power: max|S|={smax} * PCA_SNORM={PCA_SNORM} "
            "exceeds int64; reduce Q_SCALE for this corpus size")
    sn = _trunc_div(S * PCA_SNORM, np.int64(smax))
    v = np.full(DIM, PCA_VNORM, dtype=np.int64)
    w = sn @ v
    for _ in range(PCA_ITERS - 1):
        v = _trunc_div(w * PCA_VNORM, np.int64(np.abs(w).max()))
        w = sn @ v
    num, den = int(v @ w), int(v @ v)
    ray_ppm = int(round(num / den / PCA_SNORM * 1_000_000))
    out = pd.DataFrame({
        "dim_idx": np.arange(DIM, dtype=np.int64),
        "loading_q": _trunc_div(w * PCA_VNORM,
                                np.int64(np.abs(w).max())),
        "rayleigh_ppm": np.int64(ray_ppm)})
    return spark.createDataFrame(out).orderBy("dim_idx")


def _pca_oracle() -> str:
    """Machine-generated unrolled power iteration: the same integer
    steps as the driver-side numpy loop, as chained CTEs."""
    stages = []
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        stages.append(
            f"w{k} AS MATERIALIZED (SELECT s.i, CAST(SUM(s.sn * v.v) AS BIGINT) AS w\n"
            f"  FROM sn s JOIN {prev} v ON s.j = v.i GROUP BY s.i)")
        if k < PCA_ITERS:
            stages.append(
                f"m{k} AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w{k})")
            stages.append(
                f"v{k} AS MATERIALIZED (SELECT i, w * {PCA_VNORM} // m AS v\n"
                f"  FROM w{k} CROSS JOIN m{k})")
            prev = f"v{k}"
    K = PCA_ITERS
    chained = ",\n".join(stages)
    return f"""
WITH dims AS (
    SELECT UNNEST(range(1, {DIM} + 1)) AS k
), q AS MATERIALIZED (
    SELECT e.vec_id, d.k - 1 AS i,
           CAST(FLOOR(CAST(e.embedding[d.k] AS DOUBLE) * {Q_SCALE})
                AS BIGINT) AS qv
    FROM embeddings e CROSS JOIN dims d
), s AS MATERIALIZED (
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS s_ij
    FROM q a JOIN q b ON a.vec_id = b.vec_id
    GROUP BY a.i, b.i
), smax AS (SELECT MAX(ABS(s_ij)) AS m FROM s),
sn AS MATERIALIZED (
    SELECT i, j, s_ij * {PCA_SNORM} // m AS sn FROM s CROSS JOIN smax
), v0 AS (
    SELECT DISTINCT i, CAST({PCA_VNORM} AS BIGINT) AS v FROM sn
),
{chained},
ray AS (
    SELECT CAST(SUM(v.v * w.w) AS BIGINT) AS num,
           CAST(SUM(v.v * v.v) AS BIGINT) AS den
    FROM v{K - 1} v JOIN w{K} w ON v.i = w.i
), mw AS (SELECT MAX(ABS(w)) AS m FROM w{K})
SELECT CAST(w.i AS BIGINT) AS dim_idx,
       w.w * {PCA_VNORM} // mw.m AS loading_q,
       CAST(ROUND(CAST(num AS DOUBLE) / den / {PCA_SNORM} * 1000000)
            AS BIGINT) AS rayleigh_ppm
FROM w{K} w CROSS JOIN mw CROSS JOIN ray
ORDER BY dim_idx
"""


register("emb_pca_power", emb_pca_power, _pca_oracle(),
         "dominant principal direction via exact fixed-point power iteration")


# ------------------- top-k principal directions (deflated power loops)
PCA_TOPK = 3
PCA_TOPK_ITERS = 128  # flat fixture spectrum (gap ~0.985): at 64 the
#                       Rayleigh quotients of components 2/3 still come
#                       out INVERTED (simulated); 128 restores the
#                       monotone spectrum to ~3e-3 of numpy eigh.
#                       Vectors are tested by subspace mass, not
#                       per-direction angle (near-degenerate pairs)


def _tdiv_int(a: int, b: int) -> int:
    """Truncating division on plain Python ints (DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def emb_pca_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PCA_TOPK} principal directions (ROADMAP gap #6 /
    VERDICT r7 ask #6): chained power loops with SEQUENTIAL Gram-Schmidt
    projection against the already-found components inside every
    iteration — the numerically safe deflation (matrix deflation lets
    truncation residue along v1 regrow at (l1/l2)^iters). Same exact
    fixed-point discipline as emb_pca_power, but driver-side arithmetic
    is PURE PYTHON ints: the w*u1 dot times u1 projection products reach
    ~2^74, past int64, and numpy would wrap silently where the DuckDB
    HUGEINT oracle stays exact. The corpus work is identical (shared
    _collect_gram plan: one Arrow pass, d^2 bigint partials); everything
    after runs on the 64x64 model-size matrix. Emits per component the
    64 loadings (1/{PCA_VNORM} units) and the Rayleigh quotient of the
    final iterate on the UNdeflated normalized matrix (~eigenvalue k,
    ppm of PCA_SNORM)."""
    import pandas as pd

    rows = _collect_gram(spark, sf_dir)
    S = [[0] * DIM for _ in range(DIM)]
    for r in rows:
        S[r.i][r.j] = int(r.s_ij)
        S[r.j][r.i] = int(r.s_ij)
    smax = max(abs(S[i][j]) for i in range(DIM) for j in range(DIM))
    # same guard contract as emb_pca_power: the oracle's BIGINT sn
    # stage raises past this bound, so the engine must too
    if smax * PCA_SNORM >= 1 << 63:
        raise OverflowError(
            f"emb_pca_topk: max|S|={smax} * PCA_SNORM={PCA_SNORM} "
            "exceeds int64; reduce Q_SCALE for this corpus size")
    sn = [[_tdiv_int(S[i][j] * PCA_SNORM, smax) for j in range(DIM)]
          for i in range(DIM)]

    def matvec(v):
        return [sum(sn[i][j] * v[j] for j in range(DIM))
                for i in range(DIM)]

    comps = []          # (component, v, ray_ppm)
    prev = []           # (u, dot(u, u)) of found components
    for c in range(1, PCA_TOPK + 1):
        v = [PCA_VNORM] * DIM
        for _ in range(PCA_TOPK_ITERS):
            w = matvec(v)
            for u, du in prev:   # sequential projection, order fixed
                cc = sum(w[i] * u[i] for i in range(DIM))
                w = [w[i] - _tdiv_int(cc * u[i], du) for i in range(DIM)]
            m = max(abs(x) for x in w)
            v = [_tdiv_int(w[i] * PCA_VNORM, m) for i in range(DIM)]
        wr = matvec(v)           # Rayleigh on the undeflated matrix
        num = sum(v[i] * wr[i] for i in range(DIM))
        den = sum(v[i] * v[i] for i in range(DIM))
        comps.append((c, v, int(round(num / den / PCA_SNORM * 1_000_000))))
        prev.append((v, den))
    out = pd.DataFrame(
        [(c, i, v[i], ray) for c, v, ray in comps for i in range(DIM)],
        columns=["component", "dim_idx", "loading_q", "rayleigh_ppm"])
    return (spark.createDataFrame(out.astype("int64"))
            .orderBy("component", "dim_idx"))


def _pca_topk_oracle() -> str:
    """Recursive-CTE top-k deflated power iteration: ONE recursive CTE
    per component (it1..it3) carrying the 64-row iterate keyed by
    iteration index — matvec is an aggregation over the recursive
    reference (DuckDB allows it), the sequential Gram-Schmidt
    projections and the max-abs normalization are window aggregates
    over the step's derived rows. Replaces a ~1900-stage unrolled CTE
    chain that exceeded DuckDB's expression-depth limit. HUGEINT
    throughout (projection products pass int64)."""
    comps_sql = []
    finals = []
    for c in range(1, PCA_TOPK + 1):
        joins = "".join(
            f" JOIN vf{q} u{q}t ON w0.i = u{q}t.i CROSS JOIN df{q}"
            for q in range(1, c))
        ucols = "".join(f", u{q}t.v AS u{q}, df{q}.dd AS dd{q}"
                        for q in range(1, c))
        cur = (f"SELECT w0.k, w0.i, w0.w AS x0{ucols}\n"
               f"  FROM (SELECT v.k + 1 AS k, s.i,"
               f" CAST(SUM(s.sn * v.v) AS HUGEINT) AS w\n"
               f"        FROM sn s JOIN it{c} v ON s.j = v.i\n"
               f"        WHERE v.k < {PCA_TOPK_ITERS}"
               f" GROUP BY v.k, s.i) w0{joins}")
        for q in range(1, c):  # sequential projections, order fixed
            keep = "".join(f", u{r}, dd{r}" for r in range(q + 1, c))
            cur = (f"SELECT k, i, x{q - 1} - ((SUM(x{q - 1} * u{q})"
                   f" OVER (PARTITION BY k)) * u{q}) // dd{q}"
                   f" AS x{q}{keep}\n  FROM ({cur})")
        cur = (f"SELECT k, i, (x * {PCA_VNORM}) // mx AS v\n"
               f"    FROM (SELECT k, i, x{c - 1} AS x,"
               f" MAX(ABS(x{c - 1})) OVER (PARTITION BY k) AS mx"
               f"\n          FROM ({cur}))")
        comps_sql.append(
            f"it{c} AS (\n"
            f"    SELECT 0 AS k, i, CAST({PCA_VNORM} AS HUGEINT) AS v"
            f" FROM dims0\n"
            f"    UNION ALL\n"
            f"    {cur}\n"
            f"), vf{c} AS MATERIALIZED (\n"
            f"    SELECT i, v FROM it{c} WHERE k = {PCA_TOPK_ITERS}\n"
            f"), df{c} AS MATERIALIZED (\n"
            f"    SELECT CAST(SUM(v * v) AS HUGEINT) AS dd FROM vf{c}\n"
            f"), wr{c} AS MATERIALIZED (\n"
            f"    SELECT s.i, CAST(SUM(s.sn * v.v) AS HUGEINT) AS w\n"
            f"    FROM sn s JOIN vf{c} v ON s.j = v.i GROUP BY s.i\n"
            f"), ray{c} AS MATERIALIZED (\n"
            f"    SELECT CAST(SUM(v.v * w.w) AS HUGEINT) AS num\n"
            f"    FROM vf{c} v JOIN wr{c} w ON v.i = w.i)")
        finals.append(
            f"SELECT CAST({c} AS BIGINT) AS component,"
            f" CAST(v.i AS BIGINT) AS dim_idx,"
            f" CAST(v.v AS BIGINT) AS loading_q,\n"
            f"       CAST(ROUND(CAST(num AS DOUBLE) / CAST(dd AS DOUBLE)"
            f" / {PCA_SNORM} * 1000000) AS BIGINT) AS rayleigh_ppm\n"
            f"FROM vf{c} v CROSS JOIN ray{c} CROSS JOIN df{c}")
    chained = ",\n".join(comps_sql)
    body = "\nUNION ALL\n".join(finals)
    return f"""
WITH RECURSIVE dims AS (
    SELECT UNNEST(range(1, {DIM} + 1)) AS k
), dims0 AS (
    SELECT UNNEST(range(0, {DIM})) AS i
), q AS MATERIALIZED (
    SELECT e.vec_id, d.k - 1 AS i,
           CAST(FLOOR(CAST(e.embedding[d.k] AS DOUBLE) * {Q_SCALE})
                AS BIGINT) AS qv
    FROM embeddings e CROSS JOIN dims d
), s AS MATERIALIZED (
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS s_ij
    FROM q a JOIN q b ON a.vec_id = b.vec_id
    GROUP BY a.i, b.i
), smax AS (SELECT MAX(ABS(s_ij)) AS m FROM s),
sn AS MATERIALIZED (
    SELECT i, j, CAST(s_ij * {PCA_SNORM} // m AS HUGEINT) AS sn
    FROM s CROSS JOIN smax
),
{chained}
SELECT * FROM (
{body}
) ORDER BY component, dim_idx
"""


register("emb_pca_topk", emb_pca_topk, _pca_topk_oracle(),
         "top-3 principal directions via Gram-Schmidt-deflated power loops")
