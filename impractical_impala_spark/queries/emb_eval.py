"""Round-8 wave 3: embedding-space evaluation operators — the
diagnostics a training pipeline runs over its embedding table to find
mislabeled/outlier vectors, measure label separability, and compress
vectors for downstream indexing.

- Centroid outliers: distance of each vector to its OWN label centroid,
  normalized by the label's mean squared distance — the classic
  label-noise detector. Centroids come from micro-quantized integer
  sums (model-size: labels x dim), so distances are exact integer
  arithmetic up to one final sqrt; the DECIMAL(38)/HUGEINT square-sum
  accumulator is sized for the nano-scale products (1e20 per term —
  int64 would wrap on the FIRST row).
- kNN label purity: for the bounded query panel, the fraction of each
  query's 10 nearest cosine neighbors sharing its label — the
  leave-one-out sanity check behind "are these labels learnable". The
  panel is predicate-bounded (vec_id < N_QUERIES) and explicitly
  broadcast, the ann_cosine_topk discipline.
- PCA projection: every vector's coordinates along the top-3 principal
  directions from emb_pca_topk — the whitening/compression step that
  turns the spectrum into features. Loadings are a broadcast model-size
  table; scores are exact integer dot products in (Q_SCALE x PCA_VNORM)
  fixed point. The oracle splices emb_pca_topk's recursive-CTE oracle
  as a subquery, so both engines derive the loadings independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vecfold
from ..registry import register, oracle_sql_of
from ..sources import load_table
from .ml_more import DIM, Q_SCALE, PCA_VNORM, emb_pca_topk
from .monitor_eval import _ha_sql as _ha
from .monitor_eval import _ha_wide_sql as _haw
from .similarity import N_QUERIES, ann_cosine_topk

# ------------------------------------------------- centroid outliers
OUTLIER_TOP_K = 20
EMB_MICRO = 1_000_000


def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 label-noise suspects: squared distance to own label
    centroid over the label's mean squared distance. Components
    micro-quantize (floor(v*1e6)) so the per-(label,pos) centroid
    numerators are exact integer sums; the per-vector residual
    dv = v_micro*n - sum_micro stays integer (the n-scaled centroid
    avoids a division), and dv^2 accumulates as DECIMAL(38,0)/HUGEINT.
    Everything after the one fact explode is keyed on (label, pos) —
    model-size — or (vec_id) — one combine-friendly shuffle. Overflow
    ladder: |dv| <= 2e6 * n, so dv^2 <= 4e12 * n^2 needs the wide
    accumulator past n ~ 1e3 — DECIMAL(38) holds to n ~ 5e12 rows per
    label."""
    ex = (load_table(spark, sf_dir, "embeddings")
          .select("vec_id", "label",
                  F.posexplode("embedding").alias("pos", "v"))
          .select("vec_id", "label", "pos",
                  F.floor(F.col("v").cast("double") * EMB_MICRO)
                  .cast("long").alias("vm")))
    cent = ex.groupBy("label", "pos").agg(
        F.sum("vm").alias("sm"), F.count(F.lit(1)).alias("n"))
    d2 = (ex.join(F.broadcast(cent), ["label", "pos"])
          .withColumn("dv", F.col("vm") * F.col("n") - F.col("sm"))
          .groupBy("vec_id", "label")
          .agg(F.sum((F.col("dv").cast("decimal(38,0)")
                      * F.col("dv").cast("decimal(38,0)"))
                     .cast("decimal(38,0)")).alias("d2"),
               F.max("n").alias("n")))
    lbl = d2.groupBy("label").agg(
        F.sum("d2").cast("decimal(38,0)").alias("d2_tot"),
        F.count(F.lit(1)).alias("n_vecs"))
    ratio = ("cast(d2 as double) * n_vecs / cast(d2_tot as double)")
    dist = (f"sqrt(cast(d2 as double)) / ({EMB_MICRO}d * n)")
    return (d2.join(F.broadcast(lbl), "label")
            .select("vec_id", "label",
                    (F.round(F.expr(dist), 6) + 0.0).alias("dist"),
                    (F.round(F.expr(ratio), 6) + 0.0).alias("ratio"))
            .orderBy(F.col("ratio").desc(), "vec_id")
            .limit(OUTLIER_TOP_K))


register("emb_centroid_outliers", emb_centroid_outliers, f"""
WITH ex AS (
    SELECT vec_id, label,
           CAST(UNNEST(range(len(embedding))) AS BIGINT) AS pos,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * {EMB_MICRO})
                AS BIGINT) AS vm
    FROM embeddings
), cent AS (
    SELECT label, pos, CAST(SUM(vm) AS BIGINT) AS sm,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY label, pos
), d2 AS (
    SELECT vec_id, ex.label,
           SUM(CAST(ex.vm * c.n - c.sm AS HUGEINT)
               * (ex.vm * c.n - c.sm)) AS d2,
           MAX(c.n) AS n
    FROM ex JOIN cent c ON ex.label = c.label AND ex.pos = c.pos
    GROUP BY vec_id, ex.label
), lbl AS (
    SELECT label, SUM(d2) AS d2_tot, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM d2 GROUP BY label
)
SELECT vec_id, d2.label,
       ROUND(SQRT(CAST(d2 AS DOUBLE)) / ({EMB_MICRO} * CAST(n AS DOUBLE)),
             6) + 0.0 AS dist,
       ROUND(CAST(d2 AS DOUBLE) * n_vecs / CAST(d2_tot AS DOUBLE), 6)
           + 0.0 AS ratio
FROM d2 JOIN lbl USING (label)
ORDER BY ratio DESC, vec_id LIMIT {OUTLIER_TOP_K}
""", "label-noise suspects: distance-to-centroid ratio top-K")


# ------------------------------------------------- kNN label purity
KNN_K = 10


def emb_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label agreement of each panel vector's 10 nearest cosine
    neighbors — the leave-one-out "are these labels learnable" check.
    Same bounded-panel discipline as ann_cosine_topk: the vec_id <
    N_QUERIES panel is predicate-bounded at any corpus size and
    explicitly broadcast (the estimator cannot see the predicate's
    selectivity and would pick the corpus side)."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", "label",
                   F.expr("transform(embedding, x -> cast(x as double))")
                   .alias("v"))
           .withColumn("norm", F.expr(
               f"sqrt({vecfold.self_dot('v', DIM)})")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = emb.alias("c")
    # unrolled codegen dot — bit-identical to the zip_with fold it
    # replaces (vecfold module docstring has the op-order argument)
    dot = F.expr(vecfold.dot("q.v", "c.v", DIM))
    pairs = F.broadcast(q).join(
        c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.label").alias("label"),
        F.col("c.label").alias("n_label"),
        (dot / (F.col("q.norm") * F.col("c.norm"))).alias("cos"),
        F.col("c.vec_id").alias("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id")
    top = (pairs.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= KNN_K))
    return (top.groupBy("query_id", "label")
            .agg(F.sum(F.expr("CASE WHEN n_label = label THEN 1 ELSE 0 END"))
                 .alias("n_match"))
            .select("query_id", "label", "n_match",
                    (F.round(F.col("n_match") / F.lit(float(KNN_K)), 4)
                     + 0.0).alias("purity"))
            .orderBy("query_id"))


register("emb_knn_label_purity", emb_knn_label_purity, f"""
WITH emb AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), pairs AS (
    SELECT q.vec_id AS query_id, q.label AS label,
           c.label AS n_label, c.vec_id AS neighbor_id,
           list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(c.v, c.v))) AS cos
    FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rn
    FROM pairs
)
SELECT query_id, label,
       CAST(SUM(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match,
       ROUND(SUM(CASE WHEN n_label = label THEN 1 ELSE 0 END)
             / {float(KNN_K)}, 4) + 0.0 AS purity
FROM ranked WHERE rn <= {KNN_K}
GROUP BY query_id, label ORDER BY query_id
""", "kNN label purity of the bounded query panel (k=10)")


# --------------------------------------------------- PCA projection
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's coordinates along the top-3 principal directions
    (emb_pca_topk's loadings): the compression/whitening features for
    downstream indexing. The loadings are a 192-row broadcast table;
    each score is an exact integer dot product of the Q_SCALE-quantized
    vector with the PCA_VNORM-scale loading (|term| <= Q_SCALE *
    PCA_VNORM ~ 2^24, x64 dims — int64 with 2^35 headroom), plus one
    rounded float in natural units. One fact explode, one combine-
    friendly (vec_id, component) aggregate — no extra corpus pass
    beyond the Gram collection emb_pca_topk already does."""
    comps = emb_pca_topk(spark, sf_dir).select(
        "component", F.col("dim_idx").alias("pos"), "loading_q")
    ex = (load_table(spark, sf_dir, "embeddings")
          .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
          .select("vec_id", "pos",
                  F.floor(F.col("v").cast("double") * Q_SCALE)
                  .cast("long").alias("xq")))
    scores = (ex.join(F.broadcast(comps), "pos")
              .groupBy("vec_id", "component")
              .agg(F.sum(F.col("xq") * F.col("loading_q"))
                   .alias("score_raw")))
    return (scores.select(
        "vec_id", "component", "score_raw",
        (F.round(F.col("score_raw")
                 / F.lit(float(Q_SCALE * PCA_VNORM)), 6) + 0.0)
        .alias("score"))
        .orderBy("vec_id", "component"))


register("emb_pca_project", emb_pca_project, f"""
WITH comp AS (
    {oracle_sql_of("emb_pca_topk")}
), ex AS (
    SELECT vec_id,
           CAST(UNNEST(range(len(embedding))) AS BIGINT) AS pos,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * {Q_SCALE})
                AS BIGINT) AS xq
    FROM embeddings
)
SELECT vec_id, comp.component,
       CAST(SUM(xq * comp.loading_q) AS BIGINT) AS score_raw,
       ROUND(SUM(xq * comp.loading_q)
             / CAST({Q_SCALE * PCA_VNORM} AS DOUBLE), 6) + 0.0 AS score
FROM ex JOIN comp ON ex.pos = comp.dim_idx
GROUP BY vec_id, comp.component
ORDER BY vec_id, comp.component
""", "top-3 PCA coordinates per vector (exact fixed-point dot products)")


# ------------------------------------- Matryoshka truncation audit
MRL_DIMS = (16, 32)   # prefix truncations audited against full DIM
MRL_K = 5


def emb_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: how much of the exact cosine
    top-{MRL_K} survives when vectors are truncated to their first
    16 / 32 dimensions — the retrieval-quality check behind
    MRL-style tiered serving (coarse search on the prefix, rerank on
    the full vector). One panel-broadcast pass computes the full and
    truncated cosines together (index-ordered folds over list
    slices); per truncation the audit reports mean top-k overlap and
    top-1 agreement across the query panel. Model-size output."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("db_id"), F.col("v").alias("cv"))

    def cos(d: int | None) -> str:
        # unrolled over the prefix directly: slice(qv, 1, d)[i] ==
        # qv[i] for i < d, so indexing the full array to depth d is
        # term-for-term the fold over the slice (same op order)
        n = DIM if d is None else d
        dot = vecfold.dot("qv", "cv", n)
        nq = f"sqrt({vecfold.self_dot('qv', n)})"
        nc = f"sqrt({vecfold.self_dot('cv', n)})"
        return f"({dot}) / (({nq}) * ({nc}))"

    pairs = F.broadcast(q).crossJoin(c).select(
        "query_id", "db_id",
        F.expr(cos(None)).alias("cos_full"),
        *[F.expr(cos(d)).alias(f"cos_{d}") for d in MRL_DIMS])
    ranked = pairs
    for name in ["full", *[str(d) for d in MRL_DIMS]]:
        w = Window.partitionBy("query_id").orderBy(
            F.col(f"cos_{name}").desc(), "db_id")
        ranked = ranked.withColumn(f"r_{name}", F.row_number().over(w))
    out = None
    for d in MRL_DIMS:
        per_q = (ranked
                 .groupBy("query_id")
                 .agg(F.sum(F.expr(
                     f"cast(r_full <= {MRL_K} and r_{d} <= {MRL_K}"
                     " as int)")).alias("ov"),
                     F.max(F.expr(
                         f"cast(r_full = 1 and r_{d} = 1 as int)"))
                     .alias("t1")))
        summ = per_q.agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("ov").alias("overlap_sum"),
            F.sum("t1").alias("top1_matches")).select(
            F.lit(d).alias("dim"), "n_queries",
            F.expr(f"overlap_sum * 1000000 div (n_queries * {MRL_K})")
            .alias("overlap_ppm"),
            "top1_matches")
        out = summ if out is None else out.unionByName(summ)
    return out.orderBy("dim")


def _mrl_oracle() -> str:
    def cos(d):
        if d is None:
            qs, cs = "q.qv", "c.cv"
        else:
            qs, cs = f"list_slice(q.qv, 1, {d})", f"list_slice(c.cv, 1, {d})"
        return (f"list_dot_product({qs}, {cs})"
                f" / (sqrt(list_dot_product({qs}, {qs}))"
                f" * sqrt(list_dot_product({cs}, {cs})))")
    cos_cols = ", ".join(
        [f"{cos(None)} AS cos_full"]
        + [f"{cos(d)} AS cos_{d}" for d in MRL_DIMS])
    rank_cols = ", ".join(
        f"ROW_NUMBER() OVER (PARTITION BY query_id"
        f" ORDER BY cos_{n} DESC, db_id) AS r_{n}"
        for n in ["full", *[str(d) for d in MRL_DIMS]])
    parts = []
    for d in MRL_DIMS:
        parts.append(f"""
SELECT {d} AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(ov) * 1000000 // (COUNT(*) * {MRL_K}) AS BIGINT)
           AS overlap_ppm,
       CAST(SUM(t1) AS BIGINT) AS top1_matches
FROM (SELECT query_id,
             SUM(CASE WHEN r_full <= {MRL_K} AND r_{d} <= {MRL_K}
                      THEN 1 ELSE 0 END) AS ov,
             MAX(CASE WHEN r_full = 1 AND r_{d} = 1
                      THEN 1 ELSE 0 END) AS t1
      FROM ranked GROUP BY query_id)""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS db_id, {cos_cols}
    FROM (SELECT vec_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN (SELECT vec_id, v AS cv FROM emb
                WHERE vec_id >= {N_QUERIES}) c
), ranked AS (
    SELECT query_id, db_id, {rank_cols} FROM pairs
)
{union}
ORDER BY dim
"""


register("emb_matryoshka_audit", emb_matryoshka_audit, _mrl_oracle(),
         "Matryoshka prefix-truncation retrieval-quality audit")


# --------------------------------------- binary-sign quantization
BSQ_K = 5


def emb_binary_sign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit (sign) quantization audit: rank the corpus for each
    panel query by HAMMING distance between sign vectors (64 dims ->
    64 bits, a 256x storage cut and an XOR-popcount scan at serve
    time) and report, per query, how much of the exact cosine
    top-{BSQ_K} the binary ranking preserves. Hamming distances are
    pure integer counts (no float anywhere in the quantized path);
    the exact baseline reuses the brute-force panel join. Per-query
    rows keep the audit model-size."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("db_id"), F.col("v").alias("cv"))
    dot = vecfold.dot("qv", "cv", DIM)
    nq = f"sqrt({vecfold.self_dot('qv', DIM)})"
    nc = f"sqrt({vecfold.self_dot('cv', DIM)})"
    ham = vecfold.sign_mismatch("qv", "cv", DIM)
    pairs = F.broadcast(q).crossJoin(c).select(
        "query_id", "db_id",
        F.expr(f"({dot}) / (({nq}) * ({nc}))").alias("cos"),
        F.expr(ham).alias("hamming"))
    wc = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                                "db_id")
    wh = Window.partitionBy("query_id").orderBy("hamming", "db_id")
    ranked = (pairs.withColumn("r_cos", F.row_number().over(wc))
              .withColumn("r_ham", F.row_number().over(wh)))
    return (ranked.groupBy("query_id")
            .agg(F.sum(F.expr(
                f"cast(r_cos <= {BSQ_K} and r_ham <= {BSQ_K} as int)"))
                .alias("n_overlap"),
                F.max(F.expr("cast(r_cos = 1 and r_ham = 1 as int)"))
                .alias("top1_match"),
                F.sum(F.expr(
                    f"case when r_cos <= {BSQ_K} then hamming end"))
                .alias("true_topk_hamming"))
            .orderBy("query_id"))


register("emb_binary_sign_audit", emb_binary_sign_audit, f"""
WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS db_id,
           list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(c.v, c.v))) AS cos,
           CAST(list_sum(list_transform(range(1, len(q.v) + 1),
                i -> CASE WHEN (q.v[i] > 0) <> (c.v[i] > 0)
                          THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
    FROM (SELECT * FROM emb WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN (SELECT * FROM emb WHERE vec_id >= {N_QUERIES}) c
), ranked AS (
    SELECT query_id, db_id, hamming,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, db_id) AS r_cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY hamming, db_id) AS r_ham
    FROM pairs
)
SELECT query_id,
       CAST(SUM(CASE WHEN r_cos <= {BSQ_K} AND r_ham <= {BSQ_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CAST(MAX(CASE WHEN r_cos = 1 AND r_ham = 1
                     THEN 1 ELSE 0 END) AS INT) AS top1_match,
       CAST(SUM(CASE WHEN r_cos <= {BSQ_K} THEN hamming END) AS BIGINT)
           AS true_topk_hamming
FROM ranked GROUP BY query_id ORDER BY query_id
""", "1-bit sign-quantization retrieval audit (integer hamming scan)")


# ------------------------------------------- participation ratio
def emb_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio of the embedding covariance spectrum —
    PR = (tr C)^2 / ||C||_F^2 = (sum lambda)^2 / sum lambda^2 — the
    effective dimensionality ("how many directions actually carry
    variance") WITHOUT an eigendecomposition: trace and Frobenius
    norm come straight from the scatter matrix. With the Q_SCALE
    integer quantization and A_ij = n*S_ij - S_i*S_j (the scatter
    scaled by n, exact int64 to ~2e14 per entry), the 1/n factors
    cancel: PR = (sum_i A_ii)^2 / sum_ij A_ij^2 exactly, ridden
    through DECIMAL(19)^2 -> 38 (sum_ij A^2 <= d^2 * 4e28 ~ 2e32 at
    sf0.1 — 1e38 headroom to ~30x the corpus). Gram partials are the
    emb_covariance mapInPandas kernel: d(d+1)/2 integer cells cross
    the shuffle, never corpus rows. Anisotropy gate for embedding
    health: PR/d near 1 = isotropic, near 0 = collapsed."""
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
    xq = F.floor(F.col("x").cast("double") * Q_SCALE).cast("long")
    stats = (emb.select(F.posexplode("embedding").alias("i", "x"))
             .groupBy("i")
             .agg(F.sum(xq).alias("s"), F.count(F.lit(1)).alias("n")))
    sa = stats.select("i", F.col("s").alias("s_i"), "n")
    sb = stats.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    cells = (gram.join(F.broadcast(sa), "i").join(F.broadcast(sb), "j")
             .select("i", "j", "n",
                     F.expr("n * s_ij - s_i * s_j").alias("a")))
    agg = cells.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("case when i = j then a else 0 end")).alias("tr_a"),
        # off-diagonal cells count twice in the full Frobenius sum
        F.sum(F.expr("cast(a as decimal(19,0)) * cast(a as decimal(19,0))"
                     " * case when i = j then 1 else 2 end")).alias("fro"))
    pr = ("(cast(cast(tr_a as decimal(19,0))"
          " * cast(tr_a as decimal(19,0)) as double)"
          " / cast(fro as double))")
    return agg.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.lit(DIM).cast("int").alias("dim"),
        F.expr(_ha(f"({pr}) * 1e6")).alias("pr_micro"),
        F.expr(_ha(f"({pr}) * 1e6 / {DIM}")).alias("pr_over_d_ppm"))


register("emb_participation_ratio", emb_participation_ratio, f"""
WITH idx AS (
    SELECT UNNEST(range(1, {DIM} + 1)) AS k
), ex AS (
    SELECT vec_id, k - 1 AS i,
           CAST(FLOOR(CAST(embedding[k] AS DOUBLE) * {Q_SCALE}) AS BIGINT)
               AS xq
    FROM embeddings CROSS JOIN idx
), gram AS (
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.xq * b.xq) AS BIGINT) AS s_ij
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
), stats AS (
    SELECT i, CAST(SUM(xq) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY i
), cells AS (
    SELECT g.i, g.j, sa.n, g.s_ij * sa.n - sa.s * sb.s AS a
    FROM gram g JOIN stats sa ON g.i = sa.i JOIN stats sb ON g.j = sb.i
), agg AS (
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN i = j THEN a ELSE 0 END) AS BIGINT) AS tr_a,
           SUM(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)
               * CASE WHEN i = j THEN 1 ELSE 2 END) AS fro
    FROM cells
)
SELECT n AS n_vectors, CAST({DIM} AS INT) AS dim,
       {_ha("(CAST(CAST(tr_a AS HUGEINT) * CAST(tr_a AS HUGEINT)"
            " AS DOUBLE) / CAST(fro AS DOUBLE)) * 1e6")} AS pr_micro,
       {_ha("(CAST(CAST(tr_a AS HUGEINT) * CAST(tr_a AS HUGEINT)"
            f" AS DOUBLE) / CAST(fro AS DOUBLE)) * 1e6 / {DIM}")}
           AS pr_over_d_ppm
FROM agg
""", "participation ratio (effective dim) from the integer scatter")


# ------------------------------------------------- hubness audit
def emb_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the exact cosine top-k lists: the k-occurrence
    count c(v) = how many panel queries list v among their TOP_K
    neighbors, summarized by its exact integer moments — skewness of
    c is THE standard hubness diagnostic (high skew = a few hub
    vectors dominate every neighbor list; retrieval quality rots).
    Composes ann_cosine_topk unchanged; every corpus vector joins in
    with c = 0 (antihubs count). Moment sums (sum c, c^2, c^3) are
    exact integers — c <= n_queries*k, so c^3 stays tiny at any
    corpus size — and skewness is one float evaluation, micro-
    quantized with shared half-away rounding."""
    occ = (ann_cosine_topk(spark, sf_dir)
           .groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("c")))
    corpus = load_table(spark, sf_dir, "embeddings").select("vec_id")
    per_vec = (corpus.join(occ, corpus.vec_id == occ.neighbor_id, "left")
               .select(F.coalesce("c", F.lit(0)).alias("c")))
    agg = per_vec.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
        F.sum(F.expr("c * c * c")).alias("s3"),
        F.max("c").alias("max_occ"),
        F.sum(F.expr("cast(c = 0 as int)")).alias("n_zero"))
    mean = "(cast(s1 as double) / n)"
    m2 = f"(cast(s2 as double) / n - {mean} * {mean})"
    m3 = (f"(cast(s3 as double) / n - 3.0 * {mean}"
          f" * (cast(s2 as double) / n) + 2.0 * {mean} * {mean} * {mean})")
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    return agg.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.col("s1").cast("long").alias("total_occ"),
        F.col("max_occ").cast("long").alias("max_occ"),
        F.col("n_zero").cast("long").alias("n_antihubs"),
        F.expr(_ha(f"({skew}) * 1e6")).alias("skew_micro"))


_HUB_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_HUB_M2 = f"(CAST(s2 AS DOUBLE) / n - {_HUB_MEAN} * {_HUB_MEAN})"
_HUB_M3 = (f"(CAST(s3 AS DOUBLE) / n - 3.0 * {_HUB_MEAN}"
           f" * (CAST(s2 AS DOUBLE) / n)"
           f" + 2.0 * {_HUB_MEAN} * {_HUB_MEAN} * {_HUB_MEAN})")
_HUB_SKEW = f"({_HUB_M3} / SQRT({_HUB_M2} * {_HUB_M2} * {_HUB_M2}))"

register("emb_hubness_audit", emb_hubness_audit, f"""
WITH topk AS (SELECT * FROM ({oracle_sql_of("ann_cosine_topk")}) t0),
occ AS (
    SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS c
    FROM topk GROUP BY 1
), per_vec AS (
    SELECT COALESCE(occ.c, 0) AS c
    FROM embeddings e LEFT JOIN occ ON e.vec_id = occ.neighbor_id
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1,
           CAST(SUM(c * c) AS BIGINT) AS s2,
           CAST(SUM(c * c * c) AS BIGINT) AS s3,
           CAST(MAX(c) AS BIGINT) AS max_occ,
           CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero
    FROM per_vec
)
SELECT n AS n_vectors, s1 AS total_occ, max_occ, n_zero AS n_antihubs,
       {_ha(f"({_HUB_SKEW}) * 1e6")} AS skew_micro
FROM agg
""", "k-occurrence hubness skewness over the exact top-k lists")


# ---------------------------------------------- Fisher ratio per dim
FISHER_TOPK = 10


def emb_fisher_ratio_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Fisher discriminant ratio of the labeled
    embedding corpus — which coordinates actually separate the
    labels (the feature-selection view that complements
    emb_knn_label_purity's holistic answer): F_d = MSB_d / MSW_d,
    the one-way ANOVA F of dimension d across labels. Sufficient
    statistics are exact integers in Q_SCALE fixed point off one
    posexplode (labels x dim cells); each (label, dim) between-term
    is half-away-quantized to milli BEFORE the cross-label sum (the
    events_anova_f discipline), so every reduction is order-free
    integer arithmetic. Output: the FISHER_TOPK most discriminative
    dimensions by (f desc, dim) — a TakeOrdered on the 64-row frame."""
    ex = (load_table(spark, sf_dir, "embeddings")
          .select("label", F.posexplode("embedding").alias("i", "x"))
          .select("label", "i",
                  F.floor(F.col("x").cast("double") * Q_SCALE)
                  .cast("long").alias("xq")))
    per = ex.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xq").alias("s"),
        F.sum(F.expr("xq * xq")).alias("q"))
    suff = per.select(
        "i", "n", "s", "q",
        F.expr(_haw("cast(s as double) * cast(s as double) * 1e3 / n"))
        .alias("t_milli"))
    agg = suff.groupBy("i").agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("nn"),
        F.sum("s").alias("ss"), F.sum("q").alias("qq"),
        F.sum("t_milli").alias("b_milli"))
    ha_tot = _haw("cast(ss as double) * cast(ss as double) * 1e3 / nn")
    ssb = f"(b_milli - {ha_tot})"
    ssw = "(cast(qq as decimal(38,0)) * 1000 - b_milli)"
    f_stat = (f"((cast({ssb} as double) / (k - 1))"
              f" / (cast({ssw} as double) / (nn - k)))")
    eta2 = (f"(cast({ssb} as double)"
            f" / (cast({ssb} as double) + cast({ssw} as double)))")
    return (agg.select(
        F.col("i").cast("int").alias("dim"),
        F.col("k").cast("int").alias("k_labels"),
        F.expr(_ha(f"({f_stat}) * 1e6")).alias("f_micro"),
        F.expr(_ha(f"({eta2}) * 1e6")).alias("eta2_ppm"))
        .orderBy(F.desc("f_micro"), "dim").limit(FISHER_TOPK))


_FR_HA_TOT = _haw("CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) * 1e3 / nn",
                  "HUGEINT")
_FR_SSB = f"(b_milli - {_FR_HA_TOT})"
_FR_SSW = "(CAST(qq AS HUGEINT) * 1000 - b_milli)"
_FR_F = (f"((CAST({_FR_SSB} AS DOUBLE) / (k - 1))"
         f" / (CAST({_FR_SSW} AS DOUBLE) / (nn - k)))")
_FR_ETA = (f"(CAST({_FR_SSB} AS DOUBLE)"
           f" / (CAST({_FR_SSB} AS DOUBLE) + CAST({_FR_SSW} AS DOUBLE)))")

register("emb_fisher_ratio_dims", emb_fisher_ratio_dims, f"""
WITH ex AS (
    SELECT label, k - 1 AS i,
           CAST(FLOOR(CAST(embedding[k] AS DOUBLE) * {Q_SCALE}) AS BIGINT)
               AS xq
    FROM embeddings
    CROSS JOIN (SELECT UNNEST(range(1, {DIM} + 1)) AS k)
), per AS (
    SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xq) AS BIGINT) AS s,
           CAST(SUM(xq * xq) AS BIGINT) AS q
    FROM ex GROUP BY 1, 2
), suff AS (
    SELECT i, n, s, q,
           {_haw("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                 "HUGEINT")}
               AS t_milli
    FROM per
), agg AS (
    SELECT i, CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff GROUP BY i
)
SELECT CAST(i AS INT) AS dim, CAST(k AS INT) AS k_labels,
       {_ha(f"({_FR_F}) * 1e6")} AS f_micro,
       {_ha(f"({_FR_ETA}) * 1e6")} AS eta2_ppm
FROM agg
ORDER BY f_micro DESC, dim LIMIT {FISHER_TOPK}
""", "top-10 label-discriminative embedding dims by ANOVA Fisher ratio")


# --------------------------------------------- JL projection audit
RP_K = 16  # projected dimensions


def emb_random_projection_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit: project the bounded
    query panel through a deterministic ±1 sign matrix (md5 parity of
    (j, d) — no RNG state, identical in both engines) down to RP_K
    dims and measure, for every panel pair, the ratio of projected to
    original squared distance (E[ratio] = 1 for ±1 projections) —
    the empirical answer to "how low can we project before distances
    lie", which sizes every sketch built on random projections. All
    arithmetic is exact integers in Q_SCALE fixed point: original
    distances from zip_with folds, projections from an exploded
    (vec, j, d) frame (panel x RP_K x DIM cells — model-size), ratios
    quantized per pair then integer-aggregated. Output: one row of
    distortion moments over the panel pairs."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < N_QUERIES)
           .select("vec_id",
                   F.expr(f"transform(embedding, x -> cast(floor("
                          f"cast(x as double) * {Q_SCALE}) as bigint))")
                   .alias("xq")))
    sign = ("case when pmod(cast(conv(substring(md5(concat("
            "cast(j as string), '_', cast(d as string))), 1, 7),"
            " 16, 10) as bigint), 2) = 0 then 1 else -1 end")
    proj = (emb
            .select("vec_id", F.posexplode("xq").alias("d", "v"))
            .withColumn("j", F.explode(F.expr(
                f"sequence(0, {RP_K - 1})")))
            .withColumn("sgn", F.expr(sign))
            .groupBy("vec_id", "j")
            .agg(F.sum(F.expr("sgn * v")).alias("s")))
    pa = proj.select(F.col("vec_id").alias("a"), "j",
                     F.col("s").alias("sa"))
    pb = proj.select(F.col("vec_id").alias("b"), "j",
                     F.col("s").alias("sb"))
    pd2 = (pa.join(pb, ["j"]).filter(F.col("a") < F.col("b"))
           .groupBy("a", "b")
           .agg(F.sum(F.expr("(sa - sb) * (sa - sb)")).alias("p2")))
    ea = emb.select(F.col("vec_id").alias("a"), F.col("xq").alias("xa"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("xq").alias("xb"))
    od2 = (F.broadcast(ea).join(eb, F.col("a") < F.col("b"))
           .select("a", "b", F.expr(
               vecfold.sq_dist("xa", "xb", DIM, zero=vecfold.L_ZERO))
               .alias("o2")))
    ratio = f"(cast(p2 as double) / {RP_K} / cast(o2 as double))"
    pairs = (pd2.join(od2, ["a", "b"])
             .select(F.expr(_ha(f"({ratio}) * 1e6")).alias("r_ppm")))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(r_ppm) div count(1)").alias("mean_distortion_ppm"),
        F.min("r_ppm").alias("min_distortion_ppm"),
        F.max("r_ppm").alias("max_distortion_ppm"))


_RP_SIGN = ("CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR)"
            " || '_' || CAST(d AS VARCHAR)), 1, 7)) AS BIGINT) % 2 = 0"
            " THEN 1 ELSE -1 END")

register("emb_random_projection_audit", emb_random_projection_audit, f"""
WITH emb AS (
    SELECT vec_id,
           list_transform(embedding, x ->
               CAST(FLOOR(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT))
               AS xq
    FROM embeddings WHERE vec_id < {N_QUERIES}
), ex AS (
    SELECT vec_id, d - 1 AS d, xq[d] AS v
    FROM emb, UNNEST(range(1, {DIM} + 1)) AS t(d)
), proj AS (
    SELECT vec_id, j.j, CAST(SUM(({_RP_SIGN}) * v) AS BIGINT) AS s
    FROM ex, (SELECT UNNEST(range(0, {RP_K})) AS j) j
    GROUP BY 1, 2
), pd2 AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(SUM((a.s - b.s) * (a.s - b.s)) AS BIGINT) AS p2
    FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
    GROUP BY 1, 2
), od2 AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(list_sum(list_transform(
               list_zip(a.xq, b.xq),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS o2
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
), pairs AS (
    SELECT {_ha(f"(CAST(p2 AS DOUBLE) / {RP_K}"
                " / CAST(o2 AS DOUBLE)) * 1e6")} AS r_ppm
    FROM pd2 JOIN od2 USING (a, b)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(r_ppm) // COUNT(*) AS BIGINT) AS mean_distortion_ppm,
       CAST(MIN(r_ppm) AS BIGINT) AS min_distortion_ppm,
       CAST(MAX(r_ppm) AS BIGINT) AS max_distortion_ppm
FROM pairs
""", "JL distortion audit: md5-sign projection to 16 dims, exact ratios")


# --------------------------------------------- centroid drift
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between the first and
    second half of the corpus (vec_id midpoint split — the batch-
    order proxy for ingestion time): the cosine between the two
    half-centroids and the relative L2 shift — the embedding-space
    monitor that catches a re-encoded or contaminated refresh before
    a retrieval index rebuild ships. Half-centroid sums are exact
    Q_SCALE integers per (label, half, dim); the cosine evaluates on
    the n-scaled integer vectors (the division by counts cancels),
    dims folding in fixed index order. Everything after one explode
    is (labels x dims)-sized."""
    rng = (load_table(spark, sf_dir, "embeddings")
           .agg(F.expr("(min(vec_id) + max(vec_id)) div 2").alias("mid")))
    ex = (load_table(spark, sf_dir, "embeddings")
          .crossJoin(F.broadcast(rng))
          .select("label",
                  F.expr("cast(vec_id <= mid as int)").alias("h"),
                  F.posexplode("embedding").alias("d", "x"))
          .select("label", "h", "d",
                  F.floor(F.col("x").cast("double") * Q_SCALE)
                  .cast("long").alias("xq")))
    cent = ex.groupBy("label", "h", "d").agg(
        F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n"))
    a = (cent.filter(F.col("h") == 1)
         .select("label", "d", F.col("s").alias("sa"),
                 F.col("n").alias("na")))
    b = (cent.filter(F.col("h") == 0)
         .select("label", "d", F.col("s").alias("sb"),
                 F.col("n").alias("nb")))
    per_dim = (a.join(b, ["label", "d"])
               .groupBy("label").agg(
                   F.max("na").alias("n_early"),
                   F.max("nb").alias("n_late"),
                   F.sum(F.expr("cast(sa as decimal(19,0))"
                                " * cast(sb as decimal(19,0))"))
                   .alias("dot"),
                   F.sum(F.expr("cast(sa as decimal(19,0))"
                                " * cast(sa as decimal(19,0))"))
                   .alias("naa"),
                   F.sum(F.expr("cast(sb as decimal(19,0))"
                                " * cast(sb as decimal(19,0))"))
                   .alias("nbb")))
    cos = ("(cast(dot as double)"
           " / (sqrt(cast(naa as double)) * sqrt(cast(nbb as double))))")
    return (per_dim.select(
        "label",
        F.col("n_early").cast("long").alias("n_early"),
        F.col("n_late").cast("long").alias("n_late"),
        F.expr(_ha(f"({cos}) * 1e6")).alias("centroid_cos_ppm"))
        .withColumn("drifted", F.expr(
            "cast(centroid_cos_ppm < 950000 as int)"))
        .orderBy("label"))


_CD_COS = ("(CAST(dot AS DOUBLE)"
           " / (SQRT(CAST(naa AS DOUBLE)) * SQRT(CAST(nbb AS DOUBLE))))")

register("emb_centroid_drift", emb_centroid_drift, f"""
WITH rng AS (
    SELECT (MIN(vec_id) + MAX(vec_id)) // 2 AS mid FROM embeddings
), ex AS (
    SELECT label,
           CASE WHEN vec_id <= rng.mid THEN 1 ELSE 0 END AS h,
           d - 1 AS d,
           CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * {Q_SCALE})
                AS BIGINT) AS xq
    FROM embeddings CROSS JOIN rng,
         UNNEST(range(1, {DIM} + 1)) AS t(d)
), cent AS (
    SELECT label, h, d, CAST(SUM(xq) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY 1, 2, 3
), per_dim AS (
    SELECT a.label,
           MAX(a.n) AS n_early, MAX(b.n) AS n_late,
           SUM(CAST(a.s AS HUGEINT) * b.s) AS dot,
           SUM(CAST(a.s AS HUGEINT) * a.s) AS naa,
           SUM(CAST(b.s AS HUGEINT) * b.s) AS nbb
    FROM (SELECT * FROM cent WHERE h = 1) a
    JOIN (SELECT * FROM cent WHERE h = 0) b
      ON a.label = b.label AND a.d = b.d
    GROUP BY 1
)
SELECT label, CAST(n_early AS BIGINT) AS n_early,
       CAST(n_late AS BIGINT) AS n_late,
       {_ha(f"({_CD_COS}) * 1e6")} AS centroid_cos_ppm,
       CAST({_ha(f"({_CD_COS}) * 1e6")} < 950000 AS INT) AS drifted
FROM per_dim ORDER BY label
""", "per-label half-corpus centroid cosine drift (fixed-point exact)")
