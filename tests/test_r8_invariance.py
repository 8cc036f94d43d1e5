"""Round-8 determinism + scale invariants for the new/changed queries
(o22_hp_detrend_centi, emb_pca_topk, customer_pareto), same contracts
as the r5-r7 sweeps: hostile splits must not move a value, and K-fold
corpus replication must behave exactly as the integer arithmetic
predicts."""

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

K = 4
OFF = 10_000_000

R8_CASES = [
    "o22_hp_detrend_centi",   # exact fixed-point LDL' per user series
    "emb_pca_topk",           # deflated fixed-point power loops
    "customer_pareto",        # integer histogram deciles (r8 rewrite)
    # wave 2/3: integer-quantized kernels — hostile partitioning must
    # not move a value (nano/ppm quantization is order-free by design)
    "events_periodogram",
    "events_cvm_drift",
    "events_mutual_information",
    "text_bm25_topk",
    "unigram_crossentropy_split",
    "heaps_law_fit",
    "emb_centroid_outliers",
]


@pytest.mark.parametrize("name", R8_CASES)
def test_r8_partition_invariance(spark, sf_small, name):
    """Narrow scan partitions, prime shuffle width, small Arrow batches
    must not change a single output value."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    conf = [("spark.sql.files.maxPartitionBytes", "65536"),
            ("spark.sql.shuffle.partitions", "7"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "37")]
    old = {k: spark.conf.get(k) for k, _ in conf}
    try:
        for k, v in conf:
            spark.conf.set(k, v)
        skewed = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert base == skewed


@pytest.fixture(scope="module")
def sf_r8_inflated(spark, sf_small, tmp_path_factory):
    """K-fold replicas tailored to the r8 queries: events rows
    duplicate with shifted user/event ids (fresh users, identical
    series); embeddings duplicate with shifted vec_id (identical
    vectors). Other tables copy through."""
    out = str(tmp_path_factory.mktemp("sf_r8_inflated"))
    rep = F.explode(F.expr(f"sequence(0, {K - 1})")).alias("rep")

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    (ev.select("*", rep)
     .withColumn("event_id", F.col("event_id") + F.col("rep") * OFF)
     .withColumn("user_id", F.col("user_id") + F.col("rep") * OFF)
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))

    em = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    (em.select("*", rep)
     .withColumn("vec_id", F.col("vec_id") + F.col("rep") * OFF)
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents"]:
        (spark.read.parquet(f"{sf_small}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    return out


def test_hp_centi_replica_users_identical(spark, sf_small, sf_r8_inflated):
    """Each replica user carries the same value series in the same
    event_id order, so the exact integer HP cycle — and every moment
    sum — must be bit-identical across replicas, and the original
    users' rows must be untouched by the 4x corpus."""
    base = {r.user_id: (r.n, r.cyc_sum_centi, r.cyc_ssq_centi,
                        r.cyc_varnum)
            for r in _Q["o22_hp_detrend_centi"]
            .build(spark, sf_small).collect()}
    big = {r.user_id: (r.n, r.cyc_sum_centi, r.cyc_ssq_centi,
                       r.cyc_varnum)
           for r in _Q["o22_hp_detrend_centi"]
           .build(spark, sf_r8_inflated).collect()}
    assert len(big) == K * len(base)
    for uid, row in base.items():
        for rep in range(K):
            assert big[uid + rep * OFF] == row, (uid, rep)


def test_pca_topk_replication_exact_invariant(spark, sf_small,
                                              sf_r8_inflated):
    """K-fold replication scales S and max|S| by the same K, and
    trunc(K*a*SNORM / (K*m)) == trunc(a*SNORM / m) — the normalized
    matrix, hence every iterate, loading and Rayleigh quotient, is
    bit-identical. A hidden row-count dependence (int64 wrap, non-
    scaling division) would break this."""
    name = "emb_pca_topk"
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    big = sorted(map(tuple,
                     _Q[name].build(spark, sf_r8_inflated).collect()))
    assert base == big


def test_customer_pareto_shape(spark, sf_small):
    """Bin-granular deciles still partition the customers: counts sum
    to the customer total, revenue shares to ~100, deciles emitted in
    order with decile 1 the richest (highest mean revenue)."""
    rows = _Q["customer_pareto"].build(spark, sf_small).collect()
    deciles = [r.decile for r in rows]
    assert deciles == sorted(deciles) and deciles[0] == 1
    assert abs(sum(r.revenue_share_pct for r in rows) - 100.0) < 1e-3
    means = [r.revenue_cents / r.n_customers for r in rows]
    assert means[0] == max(means)
    assert means[0] > means[-1]
