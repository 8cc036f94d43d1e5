"""Modern Spark 4 SQL surface: VARIANT semi-structured extraction,
LATERAL correlated subqueries, recursive CTEs, and Python UDTFs.

These are the engine capabilities a user migrating from a warehouse
expects to exist, each proven against the same DuckDB hash gate:

- VARIANT (`parse_json` → `variant_get`): the binary semi-structured
  type — at 100 TB this replaces per-query string JSON parsing with a
  parse-once columnar encoding (same plan downstream, ~order-of-
  magnitude less repeated parse work than get_json_object chains).
- LATERAL: per-row correlated subqueries (top-N per key in its
  declarative form). Catalyst rewrites the lateral into a join, so it
  scales like the join it becomes, not like a per-row loop.
- Recursive CTE (Spark 4, UNION ALL form): the walk here is LINEAR —
  each (user, streak-start, day) row has at most one successor — so
  row count is bounded by total active days and the recursion
  terminates without distinct-dedup (which recursive CTEs don't
  support yet).
- Python UDTF: the 1-row-in/N-rows-out table function registered into
  SQL and invoked via LATERAL — the sanctioned escape hatch when the
  fan-out logic is genuinely Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


# --------------------------------------------------------- VARIANT
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate as json_extract_props but through the VARIANT
    type: parse_json once, variant_get typed extraction — the
    parse-once columnar path for semi-structured data."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("k").alias("n"),
             F.sum("k").cast("bigint").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
        .orderBy("event_type")
    )


register("json_variant_extract", json_variant_extract, """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS INT)) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""", "VARIANT (parse_json + variant_get) semi-structured aggregation")


# --------------------------------------------------------- LATERAL
LAT_MOD = 101
LAT_TOP = 2


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per sampled customer via a correlated LATERAL
    subquery — the declarative top-N-per-key form. Catalyst plans the
    lateral as a join + per-key limit, so it scales as a join, and the
    (price DESC, orderkey) ordering makes the cut deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_ord")
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey,
               ROUND(t.o_totalprice, 4) AS o_totalprice
        FROM (SELECT c_custkey FROM lat_cust
              WHERE c_custkey % {LAT_MOD} = 0) c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lat_ord o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT {LAT_TOP}) t
        ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
    """)


register("q_lateral_topn", q_lateral_topn, f"""
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 4) AS o_totalprice
FROM (SELECT c_custkey FROM customer WHERE c_custkey % {LAT_MOD} = 0) c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT {LAT_TOP}) t
ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
""", "correlated LATERAL top-N per key")


# ------------------------------------------------- recursive CTE
_STREAK_SQL = """
WITH RECURSIVE days AS (
    SELECT DISTINCT user_id, {day_expr} AS d FROM {events}
), starts AS (
    SELECT d1.user_id, d1.d FROM days d1
    LEFT JOIN days d0 ON d0.user_id = d1.user_id AND d0.d = d1.d - 1
    WHERE d0.user_id IS NULL
), walk(user_id, start_d, cur_d) AS (
    SELECT user_id, d, d FROM starts
    UNION ALL
    SELECT w.user_id, w.start_d, n.d
    FROM walk w JOIN days n
      ON n.user_id = w.user_id AND n.d = w.cur_d + 1
), streaks AS (
    SELECT user_id, start_d, COUNT(*) AS len
    FROM walk GROUP BY user_id, start_d
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       COUNT(*) AS n_streaks
FROM streaks GROUP BY user_id ORDER BY user_id
"""


def q_recursive_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user computed with
    Spark 4's recursive CTE — the identical recursive SQL runs on the
    DuckDB side. The walk extends each (user, streak-start) by the next
    active day, so every row has at most ONE successor: total work is
    linear in active days, recursion depth is the fixture's day span,
    and UNION ALL termination needs no distinct."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("rc_events")
    return spark.sql(_STREAK_SQL.format(
        day_expr="ts_ns div 86400000000000", events="rc_events"))


register("q_recursive_streaks", q_recursive_streaks,
         _STREAK_SQL.format(day_expr="epoch_us(ts) // 86400000000",
                            events="events"),
         "recursive-CTE consecutive-day streaks (linear walk, same SQL)")


# ------------------------------------------------------------ UDTF
CHUNK_CHARS = 100


def udtf_char_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF fan-out invoked through LATERAL SQL: each document
    yields one row per 100-char chunk. The UDTF is the Python escape
    hatch for genuinely imperative fan-out; the oracle recomputes the
    chunking with substr arithmetic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_len int, first_char int")
    class CharChunks:
        def eval(self, text: str):
            for i in range(0, len(text), CHUNK_CHARS):
                c = text[i:i + CHUNK_CHARS]
                yield (i // CHUNK_CHARS, len(c), ord(c[0]))

    spark.udtf.register("char_chunks", CharChunks)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, t.chunk_idx, t.chunk_len, t.first_char
        FROM udtf_docs d, LATERAL char_chunks(d.text) t
    """)


# The fan-out range bound is derived from the actual corpus max length,
# so the oracle emits every chunk the UDTF does no matter how long a
# document grows (a fixed range(0, 1000) would silently truncate past
# 100,000 chars).
register("udtf_char_chunks", udtf_char_chunks, f"""
SELECT doc_id, CAST(f AS INT) AS chunk_idx,
       CAST(least({CHUNK_CHARS}, length(text) - f * {CHUNK_CHARS}) AS INT)
           AS chunk_len,
       ascii(substr(text, f * {CHUNK_CHARS} + 1, 1)) AS first_char
FROM documents,
     (SELECT UNNEST(range(0,
         (SELECT (MAX(length(text)) + {CHUNK_CHARS} - 1) // {CHUNK_CHARS}
          FROM documents))) AS f) ks
WHERE f < (length(text) + {CHUNK_CHARS} - 1) // {CHUNK_CHARS}
""", "Python UDTF fan-out via LATERAL vs substr-arithmetic oracle")


# ------------------------------------------- AQP block sampling
SAMPLE_PCT = 10  # deterministic 10% sample


def aqp_block_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: estimate per-flag lineitem revenue
    from a DETERMINISTIC 10% sample (md5-derived membership — the same
    engine-portable hash-randomness trick as contrastive_negatives, so
    both engines draw the identical sample) and report the scaled
    estimate next to the exact value with the relative error. At 100 TB
    the sample runs on 1/10th the data; the exact side here exists to
    grade the estimate and would be dropped in production."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    member = F.expr(
        "pmod(cast(conv(substring(md5(concat(cast(l_orderkey as string),"
        " '_', cast(l_linenumber as string))), 1, 7), 16, 10) as bigint),"
        f" 100) < {SAMPLE_PCT}")
    est = (li.filter(member)
           .groupBy("l_returnflag")
           .agg((F.sum("l_extendedprice") * (100.0 / SAMPLE_PCT))
                .alias("est_revenue"),
                F.count(F.lit(1)).alias("n_sampled")))
    exact = (li.groupBy("l_returnflag")
             .agg(F.sum("l_extendedprice").alias("exact_revenue")))
    return (
        est.join(exact, "l_returnflag")
        .select("l_returnflag", "n_sampled",
                F.round("est_revenue", 2).alias("est_revenue"),
                F.round("exact_revenue", 2).alias("exact_revenue"),
                F.round((F.col("est_revenue") - F.col("exact_revenue"))
                        / F.col("exact_revenue"), 6).alias("rel_err"))
        .orderBy("l_returnflag")
    )


register("aqp_block_sample", aqp_block_sample, f"""
WITH s AS (
    SELECT l_returnflag,
           SUM(l_extendedprice) * (100.0 / {SAMPLE_PCT}) AS est_revenue,
           COUNT(*) AS n_sampled
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
               || CAST(l_linenumber AS VARCHAR)), 1, 7)) AS BIGINT)
          % 100 < {SAMPLE_PCT}
    GROUP BY l_returnflag
), x AS (
    SELECT l_returnflag, SUM(l_extendedprice) AS exact_revenue
    FROM lineitem GROUP BY l_returnflag
)
SELECT s.l_returnflag, s.n_sampled,
       ROUND(s.est_revenue, 2) AS est_revenue,
       ROUND(x.exact_revenue, 2) AS exact_revenue,
       ROUND((s.est_revenue - x.exact_revenue) / x.exact_revenue, 6)
           AS rel_err
FROM s JOIN x USING (l_returnflag)
ORDER BY s.l_returnflag
""", "deterministic block-sample estimate with exact-error accounting")
