"""Semi-structured (JSON) column operators over ``events.props`` —
engine completeness beyond the reference (which has no string/JSON
functions; SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON path extraction + typed cast + aggregation over the
    extracted value (the common telemetry pattern)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


register("json_extract_props", json_extract_props, """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS INT)) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS INT))   AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT))   AS max_k
FROM events GROUP BY event_type
""", "JSON path extraction + aggregation")


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage: substring/concat/upper/length/regexp
    in one projection (absent from the reference; table stakes for the
    engine)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string"))
        .alias("seg_key"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("name_digits"),
    )


register("string_functions", string_functions, """
SELECT c_custkey,
       upper(c_mktsegment) AS seg_upper,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INT) AS name_len,
       concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
       COALESCE(regexp_extract(c_name, '(\\d+)', 1), '') AS name_digits
FROM customer
""", "string-function coverage")
