"""Sink coverage (O30 + engine completeness): results round-trip
through parquet and CSV unchanged."""

import os

from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_parquet_roundtrip(spark, sf_small, tmp_path):
    df = _Q["q5_revenue_by_nation"].build(spark, sf_small)
    out = str(tmp_path / "q5.parquet")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_csv_roundtrip_with_header_and_nulls(spark, sf_small, tmp_path):
    df = _Q["q_rollup_revenue"].build(spark, sf_small)  # has NULL rollup keys
    out = str(tmp_path / "rollup.csv")
    df.write.mode("overwrite").option("header", True).option("nullValue", "") \
        .csv(out)
    back = (
        spark.read.option("header", True).option("nullValue", "")
        .schema(df.schema).csv(out)
    )
    assert _sorted_rows(back) == _sorted_rows(df)


def test_single_file_csv_sink(spark, sf_small, tmp_path):
    """O30 (dtrendandstat_dlog.R:211-219): single headered CSV, NA ->
    empty cell — the distributed coalesce(1) writer variant."""
    df = _Q["o24_grouped_sd"].build(spark, sf_small)
    out = str(tmp_path / "single")
    df.coalesce(1).write.option("header", True).option("nullValue", "").csv(out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1
    with open(os.path.join(out, files[0])) as fh:
        header = fh.readline().strip().split(",")
    assert header == df.columns


def test_partitioned_parquet_writer(spark, sf_small, tmp_path):
    """Hive-partitioned layout — the lake-scale output shape (partition
    pruning on read)."""
    ev = _Q["o02_recode_case"].build(spark, sf_small)
    out = str(tmp_path / "by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) == 5
    one = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan

def test_permissive_csv_handles_malformed_rows(spark, tmp_path):
    """Source robustness: malformed CSV rows surface as nulls under the
    default PERMISSIVE mode and are droppable under DROPMALFORMED —
    ingestion never crashes on dirty data."""
    p = tmp_path / "dirty.csv"
    p.write_text("a,b,c\n1,2.5,x\nnot_an_int,3.5,y\n2,oops,z\n3,4.5\n")
    schema = "a INT, b DOUBLE, c STRING"
    permissive = spark.read.csv(str(p), header=True, schema=schema).collect()
    assert len(permissive) == 4
    by_c = {r.c: r for r in permissive}
    assert by_c["y"].a is None          # bad int -> null
    assert by_c["z"].b is None          # bad double -> null
    dropped = (
        spark.read.option("mode", "DROPMALFORMED")
        .csv(str(p), header=True, schema=schema).collect()
    )
    assert len(dropped) < 4
