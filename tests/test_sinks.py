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


def test_orc_roundtrip(spark, sf_small, tmp_path):
    from impractical_impala_spark.sources import read_table, write_table

    df = _Q["q1_pricing_summary"].build(spark, sf_small)
    out = str(tmp_path / "q1.orc")
    write_table(df, out, fmt="orc")
    back = read_table(spark, out, fmt="orc")
    assert _sorted_rows(back) == _sorted_rows(df)


def test_json_roundtrip_with_schema(spark, sf_small, tmp_path):
    from impractical_impala_spark.sources import read_table, write_table

    df = _Q["q_rollup_revenue"].build(spark, sf_small)  # NULL rollup keys
    out = str(tmp_path / "rollup.json")
    write_table(df, out, fmt="json")
    back = read_table(spark, out, fmt="json", schema=df.schema)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_json_requires_explicit_schema(spark, sf_small, tmp_path):
    import pytest

    from impractical_impala_spark.sources import read_table

    with pytest.raises(ValueError, match="not self-describing"):
        read_table(spark, str(tmp_path), fmt="json")


def test_avro_raises_clearly(spark, tmp_path):
    import pytest

    from impractical_impala_spark.sources import read_table

    with pytest.raises(ValueError, match="spark-avro jar"):
        read_table(spark, str(tmp_path), fmt="avro")


def test_partitioned_write_prunes_at_read(spark, sf_small, tmp_path):
    """Hive-style partition layout must show up as a PartitionFilters
    prune (not a data filter) when reading one key back — the lever
    that turns a partition-key filter into a 1/N scan at lake scale."""
    import os

    from pyspark.sql import functions as F

    from impractical_impala_spark.sources import load_table, read_table, write_table

    out = str(tmp_path / "orders_by_priority")
    write_table(load_table(spark, sf_small, "orders"), out,
                partition_by=["o_orderpriority"])
    dirs = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(dirs) == 5
    back = read_table(spark, out).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]
    n = back.count()
    full = read_table(spark, out).count()
    assert 0 < n < full


def test_write_csv_outputs_distributed_default_matches_golden_path(
        spark, sf_small, tmp_path):
    """O30's generic sink is the executor-side writer (VERDICT r4 item
    4); the pandas path is golden-emission only. Both must produce one
    headered file per output with identical parsed content."""
    import csv

    from impractical_impala_spark.plans.wdi import write_csv_outputs

    outputs = {"grouped_sd": _Q["o24_grouped_sd"].build(spark, sf_small)}
    d_dist, d_gold = str(tmp_path / "dist"), str(tmp_path / "gold")
    write_csv_outputs(outputs, d_dist)                 # default: distributed
    write_csv_outputs(outputs, d_gold, golden=True)    # pandas, R-exact

    def load(d):
        with open(os.path.join(d, "grouped_sd.csv")) as fh:
            rows = list(csv.reader(fh))
        return rows[0], sorted(rows[1:])

    h_dist, r_dist = load(d_dist)
    h_gold, r_gold = load(d_gold)
    assert h_dist == h_gold
    assert len(r_dist) == len(r_gold)
    for rd, rg in zip(r_dist, r_gold):
        for vd, vg in zip(rd, rg):
            if vd != vg:  # float formatting may differ; values must not
                assert abs(float(vd) - float(vg)) <= 1e-9 * max(
                    1.0, abs(float(vg))), (vd, vg)
    # distributed output directory contains ONLY the final csv files
    assert os.listdir(d_dist) == ["grouped_sd.csv"]
