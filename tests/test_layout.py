"""Layout operators: prove Z-order's skippability from the parquet
footers, and compaction's file-count + losslessness contract."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from impractical_impala_spark.queries import layout as L
from impractical_impala_spark.sources import load_table


def _file_stats(path, cust_col="o_custkey", date_col="o_orderdate"):
    """Per-file (min, max) footer stats for the two query dimensions."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        cmin = cmax = dmin = dmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None:
                    continue
                name = col.path_in_schema
                if name == cust_col:
                    cmin = st.min if cmin is None else min(cmin, st.min)
                    cmax = st.max if cmax is None else max(cmax, st.max)
                elif name == date_col:
                    dmin = st.min if dmin is None else min(dmin, st.min)
                    dmax = st.max if dmax is None else max(dmax, st.max)
        out.append((cmin, cmax, dmin, dmax))
    return out


def _files_hit(stats, clo=None, chi=None, dlo=None, dhi=None):
    n = 0
    for cmin, cmax, dmin, dmax in stats:
        if clo is not None and (cmax < clo or cmin > chi):
            continue
        if dlo is not None and (dmax < dlo or dmin > dhi):
            continue
        n += 1
    return n


def test_zorder_bounds_both_dimensions(spark, sf_small):
    """The z-ordered layout must let footer stats prune on BOTH
    dimensions, where a 1-D custkey sort prunes custkey queries but
    reads EVERY file for a date-only query. Assertion: the worst case
    over {custkey box, date box} is strictly better under Z-order."""
    import datetime

    zpath = L.write_zordered_orders(spark, sf_small)
    orders = load_table(spark, sf_small, "orders")
    lpath = L._scratch(sf_small, "linear_orders")
    import shutil
    shutil.rmtree(lpath, ignore_errors=True)
    (orders.repartitionByRange(L.Z_FILES, "o_custkey")
     .sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(lpath))

    cust_max = orders.agg(F.max("o_custkey")).collect()[0][0]
    clo, chi = int(cust_max * 0.3), int(cust_max * 0.5)   # 20% slice
    # pyarrow reports date-column stats as datetime.datetime
    dlo = datetime.datetime(1995, 1, 1)
    dhi = datetime.datetime(1995, 12, 31)

    zs, ls = _file_stats(zpath), _file_stats(lpath)
    assert len(zs) == L.Z_FILES and len(ls) == L.Z_FILES

    z_worst = max(_files_hit(zs, clo=clo, chi=chi),
                  _files_hit(zs, dlo=dlo, dhi=dhi))
    l_worst = max(_files_hit(ls, clo=clo, chi=chi),
                  _files_hit(ls, dlo=dlo, dhi=dhi))
    # the 1-D layout's date query cannot skip anything
    assert _files_hit(ls, dlo=dlo, dhi=dhi) == L.Z_FILES
    assert z_worst < l_worst, (z_worst, l_worst)


def test_compaction_file_counts(spark, sf_small):
    """64-file sprawl -> 4 files, content identical (count + checksum),
    and the coalesce write plans WITHOUT a shuffle."""
    df = L.compact_small_files(spark, sf_small)
    df.collect()
    sprawl = L._scratch(sf_small, "sprawl_events")
    compacted = L._scratch(sf_small, "compact_events")
    assert len(glob.glob(f"{sprawl}/*.parquet")) == L.SMALL_FILES
    assert len(glob.glob(f"{compacted}/*.parquet")) == L.TARGET_FILES
    a = spark.read.parquet(sprawl).selectExpr(
        "count(1) n", "bit_xor(xxhash64(event_id, user_id, event_type, value)) h"
    ).collect()[0]
    b = spark.read.parquet(compacted).selectExpr(
        "count(1) n", "bit_xor(xxhash64(event_id, user_id, event_type, value)) h"
    ).collect()[0]
    assert a == b
