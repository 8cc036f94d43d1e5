"""Schema-explicit sources.

Two source families:

1. The driver's parquet testdata (``region nation customer supplier part
   orders lineitem events documents embeddings``). Parquet self-describes,
   so we scan directly and let Catalyst push filters/prune columns into
   the scan (verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).

2. The reference's WDI CSV panels (wide country x series x 60 year
   columns). The reference infers the schema with readr
   (dtrendandstat_HP100.R:5-7); we declare it explicitly — on a 100 TB
   lake, schema inference is a full extra pass over the data and a
   correctness hazard, so the engine never infers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

YEARS = [str(y) for y in range(1960, 2020)]

# Wide WDI panel: 4 string id columns + 60 nullable double year columns
# (GDP_SSA_WDI.csv:1; country names carry quoted commas).
WDI_SCHEMA = T.StructType(
    [
        T.StructField("Country Name", T.StringType()),
        T.StructField("Country Code", T.StringType()),
        T.StructField("Series Name", T.StringType()),
        T.StructField("Series Code", T.StringType()),
    ]
    + [T.StructField(y, T.DoubleType()) for y in YEARS]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata parquet table. Plain ``spark.read.parquet`` —
    filters and projections placed on the result are pushed into the scan
    by Catalyst, which is the whole point of staying declarative.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    (microseconds) cannot hold; we read it as a nanosecond epoch long
    (``ts_ns``, the lossless form) and derive a microsecond ``ts``
    timestamp for window/watermark operators."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the derived ts below is TZ-aware (epoch micros); downstream
        # window/date_format rendering must be UTC to match the oracle
        # even when the caller's session (e.g. the driver's) is not UTC.
        # No query outputs temporal types, so this is side-effect-free
        # for result hashing.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_wdi_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a WDI wide panel CSV with the reference's parse semantics:
    header row, double-quoted fields with embedded commas, empty string as
    null (readr defaults at dtrendandstat_HP100.R:5-7)."""
    return spark.read.csv(
        path,
        schema=WDI_SCHEMA,
        header=True,
        quote='"',
        escape='"',
        nullValue="",
    )
