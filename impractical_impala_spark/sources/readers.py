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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
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

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    the loader adapts to the stored physical type and always exposes the
    same two columns: ``ts_ns`` (bigint epoch nanoseconds, the arithmetic
    form every downstream query bins on) and ``ts`` (TIMESTAMP_NTZ
    wall-clock, session-TZ independent, for window/watermark operators)."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # nanosAsLong lets Spark resolve a TIMESTAMP(NANOS) column at
        # all (TimestampType is microseconds); harmless for micros data
        # and scoped to this read path — no other table carries nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) read as raw epoch-nano longs
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts", ntz_from_epoch_us(F.expr("ts_ns div 1000")))
            )
        elif isinstance(ts_type, T.TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false): already the NTZ
            # wall-clock we want; derive the epoch form field-wise so it
            # is independent of the session timezone.
            df = df.withColumn(
                "ts_ns", epoch_us_from_ntz(F.col("ts")) * F.lit(1000))
        else:
            # TZ-adjusted TIMESTAMP: unix_micros is the absolute instant;
            # rebuild ts as deterministic NTZ from it.
            us = F.unix_micros(F.col("ts"))
            df = (
                df.withColumn("ts_ns", us * F.lit(1000))
                .withColumn("ts", ntz_from_epoch_us(us))
            )
        # stable column order regardless of which physical type shipped
        return df.select(
            "event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ntz_from_epoch_us(us: Column) -> Column:
    """Epoch microseconds -> TIMESTAMP_NTZ wall-clock in UTC, computed
    with pure integer arithmetic so the result — and everything windowed
    or formatted from it — is independent of the caller session's
    timezone (timestamp_micros() would be TZ-aware and render shifted
    under a non-UTC driver session)."""
    day_us = F.lit(86_400_000_000)
    # pmod, not %: Spark's % takes the dividend's sign, so a pre-1970
    # epoch would yield rem < 0 (NULL from make_timestamp_ntz) and a
    # day count truncated toward zero instead of floored. pmod keeps
    # 0 <= rem < day_us, which makes (us - rem) the floor multiple for
    # negative epochs too.
    rem = F.pmod(us, day_us)
    # (us - rem) is an exact multiple of day_us but exceeds double's
    # 53-bit mantissa — divide as decimals so the day count is exact
    days = ((us - rem).cast("decimal(38,0)")
            / day_us.cast("decimal(20,0)")).cast("int")
    d = F.date_add(F.lit("1970-01-01").cast("date"), days)
    # rem < 8.64e10 fits a double exactly; quotient steps (1 us) dwarf
    # double rounding error, so plain division + truncation is exact
    return F.make_timestamp_ntz(
        F.year(d), F.month(d), F.dayofmonth(d),
        (rem / F.lit(3_600_000_000)).cast("int"),
        ((rem % F.lit(3_600_000_000)) / F.lit(60_000_000)).cast("int"),
        (rem % F.lit(60_000_000)) / F.lit(1_000_000.0),
    )


def epoch_us_from_ntz(ts: Column) -> Column:
    """TIMESTAMP_NTZ wall-clock (interpreted as UTC) -> epoch microseconds
    — the exact inverse of ntz_from_epoch_us. timestamp_diff between two
    NTZ values is pure field arithmetic (never consults the session
    timezone), is exact for pre-1970 values and microsecond fractions
    (verified in tests), and runs as one codegen'd JVM intrinsic — an
    order of magnitude fewer expression nodes than extracting
    date/hour/minute/fraction separately."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ts)


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
