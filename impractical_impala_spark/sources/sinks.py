"""Generic table sinks/sources beyond the driver parquet and the
reference CSV (O30): one writer/reader pair covering every format the
Spark distribution ships natively (parquet, ORC, JSON-lines, CSV), plus
partitioned layouts whose directory structure Catalyst prunes at read
time (PartitionFilters — the free 100x when queries filter on the
partition key).

Avro requires the external spark-avro jar; ``write_table``/``read_table``
raise a clear error for it rather than stubbing (this container ships no
avro jar, and silently writing something else would be worse).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NATIVE_FORMATS = ("parquet", "orc", "json", "csv")

# readable-text formats need header/null handling to round-trip
_CSV_DEFAULTS = {"header": "true", "nullValue": ""}


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: Sequence[str] | None = None,
                single_file: bool = False, **options: str) -> None:
    """Write ``df`` to ``path`` in ``fmt``. ``partition_by`` lays out
    one directory per key value (hive-style), which the reader prunes;
    ``single_file`` coalesces to one output file (reference O30
    semantics — only sane for small results, a partition-count knob is
    deliberately NOT hidden here for big ones)."""
    if fmt not in NATIVE_FORMATS:
        raise ValueError(
            f"format {fmt!r} not in native Spark distribution "
            f"{NATIVE_FORMATS}; avro needs the external spark-avro jar")
    if fmt == "csv":
        options = {**_CSV_DEFAULTS, **options}
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode).format(fmt).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: T.StructType | str | None = None,
               **options: str) -> DataFrame:
    """Read ``path`` back. Self-describing formats (parquet/ORC) carry
    their schema; for JSON/CSV pass the schema explicitly — on a lake,
    schema inference is an extra full pass and a correctness hazard, so
    this reader only infers when told to (``inferSchema`` option)."""
    if fmt not in NATIVE_FORMATS:
        raise ValueError(
            f"format {fmt!r} not in native Spark distribution "
            f"{NATIVE_FORMATS}; avro needs the external spark-avro jar")
    if fmt == "csv":
        options = {**_CSV_DEFAULTS, **options}
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv") and "inferSchema" not in options:
        raise ValueError(
            f"{fmt} is not self-describing: pass schema= or "
            "inferSchema='true' explicitly")
    return reader.load(path)
