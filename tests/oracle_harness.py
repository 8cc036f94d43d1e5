"""Local Spark-vs-DuckDB parity harness, mirroring the driver's check:
row-count + column names + order-insensitive value comparison (we compare
values with a tight tolerance rather than a hash, so genuine float-ULP
noise doesn't hide real bugs behind an opaque hash mismatch)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
        return None if math.isnan(v) else v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key_cell(x):
    # floats sort by a rounded representation so sub-tolerance engine
    # differences can't order the two sides differently and misalign the
    # pairwise comparison
    if isinstance(x, float):
        return (x is None, "float", f"{x:.6g}")
    return (x is None, str(type(x)), str(x))


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple(_sort_key_cell(x) for x in r))
    return rows


def assert_parity(spark_df, oracle_sql: str, sf_dir: str,
                  rtol: float = 1e-9, atol: float = 1e-9) -> None:
    got = spark_df.toPandas()
    want = run_duckdb(oracle_sql, sf_dir)

    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"

    # dtype-kind parity: an int column on one side fetched as float on
    # the other (e.g. DuckDB HUGEINT sums) would survive a tolerant value
    # compare here but can break the driver's value hash — fail loudly.
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= {"i", "u", "f"}:
            assert (gk in "iu") == (wk in "iu"), (
                f"dtype-kind mismatch on {c}: spark={got[c].dtype} "
                f"oracle={want[c].dtype} — cast the oracle (e.g. SUM->BIGINT)"
            )
        # Spark types bare literals like 1.0 as DECIMAL -> pandas object
        # of Decimal; the driver's value hash may render those unlike
        # floats. Require explicit double casts in the query instead.
        for side, s in (("spark", got[c]), ("oracle", want[c])):
            if s.dtype.kind == "O" and len(s) and isinstance(
                s.dropna().iloc[0] if s.dropna().size else None, Decimal
            ):
                raise AssertionError(
                    f"{side} column {c} is Decimal-typed — cast to DOUBLE "
                    f"in the query (bare 1.0 literals are DECIMAL in Spark)"
                )

    g_rows, w_rows = _normalize(got), _normalize(want)
    for i, (g, w) in enumerate(zip(g_rows, w_rows)):
        for c, (gv, wv) in zip(sorted(got.columns), zip(g, w)):
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=rtol, abs_tol=atol), (
                    f"row {i} col {c}: spark={gv!r} oracle={wv!r}"
                )
            else:
                assert gv == wv, f"row {i} col {c}: spark={gv!r} oracle={wv!r}"
