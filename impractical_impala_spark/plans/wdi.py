"""The reference's four business-cycle pipelines, Spark-first.

Reproduces the 28 golden CSVs of the reference (an R/tidyverse pipeline;
see SURVEY.md) from its committed WDI inputs:

    method in {dlog, hp (lambda=100), hp625 (lambda=6.25), logquad}
    x stat family in {sd(+ratios), corr, acf} x {country, region}

Everything is declarative DataFrame ops (one country-keyed shuffle, then
window/agg pipelines) except the two numeric kernels, which run as
Arrow-batched applyInPandas per country (operators/detrend.py).

Scale note: the reference data is 62 entities x 60 years, but nothing
here depends on that — the same plan runs with millions of entities;
group-wise kernels parallelize over entities, aggregations are partial
(map-side) first, and the region dimension is broadcast.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.detrend import add_hp_cycles, add_quad_cycles
from ..operators.reshape import pivot_first
from ..operators.runlength import clean_runs
from ..sources import read_wdi_csv
from ..sources.readers import YEARS

# hard cap on the driver-side golden CSV path (model-size stat tables)
GOLDEN_MAX_ROWS = 10_000

MIN_T = 30  # dtrendandstat_dlog.R:7

# O2 recode map (dtrendandstat_dlog.R:14-21)
SERIES_TO_VARIABLE = {
    "NE.EXP.GNFS.ZS": "Xper",
    "NY.GDP.PCAP.KN": "Y",
    "NE.GDI.TOTL.ZS": "Iper",
    "NE.CON.PRVT.ZS": "Cper",
    "NE.IMP.GNFS.ZS": "Mper",
}
VARIABLES = ["Y", "Cper", "Iper", "Xper", "Mper"]

WDI_FILES = ("GDP_SSA_WDI.csv", "GDP_ASIA_WDI.csv", "GDP_LA_WDI.csv")

# O18: iso3c -> World Bank region (the full public WB economy
# classification, 7 regions / ~217 economies, as published in the World
# Bank's country-and-lending-groups list and mirrored by the R
# countrycode lookup the reference uses at dtrendandstat_dlog.R:76).
# CHI (Channel Islands) and XKX (Kosovo) are WB-specific codes beyond
# strict ISO 3166. Validated against the goldens' (code, region) pairs
# in tests/test_golden_wdi.py; any WB economy added to the inputs now
# resolves instead of silently getting a null region.
_SSA = ("AGO BDI BEN BFA BWA CAF CIV CMR COD COG COM CPV ERI ETH GAB GHA "
        "GIN GMB GNB GNQ KEN LBR LSO MDG MLI MOZ MRT MUS MWI NAM NER NGA "
        "RWA SDN SEN SLE SOM SSD STP SWZ SYC TCD TGO TZA UGA ZAF ZMB ZWE")
_EAP = ("ASM AUS BRN CHN FJI FSM GUM HKG IDN JPN KHM KIR KOR LAO MAC MHL "
        "MMR MNG MNP MYS NCL NRU NZL PHL PLW PNG PRK PYF SGP SLB THA TLS "
        "TON TUV VNM VUT WSM")
_LAC = ("ABW ARG ATG BHS BLZ BOL BRA BRB CHL COL CRI CUB CUW CYM DMA DOM "
        "ECU GRD GTM GUY HND HTI JAM KNA LCA MAF MEX NIC PAN PER PRI PRY "
        "SLV SUR SXM TCA TTO URY VCT VEN VGB VIR")
_ECA = ("ALB AND ARM AUT AZE BEL BGR BIH BLR CHE CHI CYP CZE DEU DNK ESP "
        "EST FIN FRA FRO GBR GEO GIB GRC GRL HRV HUN IMN IRL ISL ITA KAZ "
        "KGZ LIE LTU LUX LVA MCO MDA MKD MNE NLD NOR POL PRT ROU RUS SMR "
        "SRB SVK SVN SWE TJK TKM TUR UKR UZB XKX")
_MENA = ("ARE BHR DJI DZA EGY IRN IRQ ISR JOR KWT LBN LBY MAR MLT OMN "
         "PSE QAT SAU SYR TUN YEM")
_SAS = "AFG BGD BTN IND LKA MDV NPL PAK"
_NAC = "BMU CAN USA"
REGION_BY_CODE = (
    {c: "Sub-Saharan Africa" for c in _SSA.split()}
    | {c: "East Asia & Pacific" for c in _EAP.split()}
    | {c: "Latin America & Caribbean" for c in _LAC.split()}
    | {c: "Europe & Central Asia" for c in _ECA.split()}
    | {c: "Middle East & North Africa" for c in _MENA.split()}
    | {c: "South Asia" for c in _SAS.split()}
    | {c: "North America" for c in _NAC.split()}
)

CYCLE_SERIES = {"Y_log": "Y_cyc", "C_log": "C_cyc", "I_log": "I_cyc",
                "TB": "TB_cyc"}


def read_wdi_block(spark: SparkSession, path: str) -> DataFrame:
    """O1-O5 (dtrendandstat_dlog.R:12-29): scan -> recode -> unpivot ->
    cast -> project."""
    df = read_wdi_csv(spark, path)
    recode = F.lit(None).cast("string")
    for code, var in reversed(SERIES_TO_VARIABLE.items()):
        recode = F.when(F.col("Series Code") == code, F.lit(var)).otherwise(recode)
    return (
        df.withColumn("Variable", recode)
        .unpivot(["Country Code", "Variable"], YEARS, "Year", "Value")
        .withColumn("Year", F.col("Year").cast("int"))
        .select("Country Code", "Variable", "Year", "Value")
    )


def wdi_long(spark: SparkSession, data_dir: str) -> DataFrame:
    """O6-O7 (dtrendandstat_dlog.R:31-36): union of the three panels,
    keep recognized variables."""
    parts = [read_wdi_block(spark, os.path.join(data_dir, f)) for f in WDI_FILES]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("Variable").isin(VARIABLES))


def wdi_cleaned(long_df: DataFrame) -> DataFrame:
    """O8-O12 (dtrendandstat_dlog.R:42-54): per (country, variable) keep
    valid runs (Value not null AND > 0) of length >= MIN_T. Every
    qualifying run survives; later lags span the gaps (SURVEY §2.3.1)."""
    cleaned = clean_runs(long_df, ["Country Code", "Variable"], "Year",
                         "Value", MIN_T)
    return cleaned.select("Country Code", "Variable", "Year", "Value")


def wdi_allvars(cleaned: DataFrame) -> DataFrame:
    """O13-O15 (dtrendandstat_dlog.R:56-63): keep countries having all 5
    variables — distinct + count + semi-join (broadcast: the key set is
    tiny relative to the fact)."""
    keys = (
        cleaned.select("Country Code", "Variable").distinct()
        .groupBy("Country Code").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == 5)
        .select("Country Code")
    )
    return cleaned.join(F.broadcast(keys), "Country Code", "left_semi")


def wdi_wide(spark: SparkSession, allvars: DataFrame) -> DataFrame:
    """O16-O18 (dtrendandstat_dlog.R:68-77): pivot wider, derive the
    economic aggregates, broadcast-join the region dimension."""
    wide = pivot_first(allvars, ["Country Code", "Year"], "Variable",
                       "Value", VARIABLES)
    wide = (
        wide.withColumn("C", F.col("Y") * F.col("Cper") / 100)
        .withColumn("I", F.col("Y") * F.col("Iper") / 100)
        .withColumn("X", F.col("Y") * F.col("Xper") / 100)
        .withColumn("M", F.col("Y") * F.col("Mper") / 100)
        .withColumn("TB", (F.col("X") - F.col("M")) / F.col("Y"))
    )
    dim = spark.createDataFrame(
        [(k, v) for k, v in REGION_BY_CODE.items()], ["Country Code", "Region"]
    )
    return wide.join(F.broadcast(dim), "Country Code", "left")


def _guarded_log(col: str):
    """O19 (dtrendandstat_HP100.R:154-156)."""
    c = F.col(col)
    return F.when(c.isNotNull() & (c > 0), F.log(c))


def build_wide(spark: SparkSession, data_dir: str) -> DataFrame:
    """Shared prologue of all four methods."""
    return wdi_wide(spark, wdi_allvars(wdi_cleaned(wdi_long(spark, data_dir))))


# ---------------------------------------------------------------- methods
def with_dlog_cycles(wide: DataFrame) -> DataFrame:
    """dlog method (dtrendandstat_dlog.R:83-92): first difference of logs
    per country (lag = previous surviving row), TB kept in levels."""
    w = Window.partitionBy("Country Code").orderBy("Year")
    out = wide
    for var, name in [("Y", "dlogY"), ("C", "dlogC"), ("I", "dlogI")]:
        lg = _guarded_log(var)
        out = out.withColumn(name, lg - F.log(F.lag(var).over(w)))
    return out.withColumn("TB_lv", F.col("TB"))


def with_hp_cycles_method(wide: DataFrame, lam: float) -> DataFrame:
    """hp / hp625 methods (dtrendandstat_HP100.R:150-164): HP cycles of
    log Y/C/I and raw TB per country."""
    df = (
        wide.withColumn("Y_log", _guarded_log("Y"))
        .withColumn("C_log", _guarded_log("C"))
        .withColumn("I_log", _guarded_log("I"))
    )
    return add_hp_cycles(df, ["Country Code"], "Year", CYCLE_SERIES, lam,
                         min_t=MIN_T)


def with_quad_cycles_method(wide: DataFrame) -> DataFrame:
    """logquad method (detrendandstat_quad.R:146-168): quadratic OLS
    residuals of log Y/C/I and raw TB, on the per-country time index
    t = Year - min(Year) + 1 (O21)."""
    w = Window.partitionBy("Country Code")
    df = (
        wide.withColumn("t", (F.col("Year") - F.min("Year").over(w) + 1).cast("double"))
        .withColumn("Y_log", _guarded_log("Y"))
        .withColumn("C_log", _guarded_log("C"))
        .withColumn("I_log", _guarded_log("I"))
    )
    return add_quad_cycles(df, ["Country Code"], "Year", CYCLE_SERIES, "t",
                           min_t=MIN_T)


# ---------------------------------------------------------------- stats
def sd_by_country(cycles: DataFrame, series: dict[str, str],
                  ratio_names: tuple[str, str] = ("sdC_over_sdY", "sdI_over_sdY"),
                  ) -> DataFrame:
    """O24+O25 (dtrendandstat_dlog.R:97-109): sample sd x100 per
    (country, region) + C/Y and I/Y ratio columns. ``series`` maps output
    column -> cycle column, in output order; first three are Y, C, I."""
    aggs = [(F.stddev_samp(src) * 100).alias(out) for out, src in series.items()]
    out_cols = list(series)
    df = cycles.groupBy("Country Code", "Region").agg(*aggs)
    return df.withColumn(ratio_names[0], F.col(out_cols[1]) / F.col(out_cols[0])) \
             .withColumn(ratio_names[1], F.col(out_cols[2]) / F.col(out_cols[0]))


def region_moments(df: DataFrame, stat_cols: list[str]) -> DataFrame:
    """O28 (dtrendandstat_dlog.R:111-137): unweighted mean/sd of the
    COUNTRY-level stats per region (mean-of-sds, not pooled)."""
    aggs = []
    for c in stat_cols:
        aggs.append(F.avg(c).alias(f"{c}_mean"))
        aggs.append(F.stddev_samp(c).alias(f"{c}_sd"))
    return df.groupBy("Region").agg(*aggs)


_CORR_PAIRS = [("Y", "C"), ("Y", "I"), ("Y", "TB"), ("C", "I"), ("C", "TB"),
               ("I", "TB")]


def corr_by_country(cycles: DataFrame, cols: dict[str, str]) -> DataFrame:
    """O26 (dtrendandstat_dlog.R:142-152): pairwise Pearson corr
    (complete.obs ≡ F.corr's pairwise null handling) of the four cycle
    series per (country, region). ``cols`` maps Y/C/I/TB -> cycle col."""
    aggs = [
        F.corr(cols[a], cols[b]).alias(f"corr_{a}_{b}") for a, b in _CORR_PAIRS
    ]
    return cycles.groupBy("Country Code", "Region").agg(*aggs)


def acf_by_country(cycles: DataFrame, cols: dict[str, str]) -> DataFrame:
    """O27 (dtrendandstat_dlog.R:180-189): lag-1 autocorrelation as
    cor(x, lag(x)) — the sample Pearson corr against the one-row lag, NOT
    the acf() estimator."""
    w = Window.partitionBy("Country Code").orderBy("Year")
    df = cycles
    aggs = []
    for key, col in cols.items():
        lag_col = f"__lag_{key}"
        df = df.withColumn(lag_col, F.lag(col).over(w))
        aggs.append(F.corr(col, lag_col).alias(f"acf_{key}"))
    return df.groupBy("Country Code", "Region").agg(*aggs)


# ---------------------------------------------------------------- drivers
METHODS = ("dlog", "hp", "hp625", "logquad")


def method_outputs(spark: SparkSession, method: str,
                   wide: DataFrame) -> dict[str, DataFrame]:
    """All 7 output tables for one method, keyed by golden file stem."""
    if method == "dlog":
        cycles = with_dlog_cycles(wide)
        sd_series = {"sd_dlogY": "dlogY", "sd_dlogC": "dlogC",
                     "sd_dlogI": "dlogI", "sd_TB": "TB_lv"}
        cyc_cols = {"Y": "dlogY", "C": "dlogC", "I": "dlogI", "TB": "TB_lv"}
    elif method in ("hp", "hp625"):
        lam = 100.0 if method == "hp" else 6.25
        cycles = with_hp_cycles_method(wide, lam)
        sd_series = {"sd_Y": "Y_cyc", "sd_C": "C_cyc", "sd_I": "I_cyc",
                     "sd_TB": "TB_cyc"}
        cyc_cols = {"Y": "Y_cyc", "C": "C_cyc", "I": "I_cyc", "TB": "TB_cyc"}
    elif method == "logquad":
        cycles = with_quad_cycles_method(wide)
        sd_series = {"sd_Y": "Y_cyc", "sd_C": "C_cyc", "sd_I": "I_cyc",
                     "sd_TB": "TB_cyc"}
        cyc_cols = {"Y": "Y_cyc", "C": "C_cyc", "I": "I_cyc", "TB": "TB_cyc"}
    else:
        raise ValueError(f"unknown method {method!r}")

    cycles = cycles.cache()
    sd_c = sd_by_country(cycles, sd_series)
    corr_c = corr_by_country(cycles, cyc_cols)
    acf_c = acf_by_country(cycles, cyc_cols)
    ratio_cols = ["sdC_over_sdY", "sdI_over_sdY"]
    return {
        f"sd_by_country_{method}": sd_c,
        f"sd_by_region_{method}": region_moments(sd_c, list(sd_series)),
        f"sd_ratio_by_region_{method}": region_moments(sd_c, ratio_cols),
        f"corr_by_country_{method}": corr_c,
        f"corr_by_region_{method}": region_moments(
            corr_c, [f"corr_{a}_{b}" for a, b in _CORR_PAIRS]),
        f"acf_by_country_{method}": acf_c,
        f"acf_by_region_{method}": region_moments(
            acf_c, [f"acf_{k}" for k in cyc_cols]),
    }


def run_all(spark: SparkSession, data_dir: str,
            methods: tuple[str, ...] = METHODS) -> dict[str, DataFrame]:
    """All 28 outputs. The shared wide frame is computed once and cached."""
    wide = build_wide(spark, data_dir).cache()
    out: dict[str, DataFrame] = {}
    for m in methods:
        out.update(method_outputs(spark, m, wide))
    return out


def write_csv_outputs(outputs: dict[str, DataFrame], out_dir: str,
                      golden: bool = False) -> None:
    """O30 (dtrendandstat_dlog.R:211-219): one headered CSV per output,
    NA -> empty cell.

    Default path is the DISTRIBUTED writer — executors stream the rows,
    the driver never materializes the result (``coalesce(1)`` only
    funnels the final write task so a single headered file comes out,
    matching the reference's one-file-per-output contract). The
    ``golden=True`` path routes through pandas for byte-exact
    readr::write_csv float formatting and is reserved for R-golden
    emission of the model-size stat tables (<=45 rows each) — as the
    engine's generic CSV sink it would bottleneck on the driver."""
    os.makedirs(out_dir, exist_ok=True)
    for name, df in outputs.items():
        dest = os.path.join(out_dir, f"{name}.csv")
        if golden:
            # explicit model-size guard: this driver-side path exists
            # only for byte-exact golden emission of the small stat
            # tables; pointing it at a large frame is a bug, not a
            # slow path — fail fast instead of OOMing the driver.
            # limit(cap+1) bounds the fetch AND detects the overflow
            # in the same single job (a count() first would execute
            # the whole plan twice).
            pdf = df.limit(GOLDEN_MAX_ROWS + 1).toPandas()
            if len(pdf) > GOLDEN_MAX_ROWS:
                raise ValueError(
                    f"golden CSV path is driver-side and capped at "
                    f"{GOLDEN_MAX_ROWS} rows; {name!r} exceeds it — use "
                    "the distributed writer (golden=False)")
            pdf.to_csv(dest, index=False, na_rep="")
            continue
        tmp = os.path.join(out_dir, f"_{name}.csv.spark")
        (df.coalesce(1).write.mode("overwrite")
         .option("header", True).option("nullValue", "").csv(tmp))
        part = next(f for f in os.listdir(tmp)
                    if f.startswith("part-") and f.endswith(".csv"))
        os.replace(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
