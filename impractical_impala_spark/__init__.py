"""impractical_impala_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference repo (an R/tidyverse business-cycle pipeline; see SURVEY.md)
as idiomatic Spark: declarative DataFrame/SQL plans optimized by Catalyst,
with Python crossing the JVM boundary only inside two Arrow-batched
``applyInPandas`` detrending kernels.

Layout
------
- ``session``     : SparkSession factory tuned for the target workload.
- ``sources``     : schema-explicit readers (parquet testdata, WDI CSV).
- ``operators``   : relational/window/dedup/similarity operator builders.
- ``functions``   : scalar expression helpers (portable hashing, text).
- ``plans``       : end-to-end pipelines (WDI reference parity, TPC-H-ish).
- ``streaming``   : Structured Streaming variants (sessionization, windows).
- ``multimodal``  : binary-column plumbing (decode kernels stubbed).
"""

__version__ = "0.1.0"
