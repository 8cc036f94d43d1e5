"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family."""

from . import reference_ops, stats_ops, tpch, windows  # noqa: F401
