"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family."""

from . import (dedup, reference_ops, similarity, stats_ops, text, tpch,  # noqa: F401
               windows)
