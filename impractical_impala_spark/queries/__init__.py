"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family."""

from . import (dedup, multimodal, reference_ops, similarity,  # noqa: F401
               stats_ops, streams, text, tpch, windows)
