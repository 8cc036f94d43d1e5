"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family."""

from . import (dedup, extras, json_ops, multimodal, reference_ops,  # noqa: F401
               similarity, sketches, stats_ops, streams, text, tpch,
               tpch_more, windows)
