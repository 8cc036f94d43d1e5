"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family."""

from . import (dedup, extras, joins_special, json_ops, multimodal,  # noqa: F401
               reference_ops, similarity, sketches, stats_ops, streams,
               text, tpch, tpch_more, windows)
