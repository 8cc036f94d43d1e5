"""Partition-invariance for the round-4 kernels: the determinism
claims (integer-exact covariance partials, order-free aggregations)
must survive different input split sizes and shuffle widths — the
conditions that reorder distributed sums and Arrow batch boundaries."""

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

CASES = [
    "emb_covariance",            # integer Gram partials across batches
    "multimodal_audio_energy",   # integer windowed energy per batch
    "user_pagerank",             # float iterations, rounded output
    "events_markov_transitions",
    "scd2_user_state",
    "cdc_latest_state",
    "ivm_merge_counts",
    "contrastive_negatives",
    "pit_state_join",
    "events_rolling_slope",      # integer-exact sliding sufficient sums
    "session_paths",             # struct-sorted path assembly
    "graph_triangles",
]


@pytest.mark.parametrize("name", CASES)
def test_partition_invariance(spark, sf_small, name):
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    conf = [("spark.sql.files.maxPartitionBytes", "65536"),
            ("spark.sql.shuffle.partitions", "7"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "37")]
    old = {k: spark.conf.get(k) for k, _ in conf}
    try:
        for k, v in conf:
            spark.conf.set(k, v)
        skewed = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert base == skewed
