"""applyInPandasWithState custom stateful operator: the streaming EWMA
must converge to the batch reference over an AvailableNow run."""

import math

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.stateful import batch_ewma, user_ewma


def test_streaming_ewma_matches_batch(spark, sf_small):
    stream = S.read_events_stream(spark, sf_small)
    q = (
        user_ewma(stream)
        .writeStream.format("memory").queryName("t_ewma")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # last emitted row per user carries the final state
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in spark.sql(
            "SELECT user_id, n_events, ewma_value FROM t_ewma"
        ).collect()
    }
    want = batch_ewma(load_table(spark, sf_small, "events"))
    assert len(got) == len(want)
    for _, row in want.iterrows():
        n, e = got[row.user_id]
        assert n == row.n_events
        assert math.isclose(e, row.ewma_value, rel_tol=1e-9)
