"""Round-15 second wave: cross-laws for the extension debuts.

- events_retail_calendar_months: the 4-5-4 slice EQUALS
  events_retail454_months row-for-row (same arithmetic, one of three
  variants); EVERY variant rolls up to the SAME
  events_retail454_rollup quarter rows (quarters do not depend on the
  month pattern); per-variant month counts are 12 per full fiscal
  year by construction.
- dedup_banding_by_source: slice sums partition the global banding
  sweep — every dedup_banding_sweep row re-derives exactly from the
  per-(lang, source) raw sums.
"""

import numpy as np
import pandas as pd

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _collect(spark, name, sf):
    return _Q[name].build(spark, sf).toPandas()


def test_retail_variants_454_slice_equals_months(spark, sf_oracle):
    var = _collect(spark, "events_retail_calendar_months", sf_oracle)
    sl = (var[var.variant == "4-5-4"].drop(columns=["variant"])
          .sort_values(["event_type", "fm"]).reset_index(drop=True))
    mo = (_collect(spark, "events_retail454_months", sf_oracle)
          .sort_values(["event_type", "fm"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sl, mo[sl.columns.tolist()])


def test_retail_variants_all_roll_up_to_same_quarters(spark, sf_oracle):
    var = _collect(spark, "events_retail_calendar_months", sf_oracle)
    q = (_collect(spark, "events_retail454_rollup", sf_oracle)
         .sort_values(["event_type", "fq"]).reset_index(drop=True))
    for v, grp in var.groupby("variant"):
        g = grp.copy()
        g["fq"] = (g.fm.str[:-4] + "-Q"
                   + ((g.fm.str[-2:].astype(int) - 1) // 3 + 1)
                   .astype(str))
        rolled = (g.groupby(["event_type", "fq"])
                  .agg(n_events=("n_events", "sum"),
                       n_active_days=("n_active_days", "sum"),
                       sum_value=("sum_value", "sum")).reset_index()
                  .sort_values(["event_type", "fq"])
                  .reset_index(drop=True))
        assert (rolled.event_type == q.event_type).all(), v
        assert (rolled.fq == q.fq).all(), v
        assert (rolled.n_events.values == q.n_events.values).all(), v
        assert (rolled.n_active_days.values
                == q.n_active_days.values).all(), v
        assert np.allclose(rolled.sum_value, q.sum_value,
                           rtol=0, atol=1e-6), v


def test_banding_by_source_sums_to_global(spark, sf_oracle):
    per = _collect(spark, "dedup_banding_by_source", sf_oracle)
    glob = (_collect(spark, "dedup_banding_sweep", sf_oracle)
            .set_index("n_bands"))
    for nb, grp in per.groupby("n_bands"):
        g = glob.loc[nb]
        sums = {c: int(grp[c].sum()) for c in
                ("n_cand", "n_confirmed", "n_planted_hit", "n_planted")}
        for c, v in sums.items():
            assert v == g[c], (nb, c, v, g[c])
        assert (grp.rows_per_band == g.rows_per_band).all()
        assert (sums["n_planted_hit"] * 1_000_000
                // sums["n_planted"] == g.recall_ppm)
        assert (sums["n_confirmed"] * 1_000_000
                // sums["n_cand"] == g.precision_ppm)
