"""Registry-wide physical-plan hygiene sweep: every registered query's
plan — all of them, not a hand-picked list — must be free of the two
anti-patterns that silently kill a plan at 100 TB:

- ``CartesianProduct``: an unconstrained pair blowup (1-row stat
  attachments compile to BroadcastNestedLoopJoin, which is allowed);
- ``BatchEvalPython``: a row-at-a-time Python UDF on the hot path
  (Arrow kernels show as ArrowEvalPython / MapInPandas and are fine).

The per-query plan-shape contracts live in test_plans.py; this sweep is
the backstop that keeps a NEW query from reintroducing either class.
"""

import contextlib
import io

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

# The deliberate Python-UDTF feature query (queries/modern_sql.py):
# UDTF fan-out IS the escape hatch under test there, and its plan node
# (BatchEvalPythonUDTF) shares the row-at-a-time prefix.
ROW_PYTHON_ALLOWED = {"udtf_char_chunks"}


@pytest.mark.parametrize("name", sorted(_Q))
def test_plan_has_no_cartesian_or_row_python(name, spark, sf_oracle):
    df = _Q[name].build(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ROW_PYTHON_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time UDF"
