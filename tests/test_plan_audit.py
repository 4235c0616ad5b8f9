"""Whole-surface plan-quality gate: every registry query's executed
plan must be free of the two unconditional scale killers —
CartesianProduct and row-at-a-time Python evaluation (BatchEvalPython;
Arrow-batched pandas operators are fine). SinglePartition exchanges
are allowed only because the engine's policy restricts them to scalar
aggregates and narrow key projections (see operators/dims.py and the
keymap pattern in plans/star.py); spot checks for those live in
test_plans.py."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark import registry
from tests.conftest import SF_DIR

_STREAMING = {
    "stream_window_counts",
    "stream_user_totals",
    "stream_dedup",
    "stream_session_counts",
}  # no batch plan


@pytest.mark.parametrize(
    "name", sorted(n for n in registry.all_queries() if n not in _STREAMING)
)
def test_no_cartesian_no_row_python(spark, name):
    df = registry.all_queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"
