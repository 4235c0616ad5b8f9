"""Relational edge semantics (set ops ALL, null-safe equality, 3VL
NOT IN, anti-join nulls, division, correlated scalar) vs DuckDB."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import relational
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_matches_oracle(spark, duck, name):
    compare(
        relational.QUERIES[name](spark, SF_DIR), duck, relational.ORACLES[name], name
    )


def test_not_in_null_poison_is_empty_by_3vl(spark):
    row = relational.rel_not_in_null_poison(spark, SF_DIR).collect()[0]
    assert row["n_customers"] == 0


def test_not_in_plain_returns_rows(spark):
    row = relational.rel_not_in_plain(spark, SF_DIR).collect()[0]
    assert row["n_customers"] > 0


def test_division_nonempty(spark):
    assert relational.rel_division_all_priorities(spark, SF_DIR).limit(1).count() == 1


def test_nullsafe_join_matches_null_group(spark):
    rows = relational.rel_nullsafe_join(spark, SF_DIR).collect()
    null_groups = [r for r in rows if r["rhs_key"] is None]
    assert len(null_groups) == 1 and null_groups[0]["n_matched"] > 0
