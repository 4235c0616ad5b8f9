"""Round-2 streaming (chained aggs, left-outer interval join,
dedup-within-watermark) vs the batch oracle, plus emission invariants."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import streaming2
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(streaming2.QUERIES))
def test_streaming2_matches_oracle(spark, duck, name):
    compare(
        streaming2.QUERIES[name](spark, SF_DIR), duck, streaming2.ORACLES[name], name
    )


def test_leftouter_join_emits_null_rows(spark):
    rows = streaming2.stream_leftouter_interval_join(spark, SF_DIR).collect()
    nulls = [r for r in rows if r["view_id"] is None]
    matched = [r for r in rows if r["view_id"] is not None]
    assert nulls and matched
    # a purchase is either null-padded or matched, never both
    null_ids = {r["purchase_id"] for r in nulls}
    matched_ids = {r["purchase_id"] for r in matched}
    assert not (null_ids & matched_ids)


def test_dedup_within_watermark_is_exactly_distinct(spark):
    got = streaming2.stream_dedup_within_watermark(spark, SF_DIR)
    n = got.count()
    assert n == got.distinct().count()
