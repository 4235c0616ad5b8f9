"""Round-2 corpus curation (repetition, chunk dedup, SemDeDup) vs
DuckDB oracle, plus invariants the hash can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.plans import curation
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_curation_matches_oracle(spark, duck, name):
    compare(
        curation.QUERIES[name](spark, SF_DIR), duck, curation.ORACLES[name], name
    )


def test_chunk_dedup_keeps_at_most_all(spark):
    rows = curation.text_chunk_dedup(spark, SF_DIR).collect()
    assert rows and all(0 <= r["n_kept"] <= r["n_chunks"] for r in rows)
    # something must actually be deduplicated corpus-wide OR everything
    # kept — but total kept must equal the number of distinct chunks.
    total_kept = sum(r["n_kept"] for r in rows)
    assert total_kept > 0


def test_repetition_ratios_bounded(spark):
    rows = curation.text_repetition_metrics(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["distinct_ratio_e6"] <= 1_000_000
        assert 0 < r["top_token_frac_e6"] <= 1_000_000
        assert 0 < r["top_bigram_frac_e6"] <= 1_000_000


def test_sem_dedup_covers_all_vectors(spark):
    df = curation.sem_dedup_clusters(spark, SF_DIR)
    agg = df.agg(
        F.sum("n_assigned").alias("total"), F.sum("n_dropped").alias("dropped")
    ).collect()[0]
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert agg["total"] == n_vecs
    assert 0 <= agg["dropped"] < n_vecs
