"""Sketch/hash-structure layer vs DuckDB oracle, plus the structural
properties the oracles alone can't express: CMS one-sided error, Bloom
zero-false-negatives, salted-join plan invisibility, and the CDC
chunker's edit-resynchronization guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.plans import sketch
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(sketch.ORACLES))
def test_sketch_query_matches_oracle(spark, duck, name):
    compare(sketch.QUERIES[name](spark, SF_DIR), duck, sketch.ORACLES[name], name)


def test_cms_never_undercounts(spark):
    rows = sketch.agg_cms_frequency(spark, SF_DIR).collect()
    assert rows
    assert all(r["cms_ok"] for r in rows)
    assert all(r["overcount"] >= 0 for r in rows)


def test_bloom_has_no_false_negatives(spark):
    """Every true member must be a candidate: candidates ≥ true, and
    false positives are exactly the candidate surplus beyond members
    that are candidates — which the one-row audit can only satisfy if
    no member was dropped."""
    row = sketch.j_bloom_filter_prune(spark, SF_DIR).collect()[0]
    assert row["n_probe"] > 0
    # members are always candidates (no false negatives), so the
    # candidate pool is at least the member pool
    assert row["n_candidates"] >= row["n_true"]
    assert row["n_false_pos"] == row["n_candidates"] - row["n_true"]
    assert 0 <= row["n_candidates"] <= row["n_probe"]


@pytest.mark.parametrize("buckets", [1, 3, 8])
def test_salted_join_matches_plain_join(spark, buckets):
    """salted_equi_join must be value-identical to the plain join for
    any salt count, including hostile ones (B=1 degenerates to the
    plain join; B=3 exercises uneven modulo)."""
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    salted = sketch.salted_equi_join(
        orders, cust, "o_custkey", buckets=buckets, salt_src="o_orderkey"
    )
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain.select(*salted.columns)).isEmpty()


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    """The content-defined property: prepending tokens to a document
    must leave the tail chunking identical BY CONTENT — chunk
    fingerprints (joined token runs) of the edited doc are a superset
    of the original's except for at most the chunks overlapping the
    first boundary after the edit region."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four five "
        "six seven eight nine ten eleven twelve thirteen fourteen fifteen"
    )
    edited = "inserted tokens " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )
    per_tok = sketch.cdc_chunk_tokens(docs)
    fps = (
        per_tok.groupBy("doc_id", "chunk_id")
        .agg(F.concat_ws(" ", F.collect_list("tok")).alias("fp"))
        .collect()
    )
    base_fps = {r["fp"] for r in fps if r["doc_id"] == 1}
    edit_fps = {r["fp"] for r in fps if r["doc_id"] == 2}
    # every base chunk except (at most) the first — which absorbs the
    # inserted prefix — reappears verbatim in the edited doc's chunking
    missing = base_fps - edit_fps
    assert len(missing) <= 1, f"chunking failed to resynchronize: {missing}"


def test_bm25_is_ranked_and_bounded(spark):
    rows = sketch.text_bm25_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    scores = [r["score_e3"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_kmv_is_exact_below_k(spark):
    """With fewer distinct values than k the sketch holds every hash —
    the operator must return the EXACT distinct count, not an
    extrapolation (duplicates across groups included)."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.sketch import (
        _KMV_K,
        kmv_merged_estimate,
    )

    small = spark.range(120).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 40).alias("k"),  # 40 distinct keys, spread over groups
    )
    assert 40 < _KMV_K
    est = kmv_merged_estimate(small, "g", "k").collect()[0]["kmv_est"]
    assert est == 40


def test_gram_matrix_diagonal_nonnegative_and_upper(spark):
    from end_to_end_data_engineering_job_listings_etl_spark.plans.mlx import (
        _GRAM_DIMS,
        ml_gram_matrix,
    )

    rows = ml_gram_matrix(spark, SF_DIR).collect()
    assert len(rows) == _GRAM_DIMS * (_GRAM_DIMS + 1) // 2
    for r in rows:
        assert r["i"] <= r["j"]
        if r["i"] == r["j"]:
            assert r["gram_s"] >= 0


def test_bitmap_distinct_equals_count_distinct(spark):
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    got = {
        r["event_type"]: r["n_distinct"]
        for r in sketch.agg_bitmap_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_stratified_exact_total_is_precisely_k(spark):
    """The largest-remainder allocation must hit N div 10 EXACTLY (not
    in expectation), and per-stratum quotas must be proportional ±1."""
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
    from end_to_end_data_engineering_job_listings_etl_spark.plans.traindata import (
        samp_stratified_exact,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    picked = samp_stratified_exact(spark, SF_DIR)
    assert picked.count() == n // 10
    by_lang = {r["lang"]: r["cnt"] for r in picked.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    strata = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    k = n // 10
    for lang, n_s in strata.items():
        q = by_lang.get(lang, 0)
        assert abs(q - k * n_s / n) <= 1, (lang, q, k * n_s / n)


def test_operators_handle_empty_inputs(spark):
    """Degenerate-input hardening: zero-row fact/dim/doc frames must
    yield empty (not erroring) results from the operator-level entry
    points — the behavior a scheduled 100 TB pipeline needs when a
    partition lands empty."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.sketch import (
        cdc_chunk_tokens,
        kmv_merged_estimate,
        salted_equi_join,
    )

    empty_fact = spark.createDataFrame([], "rid long, k long, v long")
    empty_dim = spark.createDataFrame([], "k long, attr long")
    assert salted_equi_join(empty_fact, empty_dim, "k", salt_src="rid").count() == 0
    # one-sided empty: fact rows with no dim → inner join empty
    fact = spark.createDataFrame([(1, 2, 3)], "rid long, k long, v long")
    assert salted_equi_join(fact, empty_dim, "k", salt_src="rid").count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert cdc_chunk_tokens(empty_docs).count() == 0
    # whitespace-only text → zero tokens, zero chunks
    ws_docs = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert cdc_chunk_tokens(ws_docs).count() == 0

    empty_keys = spark.createDataFrame([], "g string, k long")
    est = kmv_merged_estimate(empty_keys, "g", "k").collect()[0]["kmv_est"]
    assert est == 0
