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


def test_sem_dedup_scaled_cell_control(spark):
    """The k ∝ N variant must (a) cover every vector exactly once,
    (b) pick k = max(N // 500, 1) cells keyed by the first-k vec_ids,
    and (c) agree with sem_dedup_clusters' total drop accounting
    discipline (0 ≤ dropped < assigned per cell)."""
    df = curation.sem_dedup_scaled(spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    k = max(n_vecs // curation._SEM_TARGET_CELL, 1)
    assert sum(r["n_assigned"] for r in df) == n_vecs
    assert {r["centroid_id"] for r in df} <= set(range(k))
    for r in df:
        assert 0 <= r["n_dropped"] < r["n_assigned"] or (
            r["n_assigned"] == 1 and r["n_dropped"] == 0
        )


def test_sem_dedup_threshold_margin():
    """The BLAS-matmul pair stage is exact under the strict value-hash
    gate only because no within-cell pair's cosine sits near the
    round(·,6) ≥ 0.3 decision boundary (see sem_dedup_clusters
    docstring). Pin that measured margin: reassociation error on
    64-term float64 dots is ~1e-15; require ≥ 1e-9 headroom at both
    oracle SFs."""
    import duckdb
    import numpy as np

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        ids = [r[0] for r in rows]
        x = np.array([r[1] for r in rows], dtype=np.float64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        c = np.array([x[ids.index(v)] for v in curation._SEM_CENTROID_IDS])
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        sims = xn @ cn.T
        # ivf_assign tie-break: max cosine, ties to the HIGHER centroid
        cell = (sims.shape[1] - 1) - sims[:, ::-1].argmax(axis=1)
        margin = 1.0
        for k in range(cn.shape[0]):
            idx = np.where(cell == k)[0]
            if len(idx) < 2:
                continue
            s = xn[idx] @ xn[idx].T
            iu = np.triu_indices(len(idx), 1)
            margin = min(margin, np.abs(s[iu] - 0.2999995).min())
        assert margin > 1e-9, (sf, margin)


def test_quality_buckets_are_ordered_and_balanced(spark):
    """Within each language: walking documents by (score desc, doc_id)
    the bucket sequence is head… middle… tail… (never interleaved) and
    the three buckets differ in size by at most one — the ntile
    contract CCNet-style bucketing relies on."""
    rows = curation.text_quality_buckets(spark, SF_DIR).collect()
    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang  # at least one language present
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r["lm_score_e6"], r["doc_id"]))
        ranks = [order[r["bucket"]] for r in rs]
        assert ranks == sorted(ranks), lang
        sizes = [ranks.count(k) for k in range(3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)


def test_ivf_assign_blocked_matches_arrow_multiblock(spark):
    """The distributed blocked assigner must reproduce
    ivf_assign_arrow's closure-path answer exactly — exercised with
    knobs forced tiny so BOTH the multi-centroid-block and the
    multi-vector-subpartition merge paths actually run (k=7 centroids
    over block_size=2 → 4 blocks; N=40 vectors over group_vectors=6
    → 7 vparts), including a zero vector and quantized ties."""
    import random

    from end_to_end_data_engineering_job_listings_etl_spark.operators.similarity import (
        ivf_assign_arrow,
        ivf_assign_blocked,
    )

    rng = random.Random(8)
    dim, n, k = 16, 40, 7
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)]
    rows[5] = (5, [0.0] * dim)  # zero-norm row → highest cid on both paths
    rows[9] = (9, [x * 3.0 for x in rows[2][1]])  # exact tie with row 2's cell
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [(cid, rows[cid][1]) for cid in range(k)]
    cents = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cid int, cv array<double>"
    )

    via_arrow = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign_arrow(emb, "embedding", "vec_id", centroids).collect()
    }
    via_blocked = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign_blocked(
            emb, "embedding", "vec_id", cents, block_size=2, group_vectors=6
        ).collect()
    }
    assert via_blocked == via_arrow
    assert via_blocked[5] == k - 1  # zero vector degrades to highest cid


def test_sem_dedup_scaled_never_collects(spark):
    """r7 verdict weak #1: the production SemDeDup path must not
    collect() any frame whose size scales with the corpus. Plan
    construction is allowed scalar aggregates (count) but ZERO
    DataFrame.collect calls; the result is then evaluated normally
    and must still cover every vector."""
    from pyspark.sql import DataFrame

    calls = []
    real_collect = DataFrame.collect
    DataFrame.collect = lambda self: (calls.append(1), real_collect(self))[1]
    try:
        df = curation.sem_dedup_scaled(spark, SF_DIR)
    finally:
        DataFrame.collect = real_collect
    assert calls == [], f"driver-side collect on the sem_dedup_scaled path: {len(calls)}"
    total = df.agg(F.sum("n_assigned").alias("t")).collect()[0]["t"]
    assert total == spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
