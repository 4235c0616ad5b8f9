"""TF-IDF / k-means step / REST ingest registry queries vs oracle."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import mlx
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(mlx.ORACLES))
def test_mlx_matches_oracle(spark, duck, name):
    compare(mlx.QUERIES[name](spark, SF_DIR), duck, mlx.ORACLES[name], name)


def test_kmeans_step_partitions_all_vectors(spark):
    import pyspark.sql.functions as F

    out = mlx.ml_kmeans_step(spark, SF_DIR)
    per_dim = out.groupBy("dim").agg(F.sum("n_members").alias("total"))
    totals = {r["dim"]: r["total"] for r in per_dim.collect()}
    # every dimension row accounts for every vector exactly once
    assert len(set(totals.values())) == 1
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert next(iter(totals.values())) == n_vecs


def test_rest_ingest_retries_and_projects(spark):
    df = mlx.src_rest_ingest(spark, SF_DIR)
    rows = {r["job_country"]: r for r in df.collect()}
    assert set(rows) == {"US", "IN", "JP", "RU"}
    assert all(r["n_records"] == 50 for r in rows.values())
    # declared-but-absent column null back-filled everywhere
    assert all(r["n_publisher_nonnull"] == 0 for r in rows.values())


def test_triangle_corner_counts_sum_to_3x(spark):
    """Every triangle credits exactly its three corners."""
    import pyspark.sql.functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.plans import mlx

    # sf0.01: the sparsified graph has no triangles at sf0.001
    total_corners = (
        mlx.graph_triangle_count(spark, "/root/testdata/sf0.01")
        .agg(F.sum("n_triangles").alias("s"))
        .collect()[0]["s"]
    )
    assert total_corners is not None and total_corners > 0
    assert total_corners % 3 == 0


def test_random_projection_preserves_expected_norm(spark):
    """JL property: E[||proj||^2] == ||v||^2 under the 1/sqrt(d_out)
    scaling. Per-vector the ratio is chi^2-noisy at d_out=8, but the
    MEAN ratio over the fixture's 500 vectors concentrates near 1 —
    deterministic fixture + seeded matrix, so the bound is stable."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans import mlx

    proj = {
        r["vec_id"]: [r[f"p_{d}_e6"] / 1e6 for d in range(mlx._RP_OUT)]
        for r in mlx.emb_random_projection(spark, SF_DIR).collect()
    }
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    ratios = []
    for vid, p in proj.items():
        orig = sum(x * x for x in emb[vid])
        if orig > 0:
            ratios.append(sum(x * x for x in p) / orig)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
