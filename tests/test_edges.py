"""Edge-case behavior: empty inputs, nulls, degenerate documents."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from end_to_end_data_engineering_job_listings_etl_spark.functions.keywords import extract_keywords
from end_to_end_data_engineering_job_listings_etl_spark.functions.relative_time import parse_relative_time
from end_to_end_data_engineering_job_listings_etl_spark.functions.text import word_shingles
from end_to_end_data_engineering_job_listings_etl_spark.operators.dedup import jaccard_pairs, minhash_signature
from end_to_end_data_engineering_job_listings_etl_spark.operators.dims import build_dim

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_build_dim_empty_input_both_modes(spark):
    empty = spark.createDataFrame([], _DOC_SCHEMA)
    for mode in ("global", "bucketed"):
        dim = build_dim(empty, [F.col("text").alias("k")], "sk", mode=mode)
        assert dim.count() == 0
        assert dim.columns == ["sk", "k"]


def test_build_dim_null_keys_rejected(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "a")], _DOC_SCHEMA)
    dim = build_dim(df, [F.col("text").alias("k")], "sk")
    rows = dim.collect()
    assert [(r["sk"], r["k"]) for r in rows] == [(1, "a")]


def test_extract_keywords_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "spark join")], _DOC_SCHEMA)
    out = {r["doc_id"]: r["kw"] for r in df.select(
        "doc_id", extract_keywords("text").alias("kw")
    ).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["join", "spark"]


def test_relative_time_junk_is_null(spark):
    df = spark.createDataFrame(
        [(1, "3 weeks ago"), (2, "just now"), (3, None), (4, "-5 days ago"),
         (5, "2 days ago")],
        T.StructType([T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]),
    )
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    out = {r["id"]: r["p"] for r in df.select(
        "id", parse_relative_time("s", now).alias("p")
    ).collect()}
    assert out[1] is None and out[2] is None and out[3] is None and out[4] is None
    assert out[5] is not None


def test_short_docs_yield_no_shingles_or_pairs(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a"), (3, "")], _DOC_SCHEMA)
    sh = df.select(F.size(word_shingles("text", 3)).alias("n")).collect()
    assert all(r["n"] == 0 for r in sh)
    assert minhash_signature(df, "text", "doc_id", 4, 3).count() == 0


def test_jaccard_single_doc_no_pairs(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")], _DOC_SCHEMA)
    assert jaccard_pairs(df, "text", "doc_id", threshold=0.0).count() == 0


def test_ranked_ids_partition_count_independent(spark):
    """The driver owns its SparkSession; its shuffle-partition default
    (200) differs from ours (cpus). Surrogate-key VALUES must not
    depend on it: the range/two-phase rank is partition-count-
    independent by construction — pin that with hostile counts
    (1, 3, 200) against the 32-partition result."""
    import pyspark.sql.functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.operators.ids import ranked_ids

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    keys = cust.select(F.upper("c_name").alias("k")).distinct()
    expect = sorted(
        (r["k"], r["sk"])
        for r in ranked_ids(keys, ["k"], "sk", n_parts=32).collect()
    )
    for n in (1, 3, 200):
        got = sorted(
            (r["k"], r["sk"])
            for r in ranked_ids(keys, ["k"], "sk", n_parts=n).collect()
        )
        assert got == expect, f"n_parts={n} diverged"


def test_batched_dims_equal_per_dim_build(spark):
    """build_dims_batched must produce exactly build_dim(mode=range)'s
    (sk, keys) rows for every spec — including a multi-column dim
    whose shorter siblings are null-padded in the shared frame."""
    import pyspark.sql.functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.operators.dims import (
        build_dim,
        build_dims_batched,
    )

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    specs = [
        ("seg", cust, [F.upper(F.col("c_mktsegment")).alias("k")], "sk"),
        ("prio", orders, [F.col("o_orderpriority").alias("k")], "sk"),
        (
            "two",
            orders,
            [
                F.col("o_orderstatus").alias("k1"),
                F.col("o_orderpriority").alias("k2"),
            ],
            "sk",
        ),
    ]
    batched = build_dims_batched(specs)
    for tag, src, keys, sk in specs:
        expect = sorted(map(tuple, build_dim(src, keys, sk).collect()))
        got = sorted(map(tuple, batched[tag].collect()))
        assert got == expect, tag


def test_apply_cdc_semantics(spark):
    """apply_cdc edge semantics: latest-wins per key, delete of an
    absent key is a no-op, insert creates a new key, a delete followed
    by a later upsert resurrects the row, untouched keys pass through."""
    from end_to_end_data_engineering_job_listings_etl_spark.operators.incremental import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            # k=2: update then delete (delete is latest -> gone)
            (2, 1, "U", "b2"),
            (2, 2, "D", None),
            # k=3: delete then update (update is latest -> resurrected)
            (3, 1, "D", None),
            (3, 2, "U", "c2"),
            # k=4: brand-new key inserted
            (4, 1, "I", "d"),
            # k=5: delete of a key base never had -> no-op
            (5, 1, "D", None),
        ],
        "k int, seq int, op string, v string",
    )
    out = {
        r["k"]: r["v"]
        for r in apply_cdc(base, changes, "k", ("seq",)).collect()
    }
    assert out == {1: "a", 3: "c2", 4: "d"}


def test_minhash_estimate_short_dup_docs_excluded(spark, tmp_path):
    """r7 advice #1: a doc shorter than the shingle width has an EMPTY
    shingle set, so the per-doc plan never banded it and it was never
    a candidate — the fp-collapsed plan must not emit its exact
    duplicates either. Long exact-dups still surface with Jaccard 1,
    and the DuckDB oracle agrees bit-for-bit on the same corpus."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from end_to_end_data_engineering_job_listings_etl_spark.plans.corpus import dd_minhash_estimate
    from tests.oracle_check import compare

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "tiny doc",  # 2 tokens < shingle width 3 -> empty set
                "tiny doc",  # exact duplicate of the short doc
                "alpha beta gamma delta epsilon",
                "alpha beta gamma delta epsilon",  # long exact dup
                "zeta eta theta iota kappa lambda",
            ],
        }
    )
    docs["doc_id"] = docs["doc_id"].astype("int64")
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    out = dd_minhash_estimate(spark, str(tmp_path))
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) not in pairs, "short-doc exact dup must not surface"
    assert (2, 3) in pairs, "long exact dup must surface with jacc 1"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}'"
    )
    compare(
        out,
        con,
        entry.oracle_sql()["dd_minhash_estimate"],
        "dd_minhash_estimate_short_docs",
    )
