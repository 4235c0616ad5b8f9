"""Training-data-pipeline operators the reference lacks entirely but a
100 TB corpus engine needs (BASELINE.json north star): deterministic
dataset splitting, token-budget sequence packing, and duplicate-cluster
resolution.

These complete the dedup story in ``plans/corpus.py``: corpus.py finds
candidate/verified near-dup *pairs*; ``dd_duplicate_clusters`` here
turns pairs into *clusters* (connected components) and a per-document
keep/drop decision — the actual output a dedup pipeline ships.

Scale shapes:
- ``samp_hash_split`` is a pure narrow map (no shuffle): split
  membership is a function of md5(doc_id) alone, so it is stable under
  repartitioning, retries, and corpus growth — the property that makes
  hash-splits the standard train/val/test mechanism (vs rand(), which
  reshuffles membership every run).
- ``text_pack_batches`` windows per shard (PARTITION BY shard), never
  globally — 100 TB packs in parallel across thousands of shards, and
  batch ids are globally unique by (shard, seq within shard).
- ``dd_duplicate_clusters`` is iterative label propagation
  (O(diameter) rounds of join+min-agg); see
  ``operators.dedup.connected_components``.

Determinism/oracle notes: md5 is the only hash (bit-stable in Spark
and DuckDB); the DuckDB oracle for clusters computes the same
components via a recursive-CTE transitive closure — tractable at
oracle scale, while the Spark side is the path that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table_dist
from ..functions import text as T
from ..operators import dedup as D
from .corpus import _JACCARD_MAX_ID, _TOKS

# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

_SPLIT_BUCKETS = 100
_TRAIN_PCT = 80
_VAL_PCT = 10  # test = remainder

_PACK_CAPACITY = 2048  # tokens per packed batch
_PACK_SHARDS = 8


def hash_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Append (bucket, split) to any id-carrying frame: bucket =
    md5(id) mod 100, split by fixed bucket ranges (80/10/10).

    No shuffle, no RNG: membership depends only on the id, so adding
    or filtering documents never moves existing ones between splits."""
    bucket = F.expr(
        f"cast(conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10) as bigint)"
        f" % {_SPLIT_BUCKETS}"
    ).alias("bucket")
    return df.select(id_col, bucket).select(
        id_col,
        "bucket",
        F.when(F.col("bucket") < _TRAIN_PCT, F.lit("train"))
        .when(F.col("bucket") < _TRAIN_PCT + _VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def samp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment over documents."""
    return hash_split(
        load_table_dist(spark, sf_dir, "documents", cols=("doc_id",)), "doc_id"
    )


def text_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: stream documents in deterministic order within
    each shard and cut a new batch every ``_PACK_CAPACITY`` tokens
    (documents may straddle a boundary — the LLM-pretraining packing
    convention). batch_seq = floor(tokens_before_this_doc / capacity).

    The window is PARTITION BY shard — parallel across shards, never a
    global single-partition sort."""
    docs = load_table_dist(spark, sf_dir, "documents", cols=("doc_id", "text"))
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        T.token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CAPACITY)
        .cast("int")
        .alias("batch_seq"),
    )


def dd_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the exact-Jaccard pair graph (bounded
    candidate set, same bound/threshold as ``dd_jaccard_pairs``):
    connected components → (doc_id, cluster_id, is_canonical), keeping
    min-id as the cluster representative.

    At 100 TB the edge input swaps to ``minhash_lsh_pairs`` output
    verified by ``jaccard_pairs`` per bucket; the component step is
    unchanged."""
    docs = load_table_dist(spark, sf_dir, "documents", cols=("doc_id", "text")).filter(
        F.col("doc_id") < _JACCARD_MAX_ID
    )
    edges = D.jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    labels = D.connected_components(
        docs.select("doc_id"), edges, id_col="doc_id"
    )
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_JACC_EDGES_CTE = f"""
jtoks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           string_split_regex(trim(lower(text)), '\\s+'), x -> x != ''))) AS tok
  FROM documents WHERE doc_id < {_JACCARD_MAX_ID}
), jsizes AS (
  SELECT doc_id, count(*) AS sz FROM jtoks GROUP BY doc_id
), jinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM jtoks a JOIN jtoks b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), jpairs AS (
  SELECT id_a, id_b
  FROM jinter
  JOIN jsizes sa ON sa.doc_id = id_a
  JOIN jsizes sb ON sb.doc_id = id_b
  WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.5
)"""

ORACLES = {
    "samp_hash_split": f"""
        SELECT doc_id, bucket,
               CASE WHEN bucket < {_TRAIN_PCT} THEN 'train'
                    WHEN bucket < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {_SPLIT_BUCKETS} AS bucket
          FROM documents
        )
    """,
    "text_pack_batches": f"""
        SELECT doc_id, shard, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tokens) / {_PACK_CAPACITY}) AS INTEGER) AS batch_seq
        FROM (
          SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
                 CAST(len({_TOKS.format(e='text')}) AS INTEGER) AS n_tokens
          FROM documents
        )
    """,
    "dd_duplicate_clusters": f"""
        WITH RECURSIVE {_JACC_EDGES_CTE},
        jedges AS (
          SELECT id_a AS a, id_b AS b FROM jpairs
          UNION ALL
          SELECT id_b, id_a FROM jpairs
        ),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM documents WHERE doc_id < {_JACCARD_MAX_ID}
          UNION
          SELECT r.src, e.b FROM reach r JOIN jedges e ON r.dst = e.a
        )
        SELECT src AS doc_id, min(dst) AS cluster_id,
               src = min(dst) AS is_canonical
        FROM reach GROUP BY src
    """,
}

QUERIES = {
    "samp_hash_split": samp_hash_split,
    "text_pack_batches": text_pack_batches,
    "dd_duplicate_clusters": dd_duplicate_clusters,
}
