"""Grouped-map custom operators via ``applyInPandas``.

SURVEY.md custom-operator tier (b): when per-group imperative logic is
genuinely needed, the group arrives as ONE pandas DataFrame (Arrow
batch), runs arbitrary Python, and returns rows under a declared
schema. State is bounded by the largest single group, groups are
hash-partitioned across executors — the 100 TB shape as long as no
group is pathological (salt or pre-split if one is).

``grouped_sequence`` is the canonical exact-semantics example: per-key
arrival sequencing (sort by event time, tie-broken on a unique id,
assign 1..n) — integer output, so the driver's value-hash gate can
check the applyInPandas path itself against a SQL window oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_sequence(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    id_col: str,
    seq_name: str = "seq",
) -> DataFrame:
    """Per-``key_col`` arrival sequence computed group-at-a-time in
    pandas: sort by ``order_cols`` (ascending, ties must be broken by
    including a unique column), number 1..n. Equivalent to
    ``row_number() OVER (PARTITION BY key ORDER BY order_cols)`` — the
    point is exercising the grouped-map machinery, not replacing the
    window function (use the window when the logic IS expressible)."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    narrow = df.select(key_col, *order_cols) if id_col in order_cols else df.select(
        key_col, *order_cols, id_col
    )
    out_schema = f"{key_col} bigint, {id_col} bigint, {seq_name} int"
    order_list = list(order_cols)

    def seq_group(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(order_list, kind="mergesort").reset_index(drop=True)
        return pd.DataFrame(
            {
                key_col: s[key_col],
                id_col: s[id_col],
                seq_name: pd.array(range(1, len(s) + 1), dtype="int32"),
            }
        )

    return narrow.groupBy(key_col).applyInPandas(seq_group, out_schema)


def cogrouped_balance(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    amount_col: str,
) -> DataFrame:
    """Cogrouped-map ``applyInPandas``: both inputs are hash-partitioned
    on their keys and each key's two group frames arrive TOGETHER in
    one Python call — the custom-merge shape (per-key reconciliation,
    as-of alignment, interleaved merges) that a join + groupBy can't
    express when the merge logic is imperative.

    This instance computes a per-key balance (row counts from both
    sides + an exact integer amount total) so the cogroup machinery
    itself sits under the value-hash gate; keys missing on either side
    still emit (empty frame on that side), matching a FULL OUTER join
    oracle.

    Cogrouping on the raw key costs one Python invocation PER DISTINCT
    KEY (~1 ms each) — ruinous when keys are numerous and groups small
    (millions of calls at 100 TB). So both sides cogroup on
    ``hash(key) % n_buckets`` instead: each call receives a bucket's
    worth of both tables and runs the per-key merges vectorized in
    pandas. Python invocations drop from O(distinct keys) to
    O(n_buckets) while every key's rows still meet in exactly one
    call. Size n_buckets so a bucket (~rows/n_buckets) fits executor
    memory; a genuinely pathological single key needs pre-splitting
    regardless of bucketing."""
    from pyspark.sql import functions as F

    from ..session import ship_package

    ship_package(left.sparkSession)
    out_schema = "key bigint, n_left bigint, n_right bigint, total_amount bigint"
    n_buckets = max(left.sparkSession.sparkContext.defaultParallelism, 32)

    lb = left.withColumn("_b", F.pmod(F.hash(F.col(left_key)), F.lit(n_buckets)))
    rb = right.withColumn("_b", F.pmod(F.hash(F.col(right_key)), F.lit(n_buckets)))

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty_idx = pd.Index([], dtype="int64")
        lagg = (
            lpdf.groupby(left_key)[amount_col].agg(["size", "sum"])
            if len(lpdf)
            else pd.DataFrame({"size": [], "sum": []}, dtype="int64", index=empty_idx)
        )
        ragg = (
            rpdf.groupby(right_key).size().to_frame("n_right")
            if len(rpdf)
            else pd.DataFrame({"n_right": []}, dtype="int64", index=empty_idx)
        )
        m = lagg.join(ragg, how="outer")
        return pd.DataFrame(
            {
                "key": m.index.astype("int64"),
                "n_left": m["size"].fillna(0).astype("int64"),
                "n_right": m["n_right"].fillna(0).astype("int64"),
                "total_amount": m["sum"].fillna(0).astype("int64"),
            }
        )

    return (
        lb.groupBy("_b")
        .cogroup(rb.groupBy("_b"))
        .applyInPandas(merge, out_schema)
    )
