"""Structured Streaming, round 2: chained stateful aggregations,
stream-stream LEFT OUTER interval joins, and bounded-state dedup
(dropDuplicatesWithinWatermark) — the stateful shapes round 1's
streaming layer (plans/media_stream.py) didn't cover.

Every query drains with trigger(availableNow) so results are a pure
function of the input files, and each is oracle-checked against the
equivalent batch SQL. Append-mode emission semantics are part of the
contract being verified:

- A windowed agg in append mode emits a window only once the event-
  time watermark passes its END; with a final no-data micro-batch the
  closing watermark is max(ts) - delay, so windows ending after that
  stay unemitted. The oracle encodes exactly that cutoff.
- A LEFT OUTER interval join emits null-padded rows only for left rows
  whose join window is fully below the closing watermark.

State boundedness is the 100 TB story: every operator here carries a
watermark, so state size is O(keys in the watermark horizon), not
O(stream length).
"""

from __future__ import annotations

from ..util import scratch_dir

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.watermark import (
    events_stream_dir,
    run_to_memory_sink,
    stream_events,
)

_WM = "2 hours"
_WM_MICROS = 2 * 3600 * 1_000_000


def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained stateful aggregations in ONE streaming query:
    10-minute counts per event_type, re-aggregated into hourly
    (sum, n_buckets) — the multi-stage rollup that previously required
    two jobs and an intermediate topic. Spark chains the stateful
    operators when the second groupBy uses window_time() of the first.

    Append mode ⇒ only hourly windows whose end the closing watermark
    passed are emitted; the oracle applies the same cutoff."""
    name = f"stream_chain_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir(prefix="ckpt_chain_")
    ev = stream_events(spark, events_stream_dir(sf_dir))
    per_10m = (
        ev.withWatermark("ts", _WM)
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_10m"))
    )
    hourly = (
        per_10m.groupBy(
            F.window(F.window_time("win"), "1 hour").alias("win2"), "event_type"
        )
        .agg(F.sum("n_10m").alias("n_events"), F.count("*").alias("n_buckets"))
        .select(
            F.col("win2.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_buckets",
        )
    )
    run_to_memory_sink(hourly, name, ckpt, output_mode="append")
    return spark.table(name)


def stream_leftouter_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER event-time interval join: every
    purchase, matched to same-user views in the preceding hour, OR
    emitted once with a null view after the watermark proves no match
    can still arrive. The outer row is the state-timeout path — the
    part an inner interval join (round 1) never exercises.

    Append emission: null-padded rows appear only for purchases whose
    p_ts the closing watermark passed; matched rows are emitted as
    they join. The oracle is the batch left join restricted to that
    same watermark-closed left set.

    Single-batch invariant: the oracle counts every matched pair with
    no watermark restriction, which is exact ONLY because
    events_stream_dir stages one parquet file ⇒ one micro-batch (the
    watermark is still the init value while every row joins; it
    advances only at batch end). A multi-file landing could advance
    the watermark between batches and drop late-arriving matches the
    oracle still counts — production callers with multi-file input
    should pin maxFilesPerTrigger/latestFirst or use the inner-join
    oracle form. Boundary note: Spark's eviction predicates differ per
    operator (windowed-agg eviction is window.end <= wm; join state
    eviction is strict <); the fixture's microsecond timestamps never
    land exactly on max(ts) - delay, so the <= cutoffs in these
    oracles are safe here."""
    name = f"stream_loj_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir(prefix="ckpt_loj_")
    src = events_stream_dir(sf_dir)
    purchases = (
        stream_events(spark, src)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", _WM)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    views = (
        stream_events(spark, src)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", _WM)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "view_id")
    run_to_memory_sink(joined, name, ckpt, output_mode="append")
    return spark.table(name)


def stream_fullouter_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER event-time interval join — BOTH
    unmatched sides surface once the watermark proves their window
    closed, completing the inner (round 1) / left-outer / full-outer
    join matrix.

    Eviction bounds differ per side because the condition is
    asymmetric (``v_ts ∈ [p_ts - 1h, p_ts]``): a purchase can be
    null-emitted once the watermark passes ``p_ts`` (no future view
    can be ≤ it), but a view only once the watermark passes
    ``v_ts + 1h`` (a future purchase up to one hour later could still
    reach back). The oracle encodes exactly those two cutoffs; the
    same single-batch invariant and microsecond-boundary note as the
    left-outer query apply."""
    name = f"stream_foj_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir(prefix="ckpt_foj_")
    src = events_stream_dir(sf_dir)
    purchases = (
        stream_events(spark, src)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", _WM)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    views = (
        stream_events(spark, src)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", _WM)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "full_outer",
    ).select("purchase_id", "view_id")
    run_to_memory_sink(joined, name, ckpt, output_mode="append")
    return spark.table(name)


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark
    evicts a key's state once the watermark passes its last sighting +
    delay — the fix for round 1's stream_dedup, whose exact-dedup state
    grows with distinct keys forever. With the delay (60 days) wider
    than the fixture's 30-day span, suppression is total and the
    result equals batch DISTINCT; in production the delay caps state
    at the keys seen within the horizon."""
    name = f"stream_ddw_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir(prefix="ckpt_ddw_")
    ev = stream_events(spark, events_stream_dir(sf_dir))
    deduped = (
        ev.select("user_id", "event_type", "ts")
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    run_to_memory_sink(deduped, name, ckpt, output_mode="append")
    return spark.table(name)


QUERIES = {
    "stream_chained_window_agg": stream_chained_window_agg,
    "stream_leftouter_interval_join": stream_leftouter_interval_join,
    "stream_fullouter_interval_join": stream_fullouter_interval_join,
    "stream_dedup_within_watermark": stream_dedup_within_watermark,
}

# Closing watermark for single-stream queries: max(ts) - delay.
_CLOSE_WM = "(SELECT max(ts) - INTERVAL 2 HOUR FROM events)"

# Closing watermark for the two-reader join: EACH reader computes its
# own watermark from the rows that pass through it (the filters sit
# upstream of withWatermark), and Spark's multi-watermark policy takes
# the MIN — so the join's closing watermark is the slower side's.
_CLOSE_WM_JOIN = (
    "(SELECT least("
    " (SELECT max(ts) FROM events WHERE event_type = 'purchase'),"
    " (SELECT max(ts) FROM events WHERE event_type = 'view')"
    ") - INTERVAL 2 HOUR)"
)

ORACLES = {
    "stream_chained_window_agg": f"""
        WITH e AS (
            SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS b10, event_type
            FROM events
        ), per10 AS (
            SELECT b10, event_type, count(*) AS n_10m
            FROM e GROUP BY b10, event_type
        )
        SELECT time_bucket(INTERVAL 1 HOUR, b10) AS window_start, event_type,
               CAST(sum(n_10m) AS BIGINT) AS n_events, count(*) AS n_buckets
        FROM per10
        GROUP BY time_bucket(INTERVAL 1 HOUR, b10), event_type
        HAVING time_bucket(INTERVAL 1 HOUR, b10) + INTERVAL 1 HOUR
               <= {_CLOSE_WM}
    """,
    "stream_leftouter_interval_join": f"""
        WITH p AS (
            SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ), matched AS (
            SELECT purchase_id, view_id
            FROM p JOIN v
              ON p_user = v_user
             AND v_ts >= p_ts - INTERVAL 1 HOUR
             AND v_ts <= p_ts
        ), unmatched AS (
            SELECT purchase_id, NULL AS view_id
            FROM p
            WHERE p_ts <= {_CLOSE_WM_JOIN}
              AND NOT EXISTS (
                SELECT 1 FROM v
                WHERE v_user = p_user
                  AND v_ts >= p_ts - INTERVAL 1 HOUR
                  AND v_ts <= p_ts)
        )
        SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    "stream_fullouter_interval_join": f"""
        WITH p AS (
            SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ), matched AS (
            SELECT purchase_id, view_id
            FROM p JOIN v
              ON p_user = v_user
             AND v_ts >= p_ts - INTERVAL 1 HOUR
             AND v_ts <= p_ts
        ), unmatched_p AS (
            SELECT purchase_id, NULL AS view_id
            FROM p
            WHERE p_ts <= {_CLOSE_WM_JOIN}
              AND NOT EXISTS (
                SELECT 1 FROM v
                WHERE v_user = p_user
                  AND v_ts >= p_ts - INTERVAL 1 HOUR
                  AND v_ts <= p_ts)
        ), unmatched_v AS (
            SELECT NULL AS purchase_id, view_id
            FROM v
            WHERE v_ts <= {_CLOSE_WM_JOIN} - INTERVAL 1 HOUR
              AND NOT EXISTS (
                SELECT 1 FROM p
                WHERE p_user = v_user
                  AND v_ts >= p_ts - INTERVAL 1 HOUR
                  AND v_ts <= p_ts)
        )
        SELECT * FROM matched
        UNION ALL SELECT * FROM unmatched_p
        UNION ALL SELECT * FROM unmatched_v
    """,
    "stream_dedup_within_watermark": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
}
