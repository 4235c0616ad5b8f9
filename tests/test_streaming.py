"""Structured Streaming path: batch parity of the windowed rollup."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from end_to_end_data_engineering_job_listings_etl_spark.streaming.watermark import (
    events_stream_dir,
    run_to_memory_sink,
    stream_events,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


def test_streaming_windowed_counts_match_batch(spark):
    streamed = windowed_event_counts(stream_events(spark, events_stream_dir(SF_DIR)))
    with tempfile.TemporaryDirectory() as ckpt:
        run_to_memory_sink(streamed, "stream_counts", ckpt)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_counts").collect()
    }

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    want = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_stateful_running_totals_match_batch(spark):
    import math
    import tempfile

    from end_to_end_data_engineering_job_listings_etl_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(stream_events(spark, events_stream_dir(SF_DIR)))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("user_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    assert len(got) == len(batch) > 0
    for r in batch:
        n, t = got[r["user_id"]]
        assert n == r["n"]
        assert math.isclose(t, r["t"], rel_tol=1e-9)
