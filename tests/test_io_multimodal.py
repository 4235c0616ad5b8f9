"""Sources/sinks + multimodal plumbing."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.multimodal.binary_ops import (
    extract_features,
    frame_sample,
    synth_media,
)
from end_to_end_data_engineering_job_listings_etl_spark.sources.readers import (
    JOB_LISTINGS_SCHEMA,
    conform_schema,
    read_json_records,
)
from end_to_end_data_engineering_job_listings_etl_spark.sinks.writers import (
    write_counted,
    write_partitioned_parquet,
)
from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_conform_schema_nullfill_reorder_cast(spark):
    df = spark.createDataFrame(
        [("t1", "ACME corp", "extra")], ["job_title", "employer_name", "junk"]
    )
    out = conform_schema(df, JOB_LISTINGS_SCHEMA)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in JOB_LISTINGS_SCHEMA.fields
    ]
    row = out.collect()[0]
    assert row["job_title"] == "t1" and row["employer_name"] == "ACME corp"
    assert row["job_publisher"] is None and row["ingested_at"] is None
    assert "junk" not in out.columns


def test_read_json_records_shape(spark):
    records = [
        {"job_title": "Data Engineer", "employer_name": "A", "job_is_remote": True},
        {"job_title": "Analyst", "job_country": "US"},
    ]
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(records, f)
        path = f.name
    out = read_json_records(spark, path, JOB_LISTINGS_SCHEMA)
    rows = {r["job_title"]: r for r in out.collect()}
    assert rows["Data Engineer"]["job_is_remote"] is True
    assert rows["Analyst"]["employer_name"] is None
    assert rows["Analyst"]["job_country"] == "US"


def test_partitioned_write_prunes(spark):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_part"
        write_partitioned_parquet(orders, path, ["status"], mode="overwrite")
        pruned = spark.read.parquet(path).filter(F.col("status") == "O")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "status" in plan
        n_direct = spark.read.parquet(f"{path}/status=O").count()
        assert pruned.count() == n_direct > 0


def test_write_counted_single_pass(spark):
    df = load_table(spark, SF_DIR, "nation")
    with tempfile.TemporaryDirectory() as d:
        assert write_counted(df, spark, f"{d}/t") == df.count()


def test_extract_features_deterministic_plumbing(spark):
    media = synth_media(spark, 32).repartition(4)
    feats = extract_features(media)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,sha1:string,"
        "width:int,height:int,feature:array<float>>"
    )
    rows = feats.collect()
    assert len(rows) == 32
    again = {r["media_id"]: r for r in extract_features(media.repartition(2)).collect()}
    for r in rows:
        b = again[r["media_id"]]
        assert (r["sha1"], r["width"], r["height"]) == (b["sha1"], b["width"], b["height"])
        assert r["feature"] == b["feature"]
        assert len(r["feature"]) == 8


def test_frame_sample_offsets(spark):
    media = synth_media(spark, 12)
    frames = frame_sample(media, every_n_bytes=64)
    rows = frames.collect()
    assert len(rows) > 0
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_offset"])
    n_bytes = {r["media_id"]: r["n_bytes"] for r in media.collect()}
    for mid, offs in by_media.items():
        assert offs == sorted(offs)
        assert offs[0] == 0 and offs[-1] <= n_bytes[mid] - 1


def test_resize_stride_semantics(spark):
    import hashlib

    from end_to_end_data_engineering_job_listings_etl_spark.multimodal.binary_ops import (
        _decode,
        resize,
    )

    media = synth_media(spark, 18).repartition(3)
    out = {r["media_id"]: r for r in resize(media, factor=2).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    # images only (kind cycle: image at media_id % 3 == 0)
    assert set(out) == {i for i in range(18) if i % 3 == 0}
    for mid, r in out.items():
        payload = bytes(src[mid]["payload"])
        strided = payload[::2]
        assert r["resized_bytes"] == len(strided)
        assert r["resized_md5"] == hashlib.md5(strided).hexdigest()
        w, h, _ = _decode(payload)
        assert (r["new_width"], r["new_height"]) == (max(w // 2, 1), max(h // 2, 1))


def test_bucketed_join_is_shuffle_free_on_key(spark):
    """The bucketed-warehouse join must be a sort-merge join with NO
    exchange on the join key: the write-time bucketing IS the shuffle,
    paid once. (The aggregate after the join still exchanges on its
    own group key — that one is expected.)"""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.media_stream import sink_bucketed_join
    from tests.conftest import SF_DIR

    df = sink_bucketed_join(spark, SF_DIR)
    df.collect()  # run through AQE so the final plan is real
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "hashpartitioning(o_custkey" not in plan, plan
    assert "hashpartitioning(c_custkey" not in plan, plan


def test_compaction_collapses_file_count(spark):
    """64 fragment files must compact to a handful (byte-budget sized),
    losslessly."""
    import os
    import tempfile

    from end_to_end_data_engineering_job_listings_etl_spark.sinks.writers import compact_parquet
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
    from tests.conftest import SF_DIR

    base = os.path.join(tempfile.gettempdir(), "compact_unit")
    frag, dst = os.path.join(base, "frag"), os.path.join(base, "dst")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    n_out = compact_parquet(spark, frag, dst, target_bytes=256 << 20)
    assert n_frag == 64
    assert n_out == 1  # tiny corpus fits one 256MB-budget file
    a = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
    b = sorted(r["doc_id"] for r in docs.collect())
    assert a == b
