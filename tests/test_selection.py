"""Round-6 selection/eval layer (DSIR resampling, Gopher rules, ANN
recall harness, audio windowing) vs DuckDB oracle, plus invariants
the hash can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.plans import selection
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(selection.QUERIES))
def test_selection_matches_oracle(spark, duck, name):
    compare(
        selection.QUERIES[name](spark, SF_DIR), duck, selection.ORACLES[name], name
    )


def test_dsir_selects_topk_toward_target(spark):
    """Selection is exactly _DSIR_TOPK rows (or the corpus if smaller),
    scores positive, and the selected docs skew toward the target
    slice relative to the corpus base rate — the one property DSIR
    exists to deliver."""
    rows = selection.samp_dsir_select(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    n_docs = docs.count()
    assert len(rows) == min(selection._DSIR_TOPK, n_docs)
    assert all(r["n_feats"] > 0 for r in rows)
    scores = [r["score_e6"] for r in rows]
    assert len(set(scores)) > 1  # a real spread, not a constant
    sel_ids = [r["doc_id"] for r in rows]
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    base_rate = sum(1 for v in langs.values() if v == "en") / n_docs
    sel_rate = sum(1 for i in sel_ids if langs[i] == "en") / len(sel_ids)
    assert sel_rate > base_rate


def test_gopher_every_rule_fires_and_keep_is_conjunction(spark):
    df = selection.text_gopher_rules(spark, SF_DIR)
    flags = [c for c in df.columns if c.startswith("pass_")]
    agg = df.agg(
        F.count("*").alias("n"),
        *[F.sum(F.col(c).cast("int")).alias(c) for c in flags],
    ).collect()[0]
    # every rule must discriminate: some pass, some fail (the
    # deterministic markup dirt guarantees the line/symbol rules fire)
    for c in ("pass_symbol_ratio", "pass_bullet_lines", "pass_ellipsis_lines"):
        assert 0 < agg[c] < agg["n"], c
    bad = df.filter(
        F.col("keep")
        != (
            F.col("pass_word_count")
            & F.col("pass_mean_word_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_bullet_lines")
            & F.col("pass_ellipsis_lines")
            & F.col("pass_alpha_words")
            & F.col("pass_stopwords")
        )
    ).count()
    assert bad == 0


def test_ann_recall_bounded_and_candidates_sublinear(spark):
    """recall_e6 in [0, 1e6]; n_hit <= k; the nprobe=2 candidate set
    must be a strict subset of the corpus (the whole point of IVF)."""
    rows = selection.ev_ann_recall(spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == len(selection._ANN_PROBE_IDS)
    for r in rows:
        assert 0 <= r["n_hit"] <= selection._ANN_K
        assert r["recall_e6"] == r["n_hit"] * (1_000_000 // selection._ANN_K)
        assert 0 < r["n_cand"] < n_vecs


def test_c4_rules_discriminate_and_keep_is_consistent(spark):
    df = selection.text_c4_filters(spark, SF_DIR).cache()
    try:
        n = df.count()
        # every planted page-level hazard occurs somewhere and not everywhere
        for c in ("has_lorem", "has_brace", "has_badword"):
            k = df.filter(F.col(c)).count()
            assert 0 < k < n, c
        # every doc carries the short + no-punct planted lines, so the
        # line rules always drop something: kept < total lines
        assert df.filter(F.col("n_kept") >= F.col("n_lines")).count() == 0
        # the javascript line is dropped at the LINE level: a js-planted
        # doc (7|doc_id, no other page hazard) can still be kept
        kept_js = df.filter(
            (F.col("doc_id") % 7 == 0) & F.col("keep")
        ).count()
        assert kept_js > 0
        bad = df.filter(
            F.col("keep")
            != (
                (F.col("n_kept") >= selection._C4_MIN_SENTENCES)
                & ~F.col("has_lorem")
                & ~F.col("has_brace")
                & ~F.col("has_badword")
            )
        ).count()
        assert bad == 0
    finally:
        df.unpersist()


def test_mmr_rank1_is_top_relevance_and_output_bounded(spark):
    """Rank 1 must be the plain argmax of relevance (MMR's first pick
    has no diversity term); all picks come from the top-20 pool; ranks
    are exactly 1..k."""
    from pyspark.sql import functions as SF

    out = selection.rag_mmr_rerank(spark, SF_DIR).collect()
    assert [r["mmr_rank"] for r in out] == list(range(1, selection._MMR_K + 1))
    assert len({r["vec_id"] for r in out}) == len(out)

    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table_dist
    from end_to_end_data_engineering_job_listings_etl_spark.functions.vectors import cosine, lit_vector
    from end_to_end_data_engineering_job_listings_etl_spark.plans.corpus import _query_vec

    q = _query_vec(spark, SF_DIR, 0)
    emb = load_table_dist(spark, SF_DIR, "embeddings", cols=("vec_id", "embedding"))
    pool = (
        emb.filter(SF.col("vec_id") != 0)
        .select(
            "vec_id",
            SF.floor(
                cosine(SF.col("embedding").cast("array<double>"), lit_vector(q))
                * 1_000_000
            )
            .cast("long")
            .alias("rel_e6"),
        )
        .orderBy(SF.desc("rel_e6"), SF.asc("vec_id"))
        .limit(selection._MMR_POOL)
        .collect()
    )
    pool_ids = [r["vec_id"] for r in pool]
    assert out[0]["vec_id"] == pool_ids[0]
    assert all(r["vec_id"] in set(pool_ids) for r in out)
    # the engine-sourced rel_e6 must agree with the independent scan
    rel = {r["vec_id"]: r["rel_e6"] for r in pool}
    assert all(r["rel_e6"] == rel[r["vec_id"]] for r in out)


def test_soft_dedup_unit_mass_per_content_item(spark):
    """Every duplicate group's members share n_dup and weight; group
    mass sums to ~1e6 (exactly when 1e6 divides evenly); unique docs
    weigh exactly 1e6; the fixture's exact duplicates make n_dup > 1
    occur."""
    rows = selection.dd_soft_dedup_weights(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        assert r["w_e6"] == 1_000_000 // r["n_dup"]
        if r["n_dup"] == 1:
            assert r["w_e6"] == 1_000_000
    # sf0.001's 500 docs are all content-distinct; sf0.1 carries real
    # exact duplicates — the down-weighting must actually fire there
    dup = (
        selection.dd_soft_dedup_weights(spark, "/root/testdata/sf0.1")
        .filter(F.col("n_dup") > 1)
        .count()
    )
    assert dup > 0


def test_boilerplate_strips_planted_lines_not_body_text(spark):
    """Docs with 6|doc_id carry both planted boilerplate lines (both
    cross the df threshold); document body lines are corpus-unique at
    this SF so they are never stripped; clean_md5 of an untouched doc
    equals md5 of its original text."""
    import hashlib

    rows = {
        r["doc_id"]: r
        for r in selection.text_boilerplate_lines(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(rows) == len(docs)
    for d in docs:
        r = rows[d["doc_id"]]
        want_boiler = (d["doc_id"] % 2 == 0) + (d["doc_id"] % 3 == 0)
        assert r["n_boiler"] == want_boiler, d["doc_id"]
        assert r["n_lines"] == 1 + want_boiler
        # body text survives: cleaned text == original single line
        assert r["clean_md5"] == hashlib.md5(d["text"].encode()).hexdigest()


def test_digest_agrees_with_strict(spark, duck):
    """The engine-side digest gate (tests/oracle_check.py::
    digest_compare, used by sweep_all above the row threshold) must
    agree with the strict collect-everything compare on live queries
    covering every type it admits — and must FAIL when the two sides
    genuinely differ."""
    from end_to_end_data_engineering_job_listings_etl_spark.registry import (
        all_oracles,
        all_queries,
    )
    from tests.oracle_check import digest_compare

    qs, oracles = all_queries(), all_oracles()
    # strings+longs+booleans (c4), dates+ints (dim_date), timestamps
    # (session windows), plain star strings (bi_top15_employers)
    names = [
        "text_c4_filters",
        "dim_date",
        "agg_session_window_batch",
        "bi_top15_employers",
        "inc_scd2_status",  # timestamp_ntz validity interval columns
    ]
    seen = set()
    for n in names:
        df = qs[n](spark, SF_DIR)
        seen |= {f.dataType.typeName() for f in df.schema.fields}
        compare(df, duck, oracles[n], n)  # strict green...
        digest_compare(df, duck, oracles[n], n)  # ...implies digest green
    # byte/short: no registered query emits them, so cross-validate
    # their renderings on a constructed frame (negatives, extremes,
    # nulls) against DuckDB TINYINT/SMALLINT literals — together with
    # the live queries above this covers EVERY type _DIGEST_TYPES
    # admits (ADVICE r6 item 3)
    from pyspark.sql import types as PT
    from tests.oracle_check import _DIGEST_TYPES

    probe = spark.createDataFrame(
        [(-128, -32768), (127, 32767), (None, None), (7, 7)],
        PT.StructType(
            [
                PT.StructField("b", PT.ByteType()),
                PT.StructField("s", PT.ShortType()),
            ]
        ),
    )
    digest_compare(
        probe,
        duck,
        "SELECT * FROM (VALUES"
        " (CAST(-128 AS TINYINT), CAST(-32768 AS SMALLINT)),"
        " (CAST(127 AS TINYINT), CAST(32767 AS SMALLINT)),"
        " (CAST(NULL AS TINYINT), CAST(NULL AS SMALLINT)),"
        " (CAST(7 AS TINYINT), CAST(7 AS SMALLINT))) t(b, s)",
        "digest-byte-short-probe",
    )
    seen |= {"byte", "short"}
    assert set(_DIGEST_TYPES) <= seen
    # arrays of digest-safe scalars: constructed probe covering NULL
    # array vs empty array vs NULL element vs separator-free strings —
    # the canonicalization (size prefix + chr(30) join) must agree
    # across engines, and a live array query must strict==digest
    arr_probe = spark.createDataFrame(
        [
            (["a", None, "NULL"], [1, None]),
            ([], []),
            (None, None),
            (["x"], [42]),
        ],
        PT.StructType(
            [
                PT.StructField("sa", PT.ArrayType(PT.StringType())),
                PT.StructField("la", PT.ArrayType(PT.LongType())),
            ]
        ),
    )
    digest_compare(
        arr_probe,
        duck,
        "SELECT * FROM (VALUES"
        " (['a', NULL, 'NULL'], [CAST(1 AS BIGINT), NULL]),"
        " ([], []),"
        " (CAST(NULL AS VARCHAR[]), CAST(NULL AS BIGINT[])),"
        " (['x'], [CAST(42 AS BIGINT)])) t(sa, la)",
        "digest-array-probe",
    )
    n = "fn_parse_string_array"
    if n in qs and n in oracles:
        df = qs[n](spark, SF_DIR)
        if any(f.dataType.typeName() == "array" for f in df.schema.fields):
            compare(df, duck, oracles[n], n)
            digest_compare(df, duck, oracles[n], n)
    # a genuine value difference must trip the digest
    with pytest.raises(AssertionError):
        digest_compare(
            qs["bi_top15_employers"](spark, SF_DIR),
            duck,
            oracles["bi_top15_employers"].replace("15", "14", 1),
            "digest-mismatch-probe",
        )
    # doubles canonicalize through floor(x*1e6) — one IEEE-754 multiply
    # + exact floor, identical on both engines for identical bits:
    # constructed probe (money 2dp, accumulated-error value, negatives,
    # NaN, NULL, huge) plus a live double query strict==digest
    dbl_probe = spark.createDataFrame(
        [(123456.78,), (0.1 + 0.2,), (-9.999999,), (float("nan"),), (None,), (9e12,)],
        PT.StructType([PT.StructField("d", PT.DoubleType())]),
    )
    digest_compare(
        dbl_probe,
        duck,
        "SELECT * FROM (VALUES (CAST(123456.78 AS DOUBLE)), (0.1 + 0.2),"
        " (CAST(-9.999999 AS DOUBLE)), (CAST('nan' AS DOUBLE)),"
        " (CAST(NULL AS DOUBLE)), (CAST(9e12 AS DOUBLE))) t(d)",
        "digest-double-probe",
    )
    df = qs["sim_cosine_topk"](spark, SF_DIR)  # double cos_sim column
    compare(df, duck, oracles["sim_cosine_topk"], "sim_cosine_topk")
    digest_compare(df, duck, oracles["sim_cosine_topk"], "sim_cosine_topk")
    # a COLUMN mismatch must report cleanly ("columns differ"), not die
    # in a DuckDB binder error from the digest SQL referencing a Spark
    # column the oracle lacks (ADVICE r10 #4 — the check must gate
    # BEFORE the digest query is built)
    with pytest.raises(AssertionError, match="columns differ"):
        digest_compare(
            dbl_probe.withColumnRenamed("d", "spark_only_name"),
            duck,
            "SELECT CAST(1.5 AS DOUBLE) AS d",
            "digest-colname-probe",
        )
    # unsupported types refuse loudly instead of hashing engine-variant
    # renderings
    with pytest.raises(ValueError):
        digest_compare(
            spark.createDataFrame(
                [(__import__("decimal").Decimal("1.23"),)],
                PT.StructType([PT.StructField("m", PT.DecimalType(10, 2))]),
            ),
            duck,
            "SELECT CAST(1.23 AS DECIMAL(10,2)) AS m",
            "digest-type-probe",
        )


def test_audio_windows_shape_and_bounds(spark):
    """8 windows per audio payload (128 bytes / 16), energy equals the
    sum of squared deviations of md5-hex ASCII codes — bounded by the
    hex alphabet's worst case — and peak <= 32 ('0' -> |48-80|)."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.media_stream import (
        media_from_documents,
    )

    df = selection.mm_audio_energy_checked(spark, SF_DIR)
    rows = df.collect()
    n_audio = (
        media_from_documents(spark, SF_DIR).filter(F.col("kind") == "audio").count()
    )
    assert len(rows) == 8 * n_audio
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], set()).add(r["win_idx"])
        assert 0 <= r["peak"] <= 32
        assert 0 <= r["energy"] <= 16 * 32 * 32
    assert all(wins == set(range(8)) for wins in per_media.values())
