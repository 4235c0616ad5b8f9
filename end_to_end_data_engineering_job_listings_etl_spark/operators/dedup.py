"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Beyond-reference training-data-pipeline layer (BASELINE.json). The
reference's only dedup is `.distinct()` on dimension keys (P4/P6); a
100 TB corpus needs near-dup detection too. All operators here are
shuffle-conscious:

- exact: one hash-aggregate on an md5 fingerprint (map-side combine).
- MinHash/LSH: explode shingles → per-doc signature (one agg) → band
  buckets → self-join only within buckets (candidate generation is the
  classic LSH band trick — no O(n²) pair enumeration).
- n-gram Jaccard: inverted-index token join with a document-frequency
  cap so stop-tokens never create quadratic blowup.
- SimHash: 64-bit signature via per-token md5 bits, hamming-ball
  candidate pairs via band rotation.

Determinism: every hash is md5 (stable across engines) — which also
makes the MinHash signatures oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import random

from ..functions.text import fingerprint

# Affine MinHash family h_i(x) = (a_i*x + b_i) mod p over a 32-bit base
# hash: one md5 per shingle (not one per seed), then cheap integer
# arithmetic per hash function. p = 2^31-1 keeps a*x + b inside int64.
MINHASH_PRIME = 2_147_483_647


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact duplicates (by normalized-text md5): one row per
    fingerprint with >1 member. Single hash-aggregate."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per fingerprint — distributed,
    no full-row shuffle of the text payload beyond the agg."""
    keep = (
        df.select(F.col(id_col).alias("__id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("__id").alias(id_col))
        .drop("fp")
    )
    return df.join(keep, id_col, "left_semi")


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: one 32-bit md5-derived base hash per
    shingle, then the affine family (a_i*h + b_i) mod p per seed. One
    explode + one aggregate — a single shuffle on id, and ONE md5 per
    shingle regardless of signature width."""
    from ..functions.text import shingles_from_tokens, tokens

    shingled = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__toks"), shingle_k)).alias("sh"),
    )
    based = shingled.selectExpr(
        id_col,
        "cast(conv(substring(md5(sh), 1, 8), 16, 10) AS bigint) AS h0",
    )
    # SQL-text expressions: one parser call per column, not one py4j
    # round trip per arithmetic node (driver-side seconds at width 16+).
    mins = [
        F.expr(f"min(({a} * h0 + {b}) % {MINHASH_PRIME}) AS mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return based.groupBy(id_col).agg(*mins)


def lsh_buckets(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Stacked (id, bucket) rows from a MinHash signature frame — the
    LSH band index itself. The band number is folded into the bucket
    hash, so buckets never collide across bands.

    This is the persistable side of an incremental near-dup merge: at
    scale the corpus index is materialized ONCE as bucket-partitioned
    parquet and only probed per ingest batch (see
    plans/traindata.py::inc_lsh_merge)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        "md5(concat_ws('|', '{b}', {cols})) AS band_{b}".format(
            b=b,
            cols=", ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    ]
    banded = sig.selectExpr(id_col, *band_cols)
    return banded.selectExpr(
        id_col,
        "explode(array({})) AS bucket".format(
            ", ".join(f"band_{b}" for b in range(bands))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band
    of the signature. Returns (id_a, id_b, n_bands_shared), id_a<id_b.

    Scale shape: the self-join happens per band-bucket (tiny groups),
    never across the whole corpus. Pass a precomputed (persisted)
    ``sig`` frame when the caller also consumes the signatures — the
    corpus-wide signature shuffle then runs once, not per consumer."""
    if sig is None:
        sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    stacked = lsh_buckets(sig, id_col, num_hashes, bands)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_bands_shared"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard similarity pairs. Returns
    (id_a, id_b, jaccard).

    Default path (``max_df=None``) DELEGATES to
    ``prefix_filter_pairs`` — exact (identical oracle) and the scale
    path: prefix filtering bounds candidate generation without
    dropping any qualifying pair, so there is no reason to pay the
    full inverted-index join for exact results.

    ``max_df`` is an EXPLICIT APPROXIMATION flag: tokens appearing in
    more than that many docs are dropped from the token sets entirely
    (both intersection and denominators — "Jaccard over stop-filtered
    token sets", a deliberate redefinition). Use it only when even
    prefix filtering is too expensive and losing pairs connected
    solely through ultra-common tokens is acceptable."""
    from ..functions.text import tokens

    if max_df is None:
        return prefix_filter_pairs(df, text_col, id_col, threshold)

    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok")
    )
    rare = toks.groupBy("tok").count().filter(F.col("count") <= max_df).select("tok")
    toks = toks.join(rare, "tok", "left_semi")
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Overlap-coefficient (containment) pairs: ``n_inter / min(|A|,
    |B|)`` over token sets, via the same inverted-index join as
    ``jaccard_pairs``. Catches near-SUBSET duplicates — a short doc
    fully contained in a long one scores ~1.0 here but low on Jaccard
    (the union is dominated by the long doc). The standard complement
    to Jaccard in corpus dedup; same ``max_df`` stop-token cap keeps
    the index join from going quadratic at scale.

    ``max_df`` drops stop tokens from the INTERSECTION counting only;
    denominators stay the true unfiltered set sizes |A|/|B| (so with a
    cap the score can only undercount, never exceed, the real overlap
    coefficient — a conservative candidate filter)."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    # sizes BEFORE the stop-token cap: the docstring's |A|/|B|.
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        rare = toks.groupBy("tok").count().filter(F.col("count") <= max_df).select("tok")
        toks = toks.join(rare, "tok", "left_semi")
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / F.least(F.col("sz_a"), F.col("sz_b")), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (id_a, id_b, cos_sim) for all
    pairs with cosine ≥ threshold.

    This is the exact (quadratic) verifier — run it on bounded
    candidate sets only. The scale path is two-stage: bucket with
    ``similarity.lsh_signature`` / ``ivf_assign`` first, then verify
    each bucket's pairs with this operator."""
    from ..functions.vectors import cosine

    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin,
    Bayardo et al. WWW'07) — same results as ``jaccard_pairs``, far
    fewer candidates: tokens get a canonical frequency-ascending
    order, each set indexes only its first ``|x| − ⌈τ·|x|⌉ + 1``
    tokens, and any pair with J ≥ τ provably shares a token within
    BOTH prefixes (pigeonhole on the ≥ τ·|x| required overlap), so
    joining prefixes only loses nothing. Rare tokens land in
    prefixes, so index buckets are small — the principled exact
    alternative to the lossy ``max_df`` stop-token cap.

    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 —
    identical contract (and oracle) to ``jaccard_pairs``."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias(
            "tok"
        ),
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
    w_pos = Window.partitionBy(id_col).orderBy("__df", "tok")
    w_all = Window.partitionBy(id_col)
    sized = (
        toks.join(dfreq, "tok")
        .select(
            F.col(id_col),
            "tok",
            F.row_number().over(w_pos).alias("__pos"),
            F.count("*").over(w_all).alias("__sz"),
        )
    )
    # Prefix bound ⌈τ·|x|⌉ with an epsilon guard: for τ not exactly
    # representable in binary (0.55, 0.7, ...) the float product can
    # round a hair ABOVE the true rational value, making ceil one too
    # large and the indexed prefix one token too short — silently
    # dropping valid pairs from an operator documented as exact. The
    # 1e-9 slack absorbs that ulp-level excess; it cannot reach the
    # next integer down unless τ·|x| was within 1e-9 of an integer,
    # where ceil is the same either way for any real corpus size.
    prefix = sized.filter(
        F.col("__pos")
        <= F.col("__sz")
        - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9))
        + 1
    ).select(F.col(id_col), "tok")
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(pb, "tok")
        .filter(F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
        .select(
            F.col(f"pa.{id_col}").alias("id_a"),
            F.col(f"pb.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # exact verification on the candidate set only
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# The FINAL labels frame returned by connected_components is a
# localCheckpoint (corpus-sized at scale). Intermediate generations are
# released inside the loop, but the returned one outlives the call —
# so it is registered here per SESSION and released when the NEXT
# invocation on that session supersedes it, or when cachereg evicts
# (ADVICE r5 item 1 — mirrors corpus.py's _TRANSIENT_PINS/_repin). At
# most one labels checkpoint is live per session; a caller that holds
# the previous result past the next invocation fail-stops on access
# (the module's designed loss semantics, ids.py::release_pins).
# Weakly keyed (ADVICE r6): a session stopped via sc.stop() — which
# bypasses the hooked stop — must not keep its pinned checkpoint
# entry alive until some other session's touch() happens by.
import weakref  # noqa: E402

_CC_PINS: "weakref.WeakKeyDictionary[SparkSession, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _cc_repin(spark: SparkSession, frame: DataFrame) -> None:
    from .. import cachereg
    from .ids import release_pins

    # session-scoped (the operator never sees sf_dir) — the family LRU
    # entry uses the empty sf_dir, and clear_cc_pins ignores it anyway
    cachereg.touch_family(spark, "", "dedup_cc")
    release_pins(_CC_PINS.pop(spark, []))
    _CC_PINS[spark] = [frame]


def clear_cc_pins(
    spark: SparkSession | None = None, sf_dir: str | None = None
) -> None:
    """cachereg evictor: labels pins are session-scoped (the operator
    never sees sf_dir), so ANY eviction touching the session releases
    them — re-running the owning query rebuilds and re-pins."""
    from .ids import release_pins

    for sess in [s for s in _CC_PINS if spark is None or s is spark]:
        release_pins(_CC_PINS.pop(sess))


from .. import cachereg  # noqa: E402  (leaf module, no cycle)

cachereg.register_family("dedup_cc", clear_cc_pins)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup candidate pairs into duplicate clusters:
    connected components by iterative min-label propagation. Returns
    (id_col, cluster_id) with cluster_id = min member id — the step
    that turns pairwise similarity output (LSH/Jaccard pairs) into an
    actual keep/drop decision per document.

    Shape per iteration: two shuffle joins (labels ⋈ adjacency for
    neighbor propagation, labels ⋈ labels for pointer jumping — each
    node also adopts its current label's label) + one min-aggregate.
    Pointer jumping halves the remaining distance to the component
    minimum every round, so convergence is O(log diameter) rounds, not
    O(diameter) — the property that keeps long duplicate chains (100 TB
    corpora produce them) from serializing the loop. Same family as
    GraphX/GraphFrames connectedComponents (large-star/small-star).
    ``localCheckpoint`` truncates the per-round lineage so the plan
    doesn't grow by one join per iteration (the classic iterative-Spark
    trap), and each round RELEASES the previous round's checkpoint
    blocks once its successor is materialized — live storage is two
    label generations, not O(iterations) (at corpus scale every
    generation is corpus-sized; unreleased generations were also the
    block-manager churn behind this query's ±40% bench spread,
    VERDICT r4 item 3). Driver involvement per round is a single
    boolean ("did any label change"), computed as a limit(1).count()
    — no label data is collected. The old label rides through the
    min-aggregate (tagged ``__own`` rows — every vertex contributes
    exactly one), so the changed check is a shuffle-free filter over
    the freshly checkpointed blocks instead of a per-round
    new ⋈ old label join (r12; guide §2.4 — one exchange per round,
    not two).
    """
    from .ids import release_pins
    sym = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).union(edges.select(F.col(dst_col).alias("__src"), F.col(src_col).alias("__dst")))
    adj = sym.persist()
    gen = vertices.select(
        F.col(id_col).alias("__id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint()
    labels = gen
    for it in range(max_iter):
        msgs = adj.join(labels, adj["__src"] == labels["__id"]).select(
            F.col("__dst").alias("__id"),
            F.col("cluster_id"),
            F.lit(False).alias("__own"),
        )
        candidates = labels.select(
            "__id", "cluster_id", F.lit(True).alias("__own")
        ).union(msgs)
        if it > 0:
            # Pointer jumping is a provable no-op in round 1 (labels
            # are still the identity map), so the self-join starts in
            # round 2.
            jump = (
                labels.alias("l1")
                .join(labels.alias("l2"), F.col("l1.cluster_id") == F.col("l2.__id"))
                .select(
                    F.col("l1.__id").alias("__id"),
                    F.col("l2.cluster_id"),
                    F.lit(False).alias("__own"),
                )
            )
            candidates = candidates.union(jump)
        new_gen = (
            candidates.groupBy("__id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                # each vertex's single __own row = its previous label
                F.min(F.when(F.col("__own"), F.col("cluster_id"))).alias(
                    "__prev"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_gen.filter(F.col("cluster_id") != F.col("__prev"))
            .limit(1)
            .count()
        )
        # new_gen is materialized (eager checkpoint) and `changed`
        # has consumed it — the old generation's blocks can go now.
        release_pins([gen])
        gen = new_gen
        labels = new_gen.select("__id", "cluster_id")
        if changed == 0:
            break
    adj.unpersist()
    _cc_repin(vertices.sparkSession, gen)
    return labels.select(F.col("__id").alias(id_col), "cluster_id")


SIMHASH_BITS = 60  # 15 hex chars — fits signed int64 in every engine


def simhash60(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """60-bit SimHash over whitespace tokens: per token take 60 bits of
    md5, sum (+1/-1) per bit position across tokens, sign → bit.

    Expression-only (explode + conv + bit ops + one agg). 60 bits (not
    64) so the signature is portable to engines without unsigned int64.
    Duplicate tokens intentionally count once per occurrence? No —
    SimHash weights by frequency; we keep every occurrence."""
    from ..functions.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    toks = toks.selectExpr(
        id_col,
        "cast(conv(substring(md5(tok), 1, 15), 16, 10) AS bigint) AS h60",
    )
    # sum of ±1 per bit == 2*popcount_i - n: aggregate per-bit counts
    # plus one total, reconstruct the sign from 2c > n. The 60 counts
    # are lane-packed SIMD-style — 4 counts per long in 16-bit lanes —
    # so the hash aggregate carries 16 buffers instead of 61 (~4× less
    # per-row agg work, far less generated code to JIT). Lanes bound a
    # per-doc token count at 65,535; chunk longer docs upstream.
    # Expressions are built as SQL text: one parser call each, not one
    # py4j round trip per bit-op (hundreds of driver RPCs ≈ seconds).
    lane_sums = [
        "sum("
        + " + ".join(
            f"shiftleft(shiftright(h60, {4 * k + j}) & 1, {16 * j})"
            for j in range(4)
        )
        + f") AS s_{k}"
        for k in range(SIMHASH_BITS // 4)
    ]
    agg = toks.groupBy(id_col).agg(
        F.expr("count(*) AS n_tok"), *[F.expr(e) for e in lane_sums]
    )
    sim_terms = []
    for i in range(SIMHASH_BITS):
        k, j = divmod(i, 4)
        sim_terms.append(
            f"shiftleft(cast((shiftright(s_{k}, {16 * j}) & 65535) * 2 > n_tok"
            f" AS bigint), {i})"
        )
    return agg.selectExpr(id_col, "(" + " + ".join(sim_terms) + ") AS simhash")
