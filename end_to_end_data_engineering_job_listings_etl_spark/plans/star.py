"""The star-schema build pipeline, mapped onto the driver's synthetic
tables (FIXTURES.md mapping).

Reference analog: ``dags/spark_etl_script.py:41-192`` — the analytical
core. Domain mapping (reference → synthetic):

- landing.job_listings → ``orders`` enriched with ``customer`` /
  ``nation`` / ``region`` attributes
- DIM_COMPANY   (trim+upper employer)   → dim_company over ``c_name``
- DIM_PUBLISHER (trim+initcap)          → dim_segment over ``c_mktsegment``
- DIM_EMPLOYMENT_TYPE (trim+initcap)    → dim_priority over ``o_orderpriority``
- DIM_LOCATION  (multi-col distinct)    → dim_location over (n_name, r_name)
- DIM_DATE      (yyyyMMdd sk + attrs)   → dim_date over ``o_orderdate``
- DIM_SKILL     (keyword explode)       → dim_keyword over ``documents.text``
- FACT_JOB_POSTINGS (left-join chain)   → fact_orders
- BRIDGE_JOB_SKILL                      → bridge_doc_keyword

Every query here has a colocated DuckDB oracle (ORACLES) sharing the
same CTE text, so Spark results hash-match ANSI SQL exactly.

Scale notes: dims are broadcast at assembly (they are distincts of
low-cardinality keys); the landing enrichment joins broadcast the
customer/nation/region side (at true 100 TB the customer join flips to
sort-merge automatically when it exceeds the broadcast threshold — the
code does not pin it). Surrogate keys default to the range/two-phase
``row_number`` (``operators.ids`` — reference-exact values, no
single-partition window); ``build_dim(mode="global")`` remains the
literal one-partition reference plan, opt-in (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_dist
from ..functions.dates import date_attributes
from ..functions.keywords import DEFAULT_KEYWORDS, extract_keywords
from ..functions.normalize import norm_initcap, norm_upper
from ..operators.dims import build_dim, build_dims_batched
from ..operators.fact import join_dim
from ..operators.ids import ranked_ids

# ---------------------------------------------------------------------------
# Spark builders
# ---------------------------------------------------------------------------


_LANDING_CACHE: dict[tuple[SparkSession, str], DataFrame] = {}
_PLAN_CACHE: dict[tuple[str, SparkSession, str], DataFrame] = {}


def _memo_persist(fn):
    """Memoize + persist a builder per (session, sf_dir): the BI
    surface re-derives dims and the star view for every query — with
    the memo they materialize once per session and every later query
    starts from InMemoryTableScan (the reference's 8× .cache() at the
    same cut points, ``dags/spark_etl_script.py:146-153``)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .. import cachereg

        cachereg.touch_family(spark, sf_dir, "star")
        key = (fn.__name__, spark, sf_dir)
        hit = _PLAN_CACHE.get(key)
        if hit is None:
            hit = fn(spark, sf_dir).persist()
            _PLAN_CACHE[key] = hit
        return hit

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'landing.job_listings' analog: orders + customer + geo
    attributes (reference S5 scan, ``dags/spark_etl_script.py:65-72``).

    Cached per (session, sf_dir): the star plan references landing from
    every dimension subtree AND the fact base — without a shared
    InMemoryRelation, one fact build scans orders/customer six times
    (the reference hit the same issue and caches eight frames,
    ``dags/spark_etl_script.py:146-153``; this is its Spark-idiomatic
    form — reuse the same cached plan object so even a single action
    computes the landing join once)."""
    from .. import cachereg

    cachereg.touch_family(spark, sf_dir, "star")
    key = (spark, sf_dir)
    cached = _LANDING_CACHE.get(key)
    if cached is not None:
        return cached
    # orders through the parallel loader: a single-row-group file scans
    # as ONE task, and a persist inherits that single partition — every
    # dim build and the fact join would then run single-threaded off
    # the cache. load_table_dist pre-spreads narrow scans; on big
    # inputs (many row groups) it is a plain load_table.
    orders = load_table_dist(spark, sf_dir, "orders", persist=False)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    df = (
        # customer is O(SF) — 1.5k rows at sf0.01, 15B at 100 TB — so
        # the join strategy is left to Catalyst's size estimate + AQE
        # (broadcast while it fits, shuffle join past the threshold);
        # nation (25) and region (5) are schema-bounded and keep the
        # explicit hint.
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            orders["*"],
            customer["c_name"],
            customer["c_mktsegment"],
            nation["n_name"],
            region["r_name"],
        )
        .persist()
    )
    _LANDING_CACHE[key] = df
    return df


def _dims_bundle(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All ranked dims in ONE batched pass (operators.dims.
    build_dims_batched): tagged union of every dim's normalized keys →
    one distinct → one grouped two-phase rank, instead of a
    distinct+rank pipeline per dim — 2 landing-wide shuffles for the
    whole dim layer. Values identical to per-dim build_dim
    (mode-equivalence locked in tests/test_edges.py); each registered
    dim query serves its slice."""
    from .. import cachereg

    cachereg.touch_family(spark, sf_dir, "star")
    key = (spark, sf_dir)
    hit = _DIMS_BUNDLE_CACHE.get(key)
    if hit is None:
        l = landing(spark, sf_dir)
        shared: list[DataFrame] = []
        hit = build_dims_batched(
            shared_out=shared,
            specs=[
                (
                    "company",
                    l,
                    [norm_upper("c_name").alias("employer_name")],
                    "company_sk",
                ),
                (
                    "segment",
                    l,
                    [norm_initcap("c_mktsegment").alias("segment_name")],
                    "segment_sk",
                ),
                (
                    "priority",
                    l,
                    [norm_initcap("o_orderpriority").alias("priority_name")],
                    "priority_sk",
                ),
                (
                    "location",
                    l,
                    [
                        F.col("n_name").alias("nation_name"),
                        F.col("r_name").alias("region_name"),
                    ],
                    "location_sk",
                ),
                (
                    "keyword",
                    doc_keywords(spark, sf_dir),
                    [norm_initcap("keyword_raw").alias("keyword_name")],
                    "keyword_sk",
                ),
            ]
        )
        _DIMS_BUNDLE_CACHE[key] = hit
        _DIMS_SHARED[key] = shared
    return hit


_DIMS_BUNDLE_CACHE: dict[tuple[SparkSession, str], dict[str, DataFrame]] = {}
_DIMS_SHARED: dict[tuple[SparkSession, str], list[DataFrame]] = {}
# localCheckpoint frames pinned by the fact PK's two-phase rank, per
# (session, sf_dir) — released (RDD-level) on eviction
_STAR_PINNED: dict[tuple[SparkSession, str], list[DataFrame]] = {}


def clear_caches(
    spark: SparkSession | None = None, sf_dir: str | None = None
) -> None:
    """Evict this module's per-(session, sf_dir) memo caches and
    unpersist every frame they pinned (landing, the star-plan memos,
    and the dims bundle's shared ranked frame). Either axis may be
    ``None`` (wildcard); registered with ``cachereg`` so a session's
    LRU dataset cap and its stop hook evict automatically — a
    long-lived multi-dataset process no longer has to know to call
    this (VERDICT r4 item 4)."""

    def _match(k_spark: SparkSession, k_sf: str) -> bool:
        return (spark is None or k_spark is spark) and (
            sf_dir is None or k_sf == sf_dir
        )

    from ..operators.ids import release_pins

    for key in [k for k in _LANDING_CACHE if _match(k[0], k[1])]:
        _LANDING_CACHE.pop(key).unpersist()
    for key in [k for k in _PLAN_CACHE if _match(k[1], k[2])]:
        _PLAN_CACHE.pop(key).unpersist()
    for key in [k for k in _DIMS_BUNDLE_CACHE if _match(k[0], k[1])]:
        _DIMS_BUNDLE_CACHE.pop(key)
        release_pins(_DIMS_SHARED.pop(key, []))
    for key in [k for k in _STAR_PINNED if _match(k[0], k[1])]:
        release_pins(_STAR_PINNED.pop(key))


from .. import cachereg  # noqa: E402  (leaf module, no cycle)

cachereg.register_family("star", clear_caches)


@_memo_persist
def dim_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_COMPANY analog (``dags/spark_etl_script.py:92-95``)."""
    return _dims_bundle(spark, sf_dir)["company"]


@_memo_persist
def dim_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_PUBLISHER analog — trim+initcap (``:97-100``)."""
    return _dims_bundle(spark, sf_dir)["segment"]


@_memo_persist
def dim_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_EMPLOYMENT_TYPE analog — trim+initcap (``:102-105``)."""
    return _dims_bundle(spark, sf_dir)["priority"]


@_memo_persist
def dim_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_LOCATION analog — multi-column distinct (``:107-110``)."""
    return _dims_bundle(spark, sf_dir)["location"]


@_memo_persist
def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_DATE analog — calendar attributes (``:112-120``). SK is the
    yyyyMMdd int itself (not a row_number), reference-exact."""
    return (
        landing(spark, sf_dir)
        .select(*date_attributes("o_orderdate"))
        .filter(F.col("full_date").isNotNull())
        .distinct()
    )


def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document extracted keyword set (skills analog, §2.10) then
    exploded — E1 + P3 empty-filter."""
    docs = load_table_dist(spark, sf_dir, "documents", cols=("doc_id", "text"))
    return (
        docs.select(
            "doc_id", F.explode(extract_keywords("text")).alias("keyword_raw")
        )
        .filter(F.col("keyword_raw") != "")
    )


@_memo_persist
def dim_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM_SKILL analog (``:141-144``)."""
    return _dims_bundle(spark, sf_dir)["keyword"]


def fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FACT analog: left-join chain on normalized expressions + derived
    date, fact PK, lit(1) measure (``:157-173``)."""
    return star_wide(spark, sf_dir).select(
        "order_pk",
        "o_orderkey",
        "company_sk",
        "segment_sk",
        "priority_sk",
        "location_sk",
        "date_sk",
        "o_totalprice",
        "order_count",
    )


@_memo_persist
def star_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact join-chain keeping both SKs and dimension names — this
    is simultaneously the fact builder (project SKs) and the BI star
    view V1/V2 (project names): one plan, two consumers."""
    base = landing(spark, sf_dir)
    dc = dim_company(spark, sf_dir)
    ds = dim_segment(spark, sf_dir)
    dp = dim_priority(spark, sf_dir)
    dl = dim_location(spark, sf_dir)
    dd = dim_date(spark, sf_dir)

    enriched = base.select(
        "*",
        norm_upper("c_name").alias("__emp"),
        norm_initcap("c_mktsegment").alias("__seg"),
        norm_initcap("o_orderpriority").alias("__prio"),
        F.to_date("o_orderdate").alias("__odate"),
    )
    # dc (employers) scales with |customers| — O(data), never pinned
    # to broadcast; Catalyst/AQE broadcast it while it fits and flip
    # to shuffle join past the threshold. The bounded-domain dims
    # (segment 5, priority 5, location 25, calendar dates) keep the
    # explicit hint: their size is a property of the SCHEMA, not the
    # data volume.
    j = enriched.join(dc, enriched["__emp"] == dc["employer_name"], "left")
    j = j.join(F.broadcast(ds), j["__seg"] == ds["segment_name"], "left")
    j = j.join(F.broadcast(dp), j["__prio"] == dp["priority_name"], "left")
    j = j.join(
        F.broadcast(dl),
        (j["n_name"] == dl["nation_name"]) & (j["r_name"] == dl["region_name"]),
        "left",
    )
    j = j.join(F.broadcast(dd), j["__odate"] == dd["full_date"], "left")
    # order_pk = row_number over o_orderkey, but computed on a narrow
    # single-column projection with the range/two-phase plan
    # (operators.ids.ranked_ids — no single-partition window anywhere)
    # and joined back 1:1 on the unique key: the wide join output
    # never funnels, and neither do the keys. Same values as a global
    # window over the joined frame (the oracle's row_number() OVER
    # (ORDER BY o_orderkey)). The keymap has ONE ROW PER ORDER — a
    # fact-scale frame — so it is never broadcast-pinned (a pinned
    # 15M-row build OOMed the sf10 gate); AQE still converts the join
    # at small SFs where the map genuinely fits.
    keymap = ranked_ids(
        base.select("o_orderkey"),
        ["o_orderkey"],
        "order_pk",
        # pin_input=True (r13, VERDICT r12 ask #2): r12 set this False
        # ("the upstream is the persisted landing, skip the input
        # checkpoint") and jl_fact_checked regressed ~13% in BOTH the
        # builder's and the driver's r12 runs. r13 A/B of exactly this
        # flag (5 cold matched-subset passes per side, medians):
        # pin_input=True wins jl_fact_checked 5.71 vs 5.91 s AND
        # fact_orders 5.05 vs 5.55 s — the r12 fact_orders win from
        # False did not reproduce. Reading the narrow o_orderkey
        # projection from the checkpoint twice (sampling + exchange)
        # beats scanning the WIDE persisted landing twice: the
        # checkpoint holds one slim column, the landing cache holds
        # every enrichment column.
        pin_input=True,
        # checkpoint ownership: released with the rest of this
        # (session, sf_dir)'s pinned frames on eviction
        pinned_out=_STAR_PINNED.setdefault((spark, sf_dir), []),
    )
    j = j.join(keymap, "o_orderkey")
    return j.select(
        F.col("order_pk"),
        "o_orderkey",
        "company_sk",
        "employer_name",
        "segment_sk",
        "segment_name",
        "priority_sk",
        "priority_name",
        "location_sk",
        "nation_name",
        "region_name",
        "date_sk",
        "full_date",
        "month_name",
        "month_number",
        "quarter_number",
        "year_number",
        "o_totalprice",
        F.lit(1).alias("order_count"),
    )


def bridge_doc_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIDGE analog: exploded keywords ⋈ dim → distinct pairs
    (``:175-179``)."""
    dk = dim_keyword(spark, sf_dir)
    kw = doc_keywords(spark, sf_dir).select(
        "doc_id", norm_initcap("keyword_raw").alias("keyword_name")
    )
    return (
        kw.join(F.broadcast(dk), "keyword_name")
        .select("doc_id", "keyword_sk")
        .distinct()
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (shared CTE text)
# ---------------------------------------------------------------------------

# DuckDB (v1.0) has no initcap; emulate Spark's whitespace-word initcap.
def _initcap(expr: str) -> str:
    return (
        "array_to_string(list_transform(string_split({e}, ' '), "
        "w -> upper(w[1]) || lower(w[2:])), ' ')"
    ).format(e=expr)


LANDING_CTE = """
landing AS (
  SELECT o.*, c.c_name, c.c_mktsegment, n.n_name, r.r_name
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)"""

DIM_COMPANY_CTE = """
dim_company AS (
  SELECT CAST(row_number() OVER (ORDER BY employer_name) AS INTEGER) AS company_sk,
         employer_name
  FROM (SELECT DISTINCT trim(upper(c_name)) AS employer_name FROM landing)
  WHERE employer_name IS NOT NULL
)"""

DIM_SEGMENT_CTE = f"""
dim_segment AS (
  SELECT CAST(row_number() OVER (ORDER BY segment_name) AS INTEGER) AS segment_sk,
         segment_name
  FROM (SELECT DISTINCT trim({_initcap('c_mktsegment')}) AS segment_name FROM landing)
  WHERE segment_name IS NOT NULL
)"""

DIM_PRIORITY_CTE = f"""
dim_priority AS (
  SELECT CAST(row_number() OVER (ORDER BY priority_name) AS INTEGER) AS priority_sk,
         priority_name
  FROM (SELECT DISTINCT trim({_initcap('o_orderpriority')}) AS priority_name FROM landing)
  WHERE priority_name IS NOT NULL
)"""

DIM_LOCATION_CTE = """
dim_location AS (
  SELECT CAST(row_number() OVER (ORDER BY nation_name, region_name) AS INTEGER) AS location_sk,
         nation_name, region_name
  FROM (SELECT DISTINCT n_name AS nation_name, r_name AS region_name FROM landing)
  WHERE nation_name IS NOT NULL
)"""

DIM_DATE_CTE = """
dim_date AS (
  SELECT DISTINCT
    CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INTEGER) AS date_sk,
    CAST(o_orderdate AS DATE) AS full_date,
    dayname(CAST(o_orderdate AS DATE)) AS day_of_week,
    monthname(CAST(o_orderdate AS DATE)) AS month_name,
    CAST(month(o_orderdate) AS INTEGER) AS month_number,
    CAST(quarter(o_orderdate) AS INTEGER) AS quarter_number,
    CAST(year(o_orderdate) AS INTEGER) AS year_number
  FROM landing
  WHERE o_orderdate IS NOT NULL
)"""

_KW_VALUES = ", ".join(f"('{k}')" for k in DEFAULT_KEYWORDS)

DOC_KEYWORDS_CTE = f"""
doc_keywords AS (
  SELECT d.doc_id, t.kw AS keyword_raw
  FROM documents d, (VALUES {_KW_VALUES}) t(kw)
  WHERE contains(lower(d.text), t.kw)
)"""

DIM_KEYWORD_CTE = f"""
dim_keyword AS (
  SELECT CAST(row_number() OVER (ORDER BY keyword_name) AS INTEGER) AS keyword_sk,
         keyword_name
  FROM (SELECT DISTINCT trim({_initcap('keyword_raw')}) AS keyword_name FROM doc_keywords)
  WHERE keyword_name IS NOT NULL
)"""

STAR_WIDE_CTE = f"""
star_wide AS (
  SELECT
    CAST(row_number() OVER (ORDER BY l.o_orderkey) AS INTEGER) AS order_pk,
    l.o_orderkey,
    dc.company_sk, dc.employer_name,
    ds.segment_sk, ds.segment_name,
    dp.priority_sk, dp.priority_name,
    dl.location_sk, dl.nation_name, dl.region_name,
    dd.date_sk, dd.full_date, dd.month_name, dd.month_number,
    dd.quarter_number, dd.year_number,
    l.o_totalprice,
    1 AS order_count
  FROM landing l
  LEFT JOIN dim_company dc ON trim(upper(l.c_name)) = dc.employer_name
  LEFT JOIN dim_segment ds ON trim({_initcap('l.c_mktsegment')}) = ds.segment_name
  LEFT JOIN dim_priority dp ON trim({_initcap('l.o_orderpriority')}) = dp.priority_name
  LEFT JOIN dim_location dl ON l.n_name = dl.nation_name AND l.r_name = dl.region_name
  LEFT JOIN dim_date dd ON CAST(l.o_orderdate AS DATE) = dd.full_date
)"""

STAR_PREFIX = (
    "WITH "
    + ",".join(
        [
            LANDING_CTE,
            DIM_COMPANY_CTE,
            DIM_SEGMENT_CTE,
            DIM_PRIORITY_CTE,
            DIM_LOCATION_CTE,
            DIM_DATE_CTE,
            DOC_KEYWORDS_CTE,
            DIM_KEYWORD_CTE,
            STAR_WIDE_CTE,
        ]
    )
)

QUERIES = {
    "dim_company": dim_company,
    "dim_segment": dim_segment,
    "dim_priority": dim_priority,
    "dim_location": dim_location,
    "dim_date": dim_date,
    "dim_keyword": dim_keyword,
    "fact_orders": fact_orders,
    "star_wide": star_wide,
    "bridge_doc_keyword": bridge_doc_keyword,
}

ORACLES = {
    "dim_company": f"{STAR_PREFIX} SELECT * FROM dim_company",
    "dim_segment": f"{STAR_PREFIX} SELECT * FROM dim_segment",
    "dim_priority": f"{STAR_PREFIX} SELECT * FROM dim_priority",
    "dim_location": f"{STAR_PREFIX} SELECT * FROM dim_location",
    "dim_date": f"{STAR_PREFIX} SELECT * FROM dim_date",
    "dim_keyword": f"{STAR_PREFIX} SELECT * FROM dim_keyword",
    "fact_orders": (
        f"{STAR_PREFIX} SELECT order_pk, o_orderkey, company_sk, segment_sk,"
        " priority_sk, location_sk, date_sk, o_totalprice, order_count"
        " FROM star_wide"
    ),
    "star_wide": f"{STAR_PREFIX} SELECT * FROM star_wide",
    "bridge_doc_keyword": (
        f"{STAR_PREFIX} SELECT DISTINCT k.doc_id, dk.keyword_sk"
        f" FROM doc_keywords k JOIN dim_keyword dk"
        f" ON trim({_initcap('k.keyword_raw')}) = dk.keyword_name"
    ),
}
