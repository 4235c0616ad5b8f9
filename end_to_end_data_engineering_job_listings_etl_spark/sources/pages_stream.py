"""A Spark 4 PYTHON STREAMING data source (SimpleDataSourceStreamReader)
— the streaming sibling of ``rest_datasource.py``'s batch reader, and
the last rung of the custom-source ladder: driver-side ingest
(rest.py) → executor-parallel batch Python source (rest_datasource.py)
→ offset-tracked streaming Python source (here).

The source models a paginated feed: offset = {"page": n}; each
``read(start)`` emits the next page's 10 deterministic records and
advances the offset, until the finite feed (5 pages) is exhausted.
``readBetweenOffsets`` replays any committed range — the contract that
makes the source exactly-once under checkpoint recovery: a restarted
query re-reads precisely the pages its last commit covered, no more.

Scale/semantics notes:
- Offsets are tiny JSON dicts; the engine owns them in the checkpoint
  log. State per query is ONE integer — a real feed would checkpoint a
  cursor/sequence number the same way.
- ``trigger(availableNow=True)`` drains whatever the prefetch saw at
  start; repeated availableNow runs against the SAME checkpoint walk
  the offset forward and converge on the full feed regardless of how
  many pages a single run batches — the query layer
  (plans/media_stream.py::src_python_stream_resume) exploits exactly
  that restart-resume property.
"""

from __future__ import annotations

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False
    DataSource = object  # type: ignore[assignment]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment]

PAGES_SCHEMA = "page int, rec int, title string"
N_PAGES = 5
RECS_PER_PAGE = 10


def page_rows(page: int) -> list[tuple]:
    """Deterministic page payload (same titling convention as
    rest_datasource.synthetic_page)."""
    return [(page, i, f"T{page}-{i}") for i in range(RECS_PER_PAGE)]


class PagesStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        page = start["page"]
        if page >= N_PAGES:
            return iter([]), start
        return iter(page_rows(page + 1)), {"page": page + 1}

    def readBetweenOffsets(self, start, end):
        out: list[tuple] = []
        for page in range(start["page"] + 1, end["page"] + 1):
            out.extend(page_rows(page))
        return iter(out)


class PagesStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pages_stream"

    def schema(self) -> str:
        return PAGES_SCHEMA

    def simpleStreamReader(self, schema):
        return PagesStreamReader()


def register(spark) -> None:
    """Idempotent registration of the pages_stream format."""
    if not HAVE_DATASOURCE_API:
        raise NotImplementedError(
            "pyspark.sql.datasource requires pyspark >= 4.0"
        )
    spark.dataSource.register(PagesStreamDataSource)
