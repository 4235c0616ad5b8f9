"""Relative-time ("N hours ago") parser as native Catalyst expressions.

Reference analog: the row-at-a-time Python UDF ``parse_relative_time``
(``dags/spark_etl_script.py:12-29``, registered :86-87): handles
"N hour(s) ago", "N day(s) ago", "yesterday"; anything else (weeks,
months, junk) → null. The reference anchors to ``utcnow()`` — hidden
nondeterminism. We take an explicit ``now`` column/literal so runs are
replayable; production callers pass ``F.current_timestamp()``.

This is the reference's single biggest perf bug fixed: a Python UDF on
the hot path becomes a codegen'd expression (no Python worker, no
serialization barrier).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_relative_time(col: Column | str, now: Column) -> Column:
    """Parse relative-time strings against an injected ``now``.

    Grammar (reference-exact, ``dags/spark_etl_script.py:16-28``):
      - "<n> hour ago" / "<n> hours ago"  -> now - n hours
      - "<n> day ago" / "<n> days ago"    -> now - n days
      - "yesterday"                        -> now - 1 day
      - anything else                      -> null
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c))
    n = F.regexp_extract(s, r"(\d+)", 1).cast("long")
    is_hours = s.rlike(r"^\d+ hours? ago$")
    is_days = s.rlike(r"^\d+ days? ago$")
    return (
        F.when(is_hours, now - F.make_interval(hours=n))
        .when(is_days, now - F.make_interval(days=n))
        .when(s == "yesterday", now - F.make_interval(days=F.lit(1)))
    )
