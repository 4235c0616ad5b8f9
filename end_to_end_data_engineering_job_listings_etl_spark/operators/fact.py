"""Fact-table assembly: the left-join chain onto dimension surrogate
keys, plus the skill/keyword bridge.

Reference analog: ``dags/spark_etl_script.py:157-179`` — inner join to
the degenerate job dim on the natural key (J1), left joins to each dim
on *normalized expressions* (J2-J6, e.g. ``trim(upper(raw.employer_name))
== dim.employer_name``), a derived-date join to DIM_DATE (J6), fact PK
via row_number, measure ``job_count = lit(1)``, then the bridge:
explode → normalize → inner join dim → distinct pairs (J7).

Scale posture: every dimension side is explicitly ``F.broadcast`` —
dims are small by construction (distinct of a low-cardinality key), so
the fact never shuffles during assembly; the only wide exchange is the
optional fact-PK assignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ids import ranked_ids


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    sk: str,
    how: str = "left",
) -> DataFrame:
    """Left-join a (small, broadcast) dimension and keep only its SK."""
    keep = [fact[c] for c in fact.columns]
    return fact.join(F.broadcast(dim), on, how).select(*keep, dim[sk])


def with_fact_pk(fact: DataFrame, order_cols: Sequence[str], pk_name: str) -> DataFrame:
    """Reference-exact fact primary key: row_number over a declared
    natural ordering (``dags/spark_etl_script.py:168``), computed with
    the range/two-phase plan (``operators.ids.ranked_ids``) so the
    fact never funnels through a one-partition window. Deterministic
    (unlike the reference's monotonically_increasing_id natural key,
    F17 — documented deviation, SURVEY.md §7.3)."""
    return ranked_ids(fact, list(order_cols), pk_name).select(
        pk_name, *fact.columns
    )
