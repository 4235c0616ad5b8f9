"""Calendar-attribute expressions for the date dimension.

Reference analog: DIM_DATE derivation at ``dags/spark_etl_script.py:112-120``
(`date_sk` = yyyyMMdd int, day/month names via ``date_format``,
month/quarter/year parts) and its pandas twin in the
``populate_star_schema`` bytecode (``strftime('%Y%m%d')``, ``day_name``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_sk(col: Column | str) -> Column:
    """yyyyMMdd integer surrogate key (reference :115)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def date_attributes(col: Column | str) -> list[Column]:
    """The full DIM_DATE attribute set (reference :113-120), aliased."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.to_date(c)
    return [
        date_sk(d).alias("date_sk"),
        d.alias("full_date"),
        F.date_format(d, "EEEE").alias("day_of_week"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.month(d).alias("month_number"),
        F.quarter(d).alias("quarter_number"),
        F.year(d).alias("year_number"),
    ]
