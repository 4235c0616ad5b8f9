"""Custom stateful streaming operator: running per-user totals via
``applyInPandasWithState`` (Arrow-batched, grouped state).

This is the engine's template for operators Spark lacks natively
(SURVEY.md build-plan custom-operator tier (b)): state lives in the
checkpoint per group key, input arrives as pandas batches, output is
incremental updates. The reference's closest shape is the Airflow-
Variable watermark counter; this generalizes it to arbitrary per-key
state at executor scale (state is partitioned by key — no driver
bottleneck at 100 TB)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-maintained (n_events, total_value) per user."""
    from ..session import ship_package

    ship_package(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
