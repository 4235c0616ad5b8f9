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


try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - older runtimes
    StatefulProcessor = object  # type: ignore[assignment,misc]


class UserTotalsProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor``: the same per-user running totals
    through the transformWithState API — typed state handles
    (ValueState here; ListState/MapState/timers available), RocksDB-
    backed, the successor to applyInPandasWithState for arbitrary
    stateful operators."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, total = self._state.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((int(n), float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` via Spark 4's transformWithStateInPandas.
    Requires the RocksDB state store provider (caller sets the session
    conf; see plans/media_stream.py::stream_tws_user_totals)."""
    from ..session import ship_package

    if StatefulProcessor is object:
        raise NotImplementedError("transformWithState requires pyspark >= 4.0")
    ship_package(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
