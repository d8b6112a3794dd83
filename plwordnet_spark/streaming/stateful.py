"""Custom stateful streaming operator via applyInPandasWithState.

The task brief's "custom stateful operators" slot: a per-user running
aggregate (event count + value sum + last timestamp) maintained in
GroupState across micro-batches, with an idle-timeout that finalizes and
evicts state for quiet users — the canonical shape for sessionized
running counters over a web-scale event stream (billions of keys: state
is partitioned by user hash; the timeout bounds state size).

The reference has no streaming (SURVEY.md §2.11); this extends its
incremental-batch patterns to true incremental processing.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("finalized", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total,
                  "finalized": True}]
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n,
              "total_value": round(total, 6), "finalized": False}]
        )

    return _update


def running_user_totals(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """events stream (user_id, value, …) → running per-user totals.

    ``idle_timeout_ms``: when set, quiet users' state is finalized
    (emitted with finalized=True) and evicted after that idle period —
    the state-size bound for unbounded key spaces. Note timer-driven
    batches keep the query from going idle, so ``processAllAvailable``
    semantics change; tests and bounded-key workloads use the default
    NoTimeout."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
