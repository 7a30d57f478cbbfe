"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (the round brief's named API for custom
stateful operators).

Semantics match the batch lag-window sessionizer exactly (a new session
starts when a user's gap since their previous event exceeds ``gap_s``),
but the state (last event time + running counters) lives in the
streaming state store and survives across micro-batches — the shape a
continuously-crawled event stream needs. Tested two ways:

- batch parity: drained with availableNow + maxFilesPerTrigger=1 over
  time-split files (so state genuinely crosses micro-batch boundaries),
  final counters equal the batch `sessionize` aggregate;
- the driver query `stream_sessionize` runs the same drain and is
  verified against the batch DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", DoubleType(), True),
        StructField("n_sessions", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def _session_fn(gap_s: float):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        # int64 ns -> exact integer microseconds (< 2^53) BEFORE the
        # float division: ns/1e9 directly loses ~128 ns on 2025-era
        # stamps, which can flip a gap exactly equal to gap_s and break
        # stream/batch parity (ADVICE r2)
        ep = (
            batch["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
            / 1e6
        )
        # vectorized gap test (no per-event Python): a session starts at
        # every event whose gap since the previous one exceeds gap_s;
        # the first event continues the stored state (or always starts
        # a session when no state exists yet)
        if len(ep):
            prev = np.empty_like(ep)
            prev[1:] = ep[:-1]
            prev[0] = -np.inf if last_ts is None else last_ts
            n_sessions += int((ep - prev > gap_s).sum())
            n_events += len(ep)
            last_ts = float(ep[-1])
        state.update((last_ts, int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [int(n_sessions)],
                "n_events": [int(n_events)],
            }
        )

    return fn


def sessionize_stream(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """events stream (ts, event_id, user_id, ...) -> per-user running
    (n_sessions, n_events), one updated row per user per micro-batch."""
    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
