"""Custom stateful streaming operator #2: continuous sessionization.

The batch operator (operators/temporal.py::sessionize) needs the whole
history of a key to number its sessions; on an endless stream that is a
cross-micro-batch stateful computation, so it uses
``applyInPandasWithState`` with an EVENT-TIME TIMEOUT: per-key state
holds the open session (start, last event, count, value total); a
session closes -- and is emitted exactly once -- when either

  (a) a later event of the same key arrives more than `gap` after the
      session's last event (closed inline, the gap rule), or
  (b) the watermark passes last_event + gap (closed by timeout -- the
      key simply stopped producing events).

Output rows are CLOSED sessions (append mode).  The session still open
when the stream is stopped is intentionally not emitted -- it is not
finished; on restart the state store restores it (exactly-once via the
checkpoint, same recovery contract as streaming/stateful.py).

Scale: state is one fixed-size tuple per ACTIVE key (inactive keys are
reaped by their timeout), sharded by the groupBy key across the state
store.  Event-time disorder within the watermark is tolerated: events
never advance a session backwards (a late event inside the open session
updates counts, not boundaries; events older than the watermark are
dropped by Spark before the operator sees them).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("session_end_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])
_STATE = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _make_session_fn(gap_us: int):
    def fn(key: Tuple[int], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            closed.append((start, last, n, total))
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = []
            for pdf in pdfs:
                rows.append(pdf[["ts_us", "value"]])
            if rows:
                batch = pd.concat(rows).sort_values("ts_us")
                for ts_us, value in zip(batch["ts_us"], batch["value"]):
                    ts_us = int(ts_us)
                    if cur is None:
                        cur = (ts_us, ts_us, 1, float(value))
                    elif ts_us - cur[1] > gap_us:
                        closed.append(cur)
                        cur = (ts_us, ts_us, 1, float(value))
                    else:
                        cur = (cur[0], max(cur[1], ts_us), cur[2] + 1,
                               cur[3] + float(value))
            if cur is not None:
                state.update(cur)
                # reap via event time: fire when watermark > last + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            })
    return fn


def session_stream(events_stream: DataFrame, gap_minutes: float = 30.0,
                   watermark: str = "1 second") -> DataFrame:
    """events stream (user_id, ts, value) -> closed-session stream.

    Exact integer-microsecond gap arithmetic (matches the batch
    operator); the watermark bounds both late data and timeout lag."""
    gap_us = int(gap_minutes * 60_000_000)
    prepared = (events_stream
                .withWatermark("ts", watermark)
                .select("user_id", "ts",
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        .alias("ts_us"),
                        F.col("value").cast("double").alias("value")))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_session_fn(gap_us),
                outputStructType=SESSION_OUTPUT,
                stateStructType=_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
