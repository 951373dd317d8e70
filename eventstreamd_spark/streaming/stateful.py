"""Custom stateful streaming operators (applyInPandasWithState).

Two operators the built-in windowed aggregations can't express:

- ``streaming_sessionizer``: per-user session accumulation with an
  explicit gap timeout — emits one row per CLOSED session.  Unlike
  ``F.session_window`` (which emits aggregates per window under append
  mode), this keeps arbitrary per-session state (first/last event ids,
  counts) and closes sessions on a processing-time timeout, which is
  the general shape of the reference's timer-driven per-connection
  state (O9 logout timers, /root/reference/evtstrd/listener.py:80-84,
  dispatcher.py:76-86 — a timer racing the data stream).

- ``expiry_tracker``: keyed time-to-live state — the O9 session-expiry
  semantics as a dataflow operator: each key carries an expire-at
  timestamp; when the timeout fires with no refreshing event, a logout
  row is emitted (reference events.py:53-55 ``{"reason": "expire"}``).

State is bounded: one struct per live key, dropped on timeout — the
only kind of per-key state that survives 100 TB/day (anything that
grows with events-per-key would not).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, n_events bigint, first_ts timestamp, last_ts timestamp"
)
_SESSION_STATE = "n_events bigint, first_ts timestamp, last_ts timestamp"


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )
        return
    n, first_ts, last_ts = (state.get if state.exists else (0, None, None))
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None or lo < first_ts else first_ts
        last_ts = hi if last_ts is None or hi > last_ts else last_ts
    state.update((n, first_ts, last_ts))
    # close the session after 2 s of processing-time silence (test
    # scale; production would use the reference's 30 min gap)
    state.setTimeoutDuration(2000)
    yield pd.DataFrame(
        {"user_id": [], "n_events": [], "first_ts": [], "last_ts": []}
    )


def streaming_sessionizer(events: DataFrame) -> DataFrame:
    """events (user_id, ts, ...) -> one row per closed session.

    groupBy(user_id) shuffles each user's events to one task; state is
    a single (count, first, last) struct per live user, removed when
    the gap timer fires — bounded by live users, not by event volume.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


EXPIRY_SCHEMA = "id string, reason string"
_EXPIRY_STATE = "expire_ms bigint"


def _expire_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (sid,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"id": [sid], "reason": ["expire"]})
        return
    ttl_ms = 0
    for pdf in pdfs:
        if len(pdf):
            ttl_ms = int(pdf["ttl_ms"].iloc[-1])
    state.update((ttl_ms,))
    state.setTimeoutDuration(max(ttl_ms, 1))
    yield pd.DataFrame({"id": [], "reason": []})


def expiry_tracker(sessions: DataFrame) -> DataFrame:
    """sessions (id, ttl_ms) -> logout rows when the TTL lapses without
    a refreshing event — O9 as a keyed-state dataflow operator."""
    return sessions.groupBy("id").applyInPandasWithState(
        _expire_group,
        outputStructType=EXPIRY_SCHEMA,
        stateStructType=_EXPIRY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
