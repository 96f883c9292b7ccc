"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

The checklist's "custom stateful operators" slot: event streams carry no
session ids; a session is 'events from one user with < gap between
consecutive timestamps'.  No built-in aggregation expresses this (session
windows exist for aggregation, but not with arbitrary per-session payload
logic), so it's per-key state.

Correctness under LATE data (the subtle part): a running (start, last)
summary merges a late event into the open session without checking the
gap against events BETWEEN it and the session — e.g. an open session
[12:00, 12:00] absorbing a late 11:15 event spans a 45-minute silence,
which the batch twin (contract.events_sessionization) splits.  So state
holds the BUFFER of still-open events instead: each batch appends,
sorts, splits into gap-sessions, and emits exactly those sessions the
watermark has SEALED (session_end + gap <= watermark — any future event
must carry ts >= watermark, so it cannot extend them).  Unsealed events
stay buffered; the event-time timeout flushes them once the watermark
passes.  Streamed sessions therefore equal the batch sessionization of
the same (watermark-admitted) events, regardless of arrival order.

State is bounded by the watermark horizon (only events within
last+gap > watermark stay buffered; timeouts evict idle users)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, value_sum double"
)
STATE_SCHEMA = "ts array<long>, vals array<double>"


_UNITS_MS = {
    "millisecond": 1, "second": 1000, "minute": 60_000,
    "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000,
}


def _parse_delay_ms(watermark: str) -> int:
    """'10 seconds' / '1 hour' -> milliseconds (Spark interval subset)."""
    num, unit = watermark.strip().split()
    return int(float(num) * _UNITS_MS[unit.rstrip("s").lower()])


def _split_sessions(ts: list[int], vals: list[float], gap_ms: int):
    """Sorted events -> [(start, end, n, vsum)] gap-sessions."""
    out = []
    start = last = ts[0]
    n, vsum = 0, 0.0
    for t, v in zip(ts, vals):
        if n > 0 and t - last > gap_ms:
            out.append((start, last, n, vsum))
            start, n, vsum = t, 0, 0.0
        last = t
        n += 1
        vsum += float(v)
    out.append((start, last, n, vsum))
    return out


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """events(user_id, ts timestamp, value double) -> closed sessions.

    A session is emitted once the watermark passes its end + gap (sealed:
    no admissible future event can extend it), or when the event-time
    timeout fires for an idle user.  Sealing uses the watermark the
    engine will hold AFTER this batch — max(current watermark,
    newest buffered ts - watermark delay) — since any event older than
    that is dropped at the source filter and can never extend a session.
    """
    gap_ms = gap_seconds * 1000
    delay_ms = _parse_delay_ms(watermark)

    def _emit(user_id, sessions):
        out = pd.DataFrame(
            sessions,
            columns=["_start", "_end", "n_events", "value_sum"],
        )
        out.insert(0, "user_id", user_id)
        out["session_start"] = out["_start"].to_numpy().astype(
            "datetime64[ms]"
        )
        out["session_end"] = out["_end"].to_numpy().astype("datetime64[ms]")
        return out[["user_id", "session_start", "session_end",
                    "n_events", "value_sum"]]

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                ts, vals = state.get
                sessions = _split_sessions(list(ts), list(vals), gap_ms)
                state.remove()
                yield _emit(user_id, sessions)
            return

        rows = pd.concat(list(pdfs))
        # unit-safe epoch millis (Arrow may hand us us- or ns-backed
        # datetime64; normalize explicitly)
        new_ts = rows["ts"].to_numpy().astype("datetime64[ms]").astype(
            "int64"
        ).tolist()
        new_vals = [float(v) for v in rows["value"].to_numpy()]
        if state.exists:
            old_ts, old_vals = state.get
            new_ts = list(old_ts) + new_ts
            new_vals = list(old_vals) + new_vals
        order = sorted(range(len(new_ts)), key=lambda i: new_ts[i])
        ts = [new_ts[i] for i in order]
        vals = [new_vals[i] for i in order]

        wm = max(state.getCurrentWatermarkMs(), ts[-1] - delay_ms)
        sessions = _split_sessions(ts, vals, gap_ms)
        sealed = [s for s in sessions if s[1] + gap_ms <= wm]
        open_ = [s for s in sessions if s[1] + gap_ms > wm]
        if open_:
            keep_from = open_[0][0]  # first still-open session's start
            idx = next(i for i, t in enumerate(ts) if t >= keep_from)
            state.update((ts[idx:], vals[idx:]))
            # flush once the watermark passes the LAST buffered event
            state.setTimeoutTimestamp(max(ts) + gap_ms)
        else:
            state.remove()
        if sealed:
            yield _emit(user_id, sealed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
