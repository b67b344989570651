"""Streaming sessionization — the live counterpart of
``operators/sessions.py``: gap-based sessions over an unbounded event
stream, closed by EVENT-TIME timeouts driven by the watermark (the
canonical ``applyInPandasWithState`` session-window construction from
the public Structured Streaming docs).

Semantics vs batch: a session CLOSES (and is emitted exactly once)
when the watermark passes ``last_event + gap`` — so on any replayed
prefix, the emitted set equals the batch :func:`~walker_spark.
operators.sessions.session_stats` rows for sessions whose deadline the
final watermark passed (proven by test_streaming_sessions). Events
arriving later than the watermark are dropped by the engine before
the state function sees them — the standard bounded-lateness trade.

Parity scope (honesty note): the batch-equality claim above holds for
IN-ORDER streams, or any stream run with ``watermark='0 seconds'``
(where accepted-late events cannot exist). With a nonzero watermark
and out-of-order input, two known divergences remain: an accepted late
event earlier than an open session's start does not lower the recorded
start (start is only set when the state is empty), and a session
closed by an in-batch gap is emitted immediately — before its deadline
passes the watermark — so a later still-accepted event inside that
already-emitted window starts a second overlapping session instead of
extending the first. Replays and the engine's tests use in-order
streams; out-of-order parity would need start=min tracking plus
deferred emission of gap-closed sessions until their event-time
timeout fires.

State shape: one row per OPEN session per user (start/end epoch
MICROseconds — full parquet timestamp precision, so emitted sessions
compare bit-for-bit with the batch op; only the timeout clock is
millis, ceiled so a microsecond tail can't fire a tick early; counts
+ distinct-type set) — bounded by active users, partitioned by
the user key in the state store, riding the checkpoint across
restarts. Event-time timeouts (NOT processing-time: availableNow
replay + processing-time timeouts never terminates — the live-caught
gotcha documented on streaming/dedup.py's TTL path) fire
deterministically from the data's own clock.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_sessions"]


def streaming_sessions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    max_types: int = 64,
) -> DataFrame:
    """Emit one row per CLOSED session: ``(user_id, session_start,
    session_end, duration_ms, n_events, n_types)`` — the same rollup
    columns as the batch op (session_seq is an arrival-order artifact
    in a stream, so the stable identity here is (user, session_start)).

    ``max_types`` caps the distinct-type set kept in state (the
    standard bounded-state trade; ``n_types`` saturates at the cap).
    """
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    gap_us = int(gap_minutes) * 60_000_000

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(type_col).cast("string").alias("etype"),
    )

    def fn(key, pdfs, state):
        def emit(start, end, n, types):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "session_end_us": [end],
                    # match the batch op bit-for-bit: it truncates each
                    # endpoint to millis BEFORE subtracting
                    "duration_ms": [end // 1000 - start // 1000],
                    "n_events": [n],
                    "n_types": [len(types)],
                }
            )

        if state.hasTimedOut:
            start, end, n, types = state.get
            state.remove()
            yield emit(start, end, n, set((types or "").split("\x00")) - {""})
            return

        if state.exists:
            start, end, n, types_s = state.get
            types = set((types_s or "").split("\x00")) - {""}
        else:
            start = None
            end = n = 0
            types = set()
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["us"], pdf["etype"]))
        rows.sort(key=lambda r: (int(r[0]), str(r[1])))
        for ms, et in rows:
            ms = int(ms)
            if start is not None and ms - end > gap_us:
                yield emit(start, end, n, types)
                start, end, n, types = None, 0, 0, set()
            if start is None:
                start = ms
            end = max(end, ms)
            n += 1
            if len(types) < max_types:
                types.add(str(et))
        state.update((start, end, n, "\x00".join(sorted(types))))
        # the timeout clock is epoch MILLIS: ceil so a microsecond tail
        # can never fire one watermark tick early
        state.setTimeoutTimestamp(end // 1000 + gap_us // 1000 + 1)

    out = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, session_start_us long, session_end_us long,"
            " duration_ms long, n_events long, n_types long"
        ),
        stateStructType="start long, end long, n long, types string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
        "duration_ms",
        "n_events",
        "n_types",
    )
