"""Event-stream sessionization — the standard gap-based session
construction over a fetch/activity log (the same two-window shape
Google's sessionization examples and every web-analytics engine use:
a lag-gap flag, a running sum to number sessions, then a per-session
rollup).

Scale shape: ONE hash exchange on the user key; the lag window, the
running-sum window, and the (user, session_seq) groupBy all reuse that
partitioning (Spark recognizes hash(user) clusters (user, seq)), so
the whole operator is a single shuffle regardless of input size. Time
arithmetic is integer milliseconds (``unix_millis``) end to end —
no float epoch drift, engine-exact — and ordering ties break by the
event id, making session assignment totally deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Tag every event with its session: a new session starts when the
    gap to the user's previous event exceeds ``gap_minutes``. Adds
    ``session_seq`` (1-based per user) and keeps all input columns."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    gap_ms = int(gap_minutes) * 60_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))  # NTZ inputs: cast is
    # identity under the package-standard UTC session tz (session.py:55)
    new_sess = (
        F.when(F.lag(ms).over(w).isNull(), F.lit(1))
        .when(ms - F.lag(ms).over(w) > gap_ms, F.lit(1))
        .otherwise(F.lit(0))
    )
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: start/end, duration
    in integer milliseconds, event count, distinct event types. Rides
    the same single user-keyed exchange (see module docstring)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_millis(F.max(ts_col).cast("timestamp"))
            - F.unix_millis(F.min(ts_col).cast("timestamp"))
        ).cast("long").alias("duration_ms"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct(F.col(type_col)).cast("long").alias("n_types"),
    )
