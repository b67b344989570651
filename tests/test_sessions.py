import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_sessionize_gap_semantics(spark):
    from walker_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0, "a"),
        (2, 7, t0 + dt.timedelta(minutes=29), "b"),   # same session
        (3, 7, t0 + dt.timedelta(minutes=60), "a"),   # 31 min gap -> new
        (4, 7, t0 + dt.timedelta(minutes=90), "c"),   # exactly 30 min -> SAME
        (5, 8, t0, "a"),                              # other user independent
    ]
    out = {r["event_id"]: r["session_seq"] for r in sessionize(_ev(spark, rows)).collect()}
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 2 and out[4] == 2  # boundary is strict >
    assert out[5] == 1


def test_session_stats_rollup(spark):
    from walker_spark.operators.sessions import session_stats

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, "x"),
        (2, 1, t0 + dt.timedelta(minutes=10), "y"),
        (3, 1, t0 + dt.timedelta(minutes=15), "x"),
        (4, 1, t0 + dt.timedelta(hours=2), "z"),
    ]
    out = {r["session_seq"]: r for r in session_stats(_ev(spark, rows)).collect()}
    s1 = out[1]
    assert s1["n_events"] == 3 and s1["n_types"] == 2
    assert s1["duration_ms"] == 15 * 60 * 1000
    assert s1["session_start"] == t0
    s2 = out[2]
    assert s2["n_events"] == 1 and s2["duration_ms"] == 0


def test_sessionize_tie_and_partitioning(spark):
    from walker_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # identical timestamps -> event_id breaks the tie deterministically
    rows = [(i, 1, t0, "a") for i in range(6)] + [
        (10 + i, 1, t0 + dt.timedelta(hours=i), "b") for i in range(4)
    ]
    df = _ev(spark, rows)
    a = sorted((r["event_id"], r["session_seq"]) for r in sessionize(df).collect())
    b = sorted(
        (r["event_id"], r["session_seq"])
        for r in sessionize(df.repartition(5)).collect()
    )
    assert a == b
