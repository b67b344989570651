"""Structured Streaming variants: A5 speed window + streaming extract."""

import pyspark.sql.functions as F


def test_scrape_speed_batch_and_stream_agree(spark, tmp_path):
    from walker_spark.streaming.speed import scrape_speed_stream

    rows = [(i, f"u{i}", 1_700_000_000 + i * 7) for i in range(40)]
    df = spark.createDataFrame(rows, "i long, url string, epoch long").select(
        "url", F.col("epoch").cast("timestamp").alias("time")
    )
    batch = {
        (str(r["window_start"]), r["requests"], r["req_per_sec"])
        for r in scrape_speed_stream(df).collect()
    }
    assert sum(r[1] for r in batch) == 40
    assert all(abs(r[2] - r[1] / 60) < 1e-3 for r in batch)  # req_per_sec is round(.,4)

    # streaming path over the same rows via a file source
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema("url string, time timestamp").parquet(src)
    q = (
        scrape_speed_stream(stream)
        .writeStream.format("memory")
        .queryName("speed_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["requests"], r["req_per_sec"])
        for r in spark.sql("select * from speed_t").collect()
    }
    assert got == batch


def test_streaming_extract(spark, tmp_path):
    from walker_spark.functions.extract import extract_text
    from walker_spark.streaming.speed import streaming_extract

    html = b"<html><head><title>T1</title></head><body><h1>H</h1><a href='/x'>x</a><p>body</p></body></html>"
    rows = [("https://h.example/a", None, bytearray(html), "", "en", "h.example")]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string, host string"
    )
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    df.write.parquet(src)
    q = streaming_extract(spark, src, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    r = got[0]
    assert r["structure"]["title"] == "T1"
    assert dict(r["links"]) == {"/x": 1}
    assert r["text"] == extract_text(html.decode())


def test_streaming_exact_dedup_cross_batch(spark, tmp_path):
    """State must persist across micro-batches AND query restarts: a
    doc whose text was seen in batch 1 must not be emitted when its
    duplicate arrives in batch 2 (same checkpoint)."""
    from walker_spark.streaming.dedup import streaming_exact_dedup

    schema = "doc_id long, text string"
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "Alpha, beta GAMMA!")],
        schema,
    )
    b1.write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    rows1 = spark.read.parquet(out).collect()
    # one survivor per distinct normalized text (WITHIN-batch winner is
    # engine-arbitrary: docs 1 and 3 normalize identically)
    assert len(rows1) == 2
    assert {r["doc_id"] for r in rows1} <= {1, 2, 3}
    survivors1 = {r["doc_id"] for r in rows1}

    b2 = spark.createDataFrame(
        [(4, "alpha beta gamma"), (5, "zeta eta"), (6, "delta epsilon")], schema
    )
    b2.write.mode("append").parquet(src)
    run_once()
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # CROSS-batch state: 4 and 6 duplicate batch-1 hashes -> dropped;
    # only the new zeta doc is appended
    assert got2 == survivors1 | {5}


def test_streaming_dup_counts_stateful(spark, tmp_path):
    """applyInPandasWithState: running (keep_id, n_seen) per content
    hash, accumulated across batches through the checkpointed state."""
    from walker_spark.streaming.dedup import streaming_dup_counts

    schema = "doc_id long, text string"
    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha beta gamma")],
        schema,
    ).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)

        # memory sinks can't recover from a checkpoint; foreachBatch +
        # append-parquet can, and n_seen is monotone so the max per
        # hash IS the latest state
        def emit(df, _epoch):
            df.write.mode("append").parquet(sink)

        q = (
            streaming_dup_counts(stream)
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).groupBy("keep_id").agg(
            F.max("n_seen").alias("n_seen")
        ).collect()
        return {r["keep_id"]: r["n_seen"] for r in rows}

    first = run_once()
    assert first == {1: 2, 2: 1}  # doc 3 folded into hash of doc 1

    spark.createDataFrame(
        [(9, "alpha beta gamma"), (10, "delta epsilon")], schema
    ).write.mode("append").parquet(src)
    second = run_once()
    # state carried across the restart: counts continue; min keep_id kept
    assert second == {1: 3, 2: 2}


def test_streaming_minhash_matches_batch(spark, tmp_path):
    """VERDICT r4 #7: replay the fixture corpus as a stream in three
    micro-batch waves THROUGH A QUERY RESTART, exact-verify the
    candidate stream, and prove the deduped verified pair SET equals
    the batch minhash_lsh_pairs answer on the same corpus + params.
    The (band,bucket)-keyed bucket state must ride the checkpoint: the
    third wave's docs pair with first-wave bucket members seen before
    the restart."""
    from walker_spark.operators.dedup import minhash_lsh_pairs
    from walker_spark.streaming.dedup import streaming_minhash_pairs

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text")
        .cache()
    )
    params = dict(num_hashes=64, bands=16, shingle_n=3, jaccard_threshold=0.5)
    batch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(corpus, **params).collect()
    }
    assert batch, "fixture produced no pairs — threshold too high for the test"

    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    waves = [
        corpus.filter(F.col("doc_id") % 3 == k) for k in range(3)
    ]

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)

        def emit(df, _epoch):
            df.write.mode("append").parquet(sink)

        q = (
            streaming_minhash_pairs(stream, corpus, **params)
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    waves[0].write.mode("append").parquet(src)
    waves[1].write.mode("append").parquet(src)
    run_once()  # waves 0+1, then the query STOPS (restart boundary)
    waves[2].write.mode("append").parquet(src)
    run_once()  # wave 2 resumes from the checkpointed bucket state

    streamed = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(sink).collect()
    }  # set-dedupe: multi-band/replayed emissions are idempotent upserts
    corpus.unpersist()
    assert streamed == batch


def test_streaming_minhash_state_ttl(spark, tmp_path):
    """Bounded-state mode: with state_ttl, docs pair only within the
    processing-time horizon — a bucket whose last arrival is older than
    the TTL is evicted (idle keys by timeout, colliding keys by the
    data-path horizon check), so a later identical doc pairs with its
    own wave but NOT with pre-horizon members.

    One continuously-triggered query (availableNow + registered
    processing-time timeouts is a non-terminating combination — the
    engine keeps scheduling timeout batches); waves are appended live
    and the sink polled, restart resilience is covered by
    test_streaming_minhash_matches_batch."""
    import time

    from walker_spark.streaming.dedup import streaming_minhash_candidates

    schema = "doc_id long, text string"
    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    fam = "identical near duplicate family text for the ttl horizon test"
    spark.createDataFrame([(1, fam), (2, fam)], schema).write.parquet(src)

    def emit(df, _epoch):
        df.write.mode("append").parquet(sink)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_minhash_candidates(stream, state_ttl="2 seconds")
        .writeStream.foreachBatch(emit)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )

    def sink_pairs():
        try:
            return {
                (r["id_a"], r["id_b"]) for r in spark.read.parquet(sink).collect()
            }
        except Exception:
            return set()  # sink not written yet

    def wait_for(expected, secs=90):
        deadline = time.time() + secs
        while time.time() < deadline:
            got = sink_pairs()
            if got >= expected:
                return got
            time.sleep(1)
        raise AssertionError(f"sink never reached {expected}: {sink_pairs()}")

    try:
        got1 = wait_for({(1, 2)})
        assert got1 == {(1, 2)}  # within horizon: the pair is found
        time.sleep(3)  # let the 2 s TTL lapse past docs 1 and 2
        # docs 9 and 10 arrive together OUTSIDE the horizon: they pair
        # with each other (same fresh bucket) but NOT with the evicted
        # 1 and 2 — both arms of the horizon semantic in one wave
        spark.createDataFrame([(9, fam), (10, fam)], schema).write.mode(
            "append"
        ).parquet(src)
        got2 = wait_for({(1, 2), (9, 10)})
        assert got2 == {(1, 2), (9, 10)}
    finally:
        q.stop()
        q.awaitTermination(60)


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Replay the events fixture as a stream through a query restart;
    event-time timeouts (watermark-driven) must close exactly the
    batch session set. A far-future sentinel user pushes the final
    watermark past every real session's deadline, so the closed-set ==
    batch equality is total on real users."""
    import datetime as dt

    from walker_spark.operators.sessions import session_stats
    from walker_spark.streaming.sessions import streaming_sessions

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts", "event_type", "event_id")
        .cache()
    )
    batch = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["duration_ms"], r["n_events"], r["n_types"])
        for r in session_stats(ev, gap_minutes=360).collect()
    }
    assert batch

    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    schema = "user_id long, ts timestamp, event_type string"
    # waves split by TIME, not id parity: with watermark 0s anything
    # behind the first wave's max event time would be dropped as late
    cut = dt.datetime(2024, 1, 15)
    w1 = ev.filter(F.col("ts") < cut).select("user_id", "ts", "event_type")
    w2 = ev.filter(F.col("ts") >= cut).select("user_id", "ts", "event_type")
    sentinel = spark.createDataFrame(
        [(999999, dt.datetime(2030, 1, 1), "flush")], schema
    )
    sentinel2 = spark.createDataFrame(
        [(999998, dt.datetime(2031, 1, 1), "flush")], schema
    )

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)

        def emit(df, _epoch):
            df.write.mode("append").parquet(sink)

        q = (
            streaming_sessions(stream, gap_minutes=360, watermark="0 seconds")
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # one file per wave: a wave's part-files carry no time order, and
    # availableNow may split them into several batches — the watermark
    # would jump mid-wave and drop time-earlier files as late data
    w1.coalesce(1).write.mode("append").parquet(src)
    run_once()  # open sessions ride the checkpoint across the restart
    w2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    sentinel.write.mode("append").parquet(src)
    run_once()  # watermark jumps past every real deadline
    sentinel2.write.mode("append").parquet(src)
    run_once()  # extra batch lets pending event-time timeouts fire

    got = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["duration_ms"], r["n_events"], r["n_types"])
        for r in spark.read.parquet(sink).collect()
        if r["user_id"] < 20
    }
    ev.unpersist()
    assert got == batch
