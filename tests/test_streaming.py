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
