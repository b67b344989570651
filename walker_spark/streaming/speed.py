"""Streaming analytics over crawl results.

Walker's only time-windowed computation is the scrape-speed gauge: the
count of results in a trailing 60-second window divided by the window
span (``scrapeloop.go:155-200``). The BSP engine computes the same
per-round on the driver; this module is the Structured-Streaming
variant for continuous ingest (e.g. results landing in object storage):

* :func:`scrape_speed_stream` — tumbling 60s windowed count → req/s
  (A5), with a watermark for late results.
* :func:`streaming_extract` — continuous H1/H2 extraction over a pages
  stream (readStream → the same vectorized extract stage → append
  sink). The frontier loop itself is inherently iterative/cyclic, which
  Structured Streaming does not express — rounds stay batch (the BSP
  plan), streams handle ingest and monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["scrape_speed_stream", "streaming_extract"]


def scrape_speed_stream(
    results: DataFrame,
    time_col: str = "time",
    window: str = "60 seconds",
    watermark: str = "120 seconds",
) -> DataFrame:
    """A5: results-per-window and req/s. ``results`` may be a streaming
    or batch DataFrame with a timestamp column."""
    df = results
    win_seconds = int(window.split()[0])
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(F.window(F.col(time_col), window).alias("win"))
        .agg(F.count(F.lit(1)).alias("requests"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("requests"),
            F.round(F.col("requests") / win_seconds, 4).alias("req_per_sec"),
        )
    )


def streaming_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pages_schema: str = "url string, warc_ts timestamp, html binary, text string, lang string, host string",
    available_now: bool = True,
):
    """Continuous extract over a parquet pages stream: each micro-batch
    runs the same Arrow-vectorized extract as the BSP fetch stage and
    appends (url, host, links, structure, text) to ``out_dir``.

    Returns the started StreamingQuery (caller awaits/stops)."""
    import pandas as pd

    from ..functions.extract import STRUCTURE_SPARK_TYPE, extract_all

    stream = (
        spark.readStream.schema(pages_schema).format("parquet").load(pages_dir)
    )

    out_schema = (
        "url string, host string, links map<string,int>, "
        f"structure {STRUCTURE_SPARK_TYPE}, text string"
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                html = (bytes(t.html) if t.html is not None else b"").decode(
                    "utf-8", errors="replace"
                )
                links, structure, text = extract_all(html)
                rows.append(
                    {
                        "url": t.url,
                        "host": t.host,
                        "links": links,
                        "structure": structure,
                        "text": text,
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {c: [] for c in ("url", "host", "links", "structure", "text")}
            )

    extracted = stream.mapInPandas(fn, out_schema)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
