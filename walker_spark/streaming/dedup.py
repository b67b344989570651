"""Streaming deduplication: exact dedup over a continuous document
stream — the ingest-side counterpart of ``operators/dedup.py`` for
corpora that land incrementally (a live crawl writing results parquet).

Two surfaces, idiomatic-Spark-first:

* :func:`streaming_exact_dedup` — the BUILT-IN path: hash-key the
  normalized text and let Structured Streaming's stateful
  ``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` keep the seen
  set across micro-batches (state store, checkpointed, exactly-once).
  Prefer this; a custom operator would re-implement what the engine
  already ships.
* :func:`streaming_dup_counts` — the ``applyInPandasWithState`` path
  for semantics the built-in can't express: per content-hash RUNNING
  state (first-seen doc id + occurrence count), emitted on every
  update — the live "duplication pressure" feed a crawl operator
  watches. This is the custom-stateful-operator shape (input_hint:
  vectorized pandas UDFs; state rides the checkpoint like the BSP
  frontier does).

State at 10^10 docs: the state store partitions by the group key
(text_hash), so both paths scale horizontally; unbounded retention is
the semantic choice for global dedup (the seen set IS the product) —
use the watermarked variant when dedup-within-horizon is acceptable
and state must stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text_expr

__all__ = ["streaming_exact_dedup", "streaming_dup_counts"]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each normalized text survives; later
    occurrences — in the SAME or ANY LATER micro-batch — are dropped by
    the engine's keyed state. With ``time_col`` the dedup horizon is
    bounded by the watermark (``dropDuplicatesWithinWatermark``), the
    bounded-state trade for infinite streams.

    The key is the 128-bit md5 of the normalized text, not a 64-bit
    hash: at the 10^10-doc scale this module targets, expected 64-bit
    collisions (~n^2/2^65) would silently drop millions of
    non-duplicates; at 128 bits the expectation is ~1e-19."""
    hashed = stream.withColumn(
        "text_hash", F.md5(normalize_text_expr(F.col(text_col)))
    )
    if time_col is not None:
        return hashed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return hashed.dropDuplicates(["text_hash"])


def streaming_dup_counts(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per content-hash running state via ``applyInPandasWithState``:
    emits (text_hash, keep_id, n_seen) whenever a hash receives new
    rows — keep_id is the MIN doc id seen so far (the deterministic
    canonical survivor, same rule as ``exact_dedup``; "first arrival"
    would be micro-batch-order-dependent), n_seen the lifetime
    occurrence count. State persists in the checkpoint across
    micro-batches and restarts. Keyed on 128-bit md5 like
    :func:`streaming_exact_dedup` (collision-negligible at 10^10)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream.select(
        F.md5(normalize_text_expr(F.col(text_col))).alias("text_hash"),
        F.col(id_col).cast("long").alias("id"),
    )

    def fn(key, pdfs, state):
        if state.exists:
            keep_id, n_seen = state.get
        else:
            keep_id, n_seen = None, 0
        for pdf in pdfs:
            for i in pdf["id"]:
                keep_id = int(i) if keep_id is None else min(keep_id, int(i))
                n_seen += 1
        state.update((keep_id, n_seen))
        yield pd.DataFrame(
            {"text_hash": [key[0]], "keep_id": [keep_id], "n_seen": [n_seen]}
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType="text_hash string, keep_id long, n_seen long",
        stateStructType="keep_id long, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
