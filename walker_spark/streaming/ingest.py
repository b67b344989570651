"""Streaming WET ingest: a live crawl (or an upstream fetch fleet)
drops ``.warc.wet.gz`` shards into a directory; this source tails the
directory with Structured Streaming's file source and parses records
incrementally, feeding the stateful dedup/curation operators in
``streaming/dedup.py``.

Spark-first construction: ``readStream.format("binaryFile")`` — the
binaryFile FileFormat participates in the standard file streaming
source, so newly-landed WET files become one input row each, with
exactly-once tracking of processed files in the checkpoint log. The
record parser is the SAME ``_parse_wet_bytes`` the batch source uses
(one implementation, two arrival modes) inside ``mapInPandas``.

Scale: file-granular parallelism (identical to the batch source —
gzip members are unsplittable by design, Common Crawl sizes files
~150 MB for exactly this reason); ``maxFilesPerTrigger`` bounds a
micro-batch. State-bearing downstream ops partition by their group
key, so ingest parallelism and dedup-state parallelism compose
independently.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.wet import _parse_wet_bytes, _READ_SCHEMA

__all__ = ["stream_wet", "stream_wet_deduped"]

_BINARY_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_wet(
    spark: SparkSession,
    path_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming analogue of :func:`walker_spark.sources.wet.read_wet`:
    one output row per conversion record in each newly-arrived WET
    file. Malformed files contribute their parseable prefix and never
    fail the batch."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "wet_file", "record_id", "target_uri", "warc_date",
            "content_length", "text",
        ]
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                recs, _errors = _parse_wet_bytes(str(name), bytes(blob))
                if recs:
                    yield pd.DataFrame(recs, columns=cols)

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)


def stream_wet_deduped(
    spark: SparkSession,
    path_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """WET ingest composed with the stateful exact-dedup operator:
    records whose normalized text was already seen (across ALL prior
    micro-batches and restarts, via the checkpointed state store) are
    dropped. The end-to-end shape of a continuous-crawl corpus
    builder: container parse → streaming seen-set → curated stream."""
    from .dedup import streaming_exact_dedup

    recs = stream_wet(spark, path_glob, max_files_per_trigger)
    return streaming_exact_dedup(recs, text_col="text")
