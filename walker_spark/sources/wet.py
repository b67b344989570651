"""WET (WARC conversion-record) source + sink — the Common-Crawl-style
container a web-scale text corpus actually arrives in.

Format per the public ISO-28500 / WARC-1.0 spec (also the layout
``commoncrawl.org`` documents for its ``*.warc.wet.gz`` files): a file
is a sequence of records —

    WARC/1.0\r\n
    <headers: Name: value>\r\n
    \r\n
    <Content-Length payload bytes>\r\n\r\n

with a leading ``warcinfo`` record per file and one ``conversion``
record per document.

Scale shape, both directions, mirrors how Common Crawl shards a crawl
into ~64k independent WET files:

* :func:`write_wet` — the corpus is hash-repartitioned into ``n_files``
  shards and each partition streams ONE ``.warc.wet[.gz]`` file via
  ``mapInPandas`` (Arrow batches in, constant memory out — records are
  appended as batches arrive, never accumulated). A
  ``sortWithinPartitions`` on the id between the exchange and the
  writer (a per-shard external sort, no extra shuffle) plus a fixed
  gzip mtime make output files BYTE-IDENTICAL for any input
  partitioning — reproducible artifacts are what make a 100 TB
  re-export diffable/resumable by checksum.
* :func:`read_wet` — ``binaryFile`` scan, one task per WET file
  (a gzip member is not splittable — the format's own granularity is
  the file, which is why Common Crawl keeps files ~150 MB), records
  parsed inside ``mapInPandas``; malformed tail bytes end the file
  scan rather than failing the task (counted in ``n_parse_errors`` on
  a per-file summary row when ``with_errors=True``).

No external WARC library: the record framing above is ~40 lines of
stdlib parsing, and staying stdlib keeps executors dependency-free.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import io
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_wet", "read_wet", "wet_uri_for", "export_crawl_wet"]

_WET_DATE = "2026-01-01T00:00:00Z"  # fixed: reproducible byte-identical files
_READ_SCHEMA = (
    "wet_file string, record_id string, target_uri string, warc_date string, "
    "content_length long, text string"
)


def wet_uri_for(doc_id) -> "F.Column":
    """The deterministic Target-URI this sink writes for a doc id."""
    return F.concat(F.lit("https://example.org/doc/"), F.col(doc_id).cast("string"))


def _record_id(doc_id) -> str:
    h = hashlib.md5(f"wet:{doc_id}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def write_wet(
    df: DataFrame,
    path: str,
    n_files: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    uri_col: str | None = None,
    compress: bool = True,
) -> list[str]:
    """Write a corpus as ``n_files`` WET files under ``path``; returns
    the file paths. Sharding is the stable md5 hash of the id (same
    family as pack_sequences), so output placement is deterministic for
    any input partitioning."""
    os.makedirs(path, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    shard = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("wet"), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long") % n_files
    uri = F.col(uri_col) if uri_col else wet_uri_for(id_col)
    slim = df.select(
        shard.alias("__shard"),
        F.col(id_col).cast("string").alias("__id"),
        uri.alias("__uri"),
        F.col(text_col).alias("__text"),
    ).repartition(n_files, "__shard").sortWithinPartitions("__id")

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"wet-{pid:05d}{ext}")
        # GzipFile with mtime=0: byte-identical output across runs
        opener = (
            (lambda p: _gzip.GzipFile(filename=p, mode="wb", mtime=0))
            if compress
            else (lambda p: open(p, "wb"))
        )
        fh = None
        n = 0
        for pdf in batches:
            if fh is None:
                fh = opener(fname)
                fh.write(
                    _record(
                        [
                            ("WARC-Type", "warcinfo"),
                            ("WARC-Date", _WET_DATE),
                            ("WARC-Filename", os.path.basename(fname)),
                            ("Content-Type", "application/warc-fields"),
                        ],
                        b"software: walker-spark-wet/1.0\r\n",
                    )
                )
            for _id, _uri, _text in zip(pdf["__id"], pdf["__uri"], pdf["__text"]):
                payload = ("" if _text is None else str(_text)).encode("utf-8")
                fh.write(
                    _record(
                        [
                            ("WARC-Type", "conversion"),
                            ("WARC-Record-ID", _record_id(str(_id))),
                            ("WARC-Target-URI", str(_uri)),
                            ("WARC-Date", _WET_DATE),
                            ("Content-Type", "text/plain"),
                        ],
                        payload,
                    )
                )
                n += 1
        if fh is not None:
            fh.close()
            yield pd.DataFrame({"wet_file": [fname], "n_records": [n]})

    written = slim.mapInPandas(write_partition, "wet_file string, n_records long").collect()
    return sorted(r["wet_file"] for r in written)


def _parse_wet_bytes(name: str, blob: bytes) -> tuple[list[dict], int]:
    """Parse one WET file's bytes into conversion records. Returns
    (records, n_parse_errors); a malformed record ends the scan of this
    file (framing is lost past it) and counts as one error."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = _gzip.decompress(blob)
        except OSError:
            return [], 1
    out: list[dict] = []
    errors = 0
    buf = io.BytesIO(blob)
    while True:
        line = buf.readline()
        if not line:
            break
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            errors += 1
            break
        headers: dict[str, str] = {}
        ok = True
        while True:
            h = buf.readline()
            if not h:
                ok = False
                break
            h = h.rstrip(b"\r\n")
            if h == b"":
                break
            k, sep, v = h.partition(b":")
            if not sep:
                ok = False
                break
            headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
        if not ok:
            errors += 1
            break
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            errors += 1
            break
        payload = buf.read(clen)
        if len(payload) != clen:
            errors += 1
            break
        if headers.get("warc-type") == "conversion":
            out.append(
                {
                    "wet_file": name,
                    "record_id": headers.get("warc-record-id", ""),
                    "target_uri": headers.get("warc-target-uri", ""),
                    "warc_date": headers.get("warc-date", ""),
                    "content_length": clen,
                    "text": payload.decode("utf-8", errors="replace"),
                }
            )
    return out, errors


def read_wet(
    spark: SparkSession, path_glob: str, with_errors: bool = False
) -> DataFrame:
    """Read WET files into (wet_file, record_id, target_uri, warc_date,
    content_length, text) — one row per conversion record. One task per
    file (binaryFile granularity — gzip members are unsplittable by
    design; the format scales by file COUNT). ``with_errors=True``
    appends per-file summary rows (record_id = '<parse-summary>') with
    the parse-error count in ``content_length``."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["wet_file", "record_id", "target_uri", "warc_date", "content_length", "text"]
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                recs, errors = _parse_wet_bytes(str(name), bytes(blob))
                if with_errors:
                    recs = recs + [
                        {
                            "wet_file": str(name),
                            "record_id": "<parse-summary>",
                            "target_uri": "",
                            "warc_date": "",
                            "content_length": errors,
                            "text": "",
                        }
                    ]
                if recs:
                    yield pd.DataFrame(recs, columns=cols)

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)


def export_crawl_wet(
    results: DataFrame,
    path: str,
    n_files: int = 8,
    min_code: int = 200,
    max_code: int = 299,
    compress: bool = True,
) -> list[str]:
    """Export a crawl's results (``plans/crawl.py::Crawler.results_df``
    schema: url, code, extracted ``text``, …) as WET files — the glue
    that turns THIS engine's crawl output into the corpus container the
    curation ops consume. Only successful fetches with extracted text
    ship; the URL is both the Target-URI and the shard/record key, so
    repeated exports of the same crawl are byte-identical."""
    ok = results.filter(
        (F.col("code") >= min_code)
        & (F.col("code") <= max_code)
        & F.col("text").isNotNull()
        & (F.col("text") != "")
    )
    return write_wet(
        ok,
        path,
        n_files=n_files,
        text_col="text",
        id_col="url",
        uri_col="url",
        compress=compress,
    )
