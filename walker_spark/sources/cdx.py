"""CDX(J) capture index — the lookup artifact a web archive publishes
next to its WARC/WET files (the public CDXJ layout Common Crawl ships
as ``cc-index``: one line per capture, sorted by SURT key then
timestamp, sharded into gzip files that are each internally sorted so
a binary-searchable cluster index can sit on top).

SURT key (Sort-friendly URI Reordering Transform, the public IA/
webarchive-commons construction): drop the scheme, lowercase the host,
reverse its dot-labels and join with commas, append ``)`` + the
lowercased path, with the query string's parameters sorted for a
canonical ordering. ``com,example,www)/path?a=1&b=2`` sorts all of a
domain's captures together — which is the whole point: per-domain scans
become contiguous range reads.

Dialect notes (documented divergences from the many SURT variants in
the wild): default ports 80/443 are stripped unconditionally, other
ports kept; ``www.`` is NOT stripped (capture keys stay invertible);
fragments are dropped; userinfo is dropped.

Scale shape:

* :func:`surt_expr` / :func:`cdx_records` are pure native column
  expressions — whole-stage codegen, no Python anywhere.
* :func:`write_cdx` range-partitions on the key and sorts within each
  shard, so the shard sequence concatenates to ONE globally sorted
  index (exactly Common Crawl's layout; per-shard gzip with ``mtime=0``
  keeps record bytes deterministic, while shard BOUNDARIES follow
  Spark's range sampling — the concatenated content, not the per-file
  split, is the contract).
* :func:`read_cdx` — one task per gz shard (gzip isn't splittable; the
  format's own granularity is the file).
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "surt_expr",
    "cdx_records",
    "write_cdx",
    "read_cdx",
    "revisit_records",
    "revisit_stats",
    "retention_sample",
]


def surt_expr(url: Column | str) -> Column:
    """SURT key for a URL column, as a native expression (see module
    docstring for the exact dialect)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    host = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, r":(80|443)$", "")
    # a kept (non-default) port must stay at the END of the reversed
    # key ("org,ex,sub:8443"), so split it off before reversing labels
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    rev = F.concat(
        F.array_join(F.reverse(F.split(hostname, r"\.")), ","), port
    )
    rest = F.lower(
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    )
    path = F.when(rest == "", F.lit("/")).otherwise(
        F.regexp_replace(rest, r"\?.*$", "")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def cdx_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "text",
) -> DataFrame:
    """One index row per capture: ``(surt, ts, url, digest, length)``,
    globally ordered by (surt, ts, url) — ``ts`` in the CDX
    ``yyyyMMddHHmmss`` form, ``digest`` the md5 of the payload,
    ``length`` its byte length. Everything is a native expression; at
    100 TB the payload column is consumed in the scan stage (digest +
    length) and only index-sized rows reach the sort exchange."""
    return (
        df.select(
            surt_expr(url_col).alias("surt"),
            F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
            F.col(url_col).alias("url"),
            F.md5(F.col(payload_col).cast("binary")).alias("digest"),
            F.octet_length(F.col(payload_col)).cast("long").alias("length"),
        )
        .orderBy("surt", "ts", "url")
    )


def write_cdx(
    records: DataFrame,
    path: str,
    n_files: int = 8,
    compress: bool = True,
) -> list[str]:
    """Write CDXJ shard files under ``path``; returns the paths. Input
    is :func:`cdx_records` output (or anything with surt/ts/url +
    extra fields). Range-partitioned on (surt, ts, url) + sorted within
    each shard: concatenating shards in filename order yields one
    globally sorted index. Line format is the public CDXJ one:
    ``<surt> <ts> <json fields>``."""
    os.makedirs(path, exist_ok=True)
    ext = ".cdx.gz" if compress else ".cdx"
    fields = [c for c in records.columns if c not in ("surt", "ts")]
    slim = records.repartitionByRange(n_files, "surt", "ts", "url").sortWithinPartitions(
        "surt", "ts", "url"
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"cdx-{pid:05d}{ext}")
        opener = (
            (lambda p: _gzip.GzipFile(filename=p, mode="wb", mtime=0))
            if compress
            else (lambda p: open(p, "wb"))
        )
        fh = None
        n = 0
        first = last = None
        for pdf in batches:
            if fh is None:
                fh = opener(fname)
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                meta = {k: d[k] for k in fields if d[k] is not None}
                line = f"{d['surt']} {d['ts']} {json.dumps(meta, sort_keys=True)}\n"
                fh.write(line.encode("utf-8"))
                if first is None:
                    first = d["surt"]
                last = d["surt"]
                n += 1
        if fh is not None:
            fh.close()
            yield pd.DataFrame(
                {
                    "cdx_file": [fname],
                    "n_records": [n],
                    "first_key": [first],
                    "last_key": [last],
                }
            )

    written = slim.mapInPandas(
        write_partition,
        "cdx_file string, n_records long, first_key string, last_key string",
    ).collect()
    return sorted(r["cdx_file"] for r in written)


def read_cdx(spark, path: str) -> DataFrame:
    """Scan CDXJ shards back into (surt, ts, url, digest, length, ...).
    One task per gz file; JSON fields surface as a map column plus the
    standard typed columns."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if name.endswith(".gz"):
                    data = _gzip.decompress(data)
                for line in data.decode("utf-8").splitlines():
                    if not line:
                        continue
                    surt, ts, meta = line.split(" ", 2)
                    m = json.loads(meta)
                    rows.append(
                        {
                            "surt": surt,
                            "ts": ts,
                            "url": m.get("url"),
                            "digest": m.get("digest"),
                            "length": m.get("length"),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["surt", "ts", "url", "digest", "length"]
            )

    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "cdx-*")
        .load(path)
        .select("path", "content")
    )
    return binf.mapInPandas(
        parse, "surt string, ts string, url string, digest string, length long"
    )


def revisit_records(
    captures: DataFrame,
    surt_col: str = "surt",
    ts_col: str = "ts",
    url_col: str = "url",
    digest_col: str = "digest",
    length_col: str = "length",
) -> DataFrame:
    """Digest-based capture deduplication — the WARC ``revisit`` record
    construction (public warc-specifications "revisit" profile
    ``identical-payload-digest``, the mechanism web archives use to
    avoid re-storing unchanged pages across crawls): within one SURT
    key, the earliest capture of each distinct payload digest is the
    stored ``response``; every later capture with the same digest
    becomes a ``revisit`` that points back at the original via
    ``refers_to_ts`` and stores zero payload bytes.

    Output = the capture index plus ``record_type``
    (``response``/``revisit``), ``refers_to_ts`` (null on responses),
    and ``stored_length`` (payload bytes for responses, 0 for
    revisits — the storage the policy actually writes).

    Scale shape: ONE hash exchange on ``(surt, digest)`` and a window
    inside it — rows are index-sized (the payload never reaches this
    operator; :func:`cdx_records` consumed it in the scan stage). Ties
    on timestamp break by url, so the assignment is total-order
    deterministic on any engine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(surt_col, digest_col).orderBy(ts_col, url_col)
    rn = F.row_number().over(w)
    first_ts = F.first(F.col(ts_col)).over(w)
    return captures.select(
        surt_col,
        ts_col,
        url_col,
        digest_col,
        F.col(length_col),
        F.when(rn == 1, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "record_type"
        ),
        F.when(rn > 1, first_ts).alias("refers_to_ts"),
        F.when(rn == 1, F.col(length_col)).otherwise(F.lit(0)).cast("long").alias(
            "stored_length"
        ),
    )


def revisit_stats(
    captures: DataFrame,
    surt_col: str = "surt",
    ts_col: str = "ts",
    url_col: str = "url",
    digest_col: str = "digest",
    length_col: str = "length",
) -> DataFrame:
    """Per-SURT storage ledger of the revisit policy: captures vs
    distinct payloads, revisit count, bytes fetched vs bytes stored,
    and ``saved_frac`` (4-dec half-up). Composes :func:`revisit_records`
    then ONE map-side-combined groupBy on the key — the same single
    exchange, since the window already partitioned by (surt, digest)
    and the rollup keys by its prefix."""
    recs = revisit_records(
        captures, surt_col, ts_col, url_col, digest_col, length_col
    )
    is_rev = (F.col("record_type") == "revisit").cast("int")
    return recs.groupBy(surt_col).agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.count_distinct(F.col(digest_col)).alias("n_payloads"),
        F.sum(is_rev).cast("long").alias("n_revisits"),
        F.sum(F.col(length_col)).cast("long").alias("bytes_fetched"),
        F.sum("stored_length").cast("long").alias("bytes_stored"),
        (
            F.floor(
                (F.sum(F.col(length_col)) - F.sum("stored_length"))
                / F.greatest(F.sum(F.col(length_col)), F.lit(1))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("saved_frac"),
    )


def retention_sample(
    captures: DataFrame,
    surt_col: str = "surt",
    ts_col: str = "ts",
    url_col: str = "url",
    keep_last: int = 3,
    monthly: bool = True,
) -> DataFrame:
    """Temporal capture retention — the archive-pruning policy shape
    (keep the N most recent captures of every URL, plus one capture
    per calendar month for history): adds ``keep`` and ``reason``
    (``recent`` beats ``monthly`` beats ``expired``) to the index.

    CDX timestamps sort lexicographically (yyyyMMddHHmmss — the
    format's design point), so recency is a plain string window and
    the month bucket is ``substr(ts, 1, 6)``. Both windows partition
    by (a prefix of) the surt key: ONE hash exchange total, index-sized
    rows. Ties on ts break by url — fully deterministic retention.
    """
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    from pyspark.sql import Window

    w_recent = Window.partitionBy(surt_col).orderBy(
        F.desc(ts_col), F.asc(url_col)
    )
    w_month = Window.partitionBy(
        surt_col, F.substring(F.col(ts_col), 1, 6)
    ).orderBy(F.desc(ts_col), F.asc(url_col))
    out = captures.withColumn(
        "__rn", F.row_number().over(w_recent)
    )
    if monthly:
        out = out.withColumn("__mrn", F.row_number().over(w_month))
    else:
        out = out.withColumn("__mrn", F.lit(None).cast("int"))
    reason = (
        F.when(F.col("__rn") <= keep_last, F.lit("recent"))
        .when(F.col("__mrn") == 1, F.lit("monthly"))
        .otherwise(F.lit("expired"))
    )
    return (
        out.withColumn("reason", reason)
        .withColumn("keep", F.col("reason") != "expired")
        .drop("__rn", "__mrn")
    )
