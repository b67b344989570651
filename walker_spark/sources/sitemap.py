"""Sitemap (sitemaps.org XML) source + sink — seed expansion for a
web-scale crawl: a host's ``sitemap.xml`` (or ``sitemapindex``) is the
publisher-declared URL inventory, and crawl pipelines use it both to
seed frontiers and to reconcile discovered-vs-declared coverage.

Public spec (sitemaps.org/protocol.html): ``<urlset><url><loc>…`` with
optional ``lastmod/changefreq/priority``; an index file nests
``<sitemap><loc>…``. The spec's own hard limits — 50 000 entries and
50 MB uncompressed per file — double as decompression-bomb guards
here: parsing STOPS (with a counted error) past either limit.

Scale shape mirrors the WET source: one task per sitemap file via
``binaryFile`` (files are independent by construction; an index fans
out to files), stdlib ``xml.etree.iterparse`` inside ``mapInPandas``
(streaming pull parser — memory stays at one element, not one tree).
Malformed XML yields the parseable prefix plus an error count, never a
task failure.
"""

from __future__ import annotations

import gzip as _gzip
import io
import os
import xml.etree.ElementTree as ET
import zlib as _zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_sitemaps",
    "read_sitemaps",
    "sitemap_seeds",
    "sitemaps_from_robots",
    "seeds_from_robots",
]

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
MAX_ENTRIES = 50_000  # spec limit, also the bomb guard
MAX_BYTES = 50 * 1024 * 1024

_READ_SCHEMA = (
    "sitemap_file string, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)


def write_sitemaps(
    df: DataFrame,
    path: str,
    loc_col: str = "loc",
    group_col: str = "host",
    lastmod_col: str | None = None,
    priority_col: str | None = None,
    compress: bool = True,
    index_name: str = "sitemapindex.xml",
) -> list[str]:
    """Write one ``sitemap[-<group>].xml[.gz]`` per ``group_col`` value
    (one shuffle on the group — a host's sitemap is one file by spec)
    plus a root ``sitemapindex.xml`` naming them. Entries sort by loc
    within a file, so output is byte-deterministic for any input
    partitioning (fixed gzip mtime, same rationale as the WET sink)."""
    os.makedirs(path, exist_ok=True)
    ext = ".xml.gz" if compress else ".xml"
    cols = [
        F.col(group_col).alias("__g"),
        F.col(loc_col).alias("__loc"),
        (F.col(lastmod_col) if lastmod_col else F.lit(None).cast("string")).alias("__lastmod"),
        (F.col(priority_col).cast("double") if priority_col else F.lit(None).cast("double")).alias("__prio"),
    ]
    slim = df.select(*cols).repartition("__g").sortWithinPartitions("__g", "__loc")

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&apos;")
        )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, object] = {}

        def handle(group: str):
            if group not in handles:
                fname = os.path.join(path, f"sitemap-{esc(group)}{ext}")
                fh = (
                    _gzip.GzipFile(filename=fname, mode="wb", mtime=0)
                    if compress
                    else open(fname, "wb")
                )
                fh.write(
                    b'<?xml version="1.0" encoding="UTF-8"?>\n'
                    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                )
                handles[group] = (fname, fh)
            return handles[group][1]

        for pdf in batches:
            for g, loc, lastmod, prio in zip(
                pdf["__g"], pdf["__loc"], pdf["__lastmod"], pdf["__prio"]
            ):
                fh = handle(str(g))
                parts = [f"<loc>{esc(str(loc))}</loc>"]
                if lastmod is not None and not pd.isna(lastmod):
                    parts.append(f"<lastmod>{esc(str(lastmod))}</lastmod>")
                if prio is not None and not pd.isna(prio):
                    parts.append(f"<priority>{prio:.1f}</priority>")
                fh.write(f"  <url>{''.join(parts)}</url>\n".encode())
        out = []
        for fname, fh in handles.values():
            fh.write(b"</urlset>\n")
            fh.close()
            out.append(fname)
        if out:
            yield pd.DataFrame({"file": sorted(out)})

    files = sorted(
        r["file"] for r in slim.mapInPandas(write_partition, "file string").collect()
    )
    idx = os.path.join(path, index_name)
    with open(idx, "wb") as fh:
        fh.write(
            b'<?xml version="1.0" encoding="UTF-8"?>\n'
            b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        )
        for f in files:
            fh.write(f"  <sitemap><loc>file://{esc(f)}</loc></sitemap>\n".encode())
        fh.write(b"</sitemapindex>\n")
    return files + [idx]


def _parse_sitemap_bytes(name: str, blob: bytes) -> tuple[list[dict], int]:
    """Parse one sitemap/sitemapindex file. Returns (rows, n_errors);
    rows carry kind='url' (urlset entries) or kind='sitemap' (index
    entries, for the caller to expand)."""
    if blob[:2] == b"\x1f\x8b":
        try:
            # bounded decompression (zlib wbits=31 = gzip framing): the
            # spec's 50 MB limit IS the bomb guard
            d = _zlib.decompressobj(31)
            blob = d.decompress(blob, MAX_BYTES)
            if d.unconsumed_tail or not d.eof:
                return [], 1
        except _zlib.error:
            return [], 1
    if len(blob) > MAX_BYTES:
        return [], 1
    rows: list[dict] = []
    errors = 0
    try:
        for _ev, el in ET.iterparse(io.BytesIO(blob)):
            tag = el.tag.rsplit("}", 1)[-1]
            if tag not in ("url", "sitemap"):
                continue
            if len(rows) >= MAX_ENTRIES:
                errors += 1
                break

            def child(c):
                node = el.find(_NS + c)
                if node is None:
                    node = el.find(c)
                return None if node is None or node.text is None else node.text.strip()

            prio = child("priority")
            try:
                prio_f = float(prio) if prio is not None else None
            except ValueError:  # junk priority: keep the URL, drop the field
                prio_f = None
            rows.append(
                {
                    "sitemap_file": name,
                    "kind": "url" if tag == "url" else "sitemap",
                    "loc": child("loc") or "",
                    "lastmod": child("lastmod"),
                    "changefreq": child("changefreq"),
                    "priority": prio_f,
                }
            )
            el.clear()  # iterparse: drop handled subtrees, O(1) memory
    except ET.ParseError:
        errors += 1
    return rows, errors


def read_sitemaps(
    spark: SparkSession, path_glob: str, with_errors: bool = False
) -> DataFrame:
    """Parse sitemap files into (sitemap_file, kind, loc, lastmod,
    changefreq, priority); ``kind='sitemap'`` rows are index entries.
    ``with_errors=True`` appends per-file summary rows (kind =
    '<parse-summary>', priority = error count)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["sitemap_file", "kind", "loc", "lastmod", "changefreq", "priority"]
        for pdf in batches:
            for name, blob in zip(pdf["path"], pdf["content"]):
                rows, errors = _parse_sitemap_bytes(str(name), bytes(blob))
                if with_errors:
                    rows = rows + [
                        {
                            "sitemap_file": str(name),
                            "kind": "<parse-summary>",
                            "loc": "",
                            "lastmod": None,
                            "changefreq": None,
                            "priority": float(errors),
                        }
                    ]
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)


def sitemap_seeds(parsed: DataFrame) -> DataFrame:
    """Normalize parsed url-kind rows into crawl seeds: (url, host),
    deduplicated on the canonical URL (the crawler's own canonicalizer,
    urlnorm.py::canonicalize, inside an Arrow batch) — ready to union
    into the crawler's frontier (plans/crawl.py seeds)."""
    from pyspark.sql.functions import pandas_udf

    from ..urlnorm import canonicalize

    @pandas_udf("string")
    def canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: canonicalize(u) if u else None)

    urls = parsed.filter(F.col("kind") == "url").select(
        canon(F.col("loc")).alias("url")
    )
    return (
        urls.filter(F.col("url").isNotNull() & (F.col("url") != ""))
        .distinct()
        .withColumn("host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1))
    )


def sitemaps_from_robots(robots_bodies: dict[str, str]) -> dict[str, list[str]]:
    """Extract each host's declared Sitemap URLs from its robots.txt
    (REP cross-group ``Sitemap:`` field — parsed by the same
    functions/robots.py parser the crawl's gating uses)."""
    from ..functions.robots import parse_robots

    out: dict[str, list[str]] = {}
    for host, body in (robots_bodies or {}).items():
        sms = parse_robots(body or "").sitemaps
        if sms:
            out[host] = sms
    return out


def seeds_from_robots(
    spark: SparkSession, robots_bodies: dict[str, str]
) -> DataFrame:
    """Sitemap-driven seed expansion: read every sitemap the hosts'
    robots.txt declare (``file://``/local paths in this sandbox; on a
    real crawl the fetch tier materializes them first) and return the
    canonicalized (url, host) seed frame for the crawler's frontier.
    Hosts without a Sitemap line contribute nothing; unreadable files
    surface as parse-summary rows, not failures."""
    locs: list[str] = []
    for sms in sitemaps_from_robots(robots_bodies).values():
        for u in sms:
            locs.append(u[7:] if u.startswith("file://") else u)
    if not locs:
        return spark.createDataFrame([], "url string, host string")
    parsed = read_sitemaps(spark, locs)
    return sitemap_seeds(parsed)
