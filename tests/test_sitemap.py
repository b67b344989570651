"""Sitemap source/sink: round-trip fidelity, index records, seed
normalization, spec-limit bomb guards, malformed-input robustness."""

import gzip
import hashlib

import pyspark.sql.functions as F

from walker_spark.sources.sitemap import (
    MAX_ENTRIES,
    _parse_sitemap_bytes,
    read_sitemaps,
    sitemap_seeds,
    write_sitemaps,
)


def _docs(spark, n=60):
    return spark.createDataFrame(
        [
            (
                i,
                f"h{i % 3}.example",
                f"https://h{i % 3}.example/p/{i}",
                f"2026-02-{(i % 28) + 1:02d}",
                ((i % 9) + 1) / 10.0,
            )
            for i in range(n)
        ],
        "doc_id long, host string, loc string, lastmod string, prio double",
    )


def test_sitemap_roundtrip_and_index(spark, tmp_path):
    d = _docs(spark)
    files = write_sitemaps(
        d, str(tmp_path / "sm"), loc_col="loc", group_col="host",
        lastmod_col="lastmod", priority_col="prio",
    )
    assert len(files) == 4  # 3 per-host sitemaps + index
    parsed = read_sitemaps(spark, str(tmp_path / "sm") + "/*")
    kinds = {r["kind"]: r["count"] for r in parsed.groupBy("kind").count().collect()}
    assert kinds == {"sitemap": 3, "url": 60}
    got = {
        r["loc"]: (r["lastmod"], r["priority"])
        for r in parsed.filter(F.col("kind") == "url").collect()
    }
    for r in d.collect():
        assert got[r["loc"]] == (r["lastmod"], r["prio"])
    # index entries point at the written per-host files
    idx_locs = {
        r["loc"] for r in parsed.filter(F.col("kind") == "sitemap").collect()
    }
    assert idx_locs == {f"file://{f}" for f in files[:-1]}


def test_sitemap_seeds_canonicalized(spark, tmp_path):
    d = spark.createDataFrame(
        [
            (0, "h.example", "https://h.example/b?z=1&a=2"),
            (1, "h.example", "https://h.example:443/b?a=2&z=1"),  # same canon
            (2, "h.example", "https://h.example/c#frag"),
        ],
        "doc_id long, host string, loc string",
    )
    write_sitemaps(d, str(tmp_path / "sm"), loc_col="loc", group_col="host")
    seeds = sitemap_seeds(read_sitemaps(spark, str(tmp_path / "sm") + "/*")).collect()
    urls = sorted(r["url"] for r in seeds)
    assert urls == ["https://h.example/b?a=2&z=1", "https://h.example/c"]
    assert all(r["host"] == "h.example" for r in seeds)


def test_sitemap_byte_deterministic(spark, tmp_path):
    d = _docs(spark, 90)
    f1 = write_sitemaps(d, str(tmp_path / "a"), loc_col="loc", group_col="host")
    f2 = write_sitemaps(d.repartition(7), str(tmp_path / "b"), loc_col="loc", group_col="host")
    # per-host files byte-identical; the index embeds absolute paths so
    # it is compared structurally in test_sitemap_roundtrip_and_index
    h = lambda fs: sorted(hashlib.md5(open(f, "rb").read()).hexdigest() for f in fs[:-1])  # noqa: E731
    assert h(f1) == h(f2)


def test_sitemap_guards():
    # entry cap: spec's 50k limit stops a crafted mega-file
    body = b"".join(
        b"<url><loc>u%d</loc></url>" % i for i in range(MAX_ENTRIES + 5)
    )
    rows, errors = _parse_sitemap_bytes("f", b"<urlset>" + body + b"</urlset>")
    assert len(rows) == MAX_ENTRIES and errors == 1
    # bomb: tiny gzip inflating past 50 MB is rejected, not inflated
    rows, errors = _parse_sitemap_bytes(
        "g", gzip.compress(b"<urlset>" + b"A" * (60 * 1024 * 1024))
    )
    assert rows == [] and errors == 1
    # malformed XML: parseable prefix survives, one counted error
    rows, errors = _parse_sitemap_bytes(
        "h", b"<urlset><url><loc>ok</loc></url><url><loc>broken"
    )
    assert [r["loc"] for r in rows] == ["ok"] and errors == 1
    # truncated gzip member
    rows, errors = _parse_sitemap_bytes("t", gzip.compress(b"<urlset></urlset>")[:10])
    assert rows == [] and errors == 1
    # junk <priority>: keep the URL, drop the field, no error
    rows, errors = _parse_sitemap_bytes(
        "p", b"<urlset><url><loc>u</loc><priority>n/a</priority></url></urlset>"
    )
    assert [(r["loc"], r["priority"]) for r in rows] == [("u", None)] and errors == 0


def test_sitemap_malformed_in_spark(spark, tmp_path):
    d = _docs(spark, 10)
    write_sitemaps(d, str(tmp_path / "sm"), loc_col="loc", group_col="host")
    (tmp_path / "sm" / "junk.xml").write_bytes(
        b"<urlset><url><loc>x</loc></url><url><loc>y"
    )
    out = read_sitemaps(spark, str(tmp_path / "sm") + "/*", with_errors=True)
    summ = {
        r["sitemap_file"].rsplit("/", 1)[1]: r["priority"]
        for r in out.filter(F.col("kind") == "<parse-summary>").collect()
    }
    assert summ["junk.xml"] == 1.0
    assert all(v == 0.0 for k, v in summ.items() if k != "junk.xml")
    assert out.filter(F.col("kind") == "url").count() == 11  # 10 + junk's prefix


def test_seeds_from_robots(spark, tmp_path):
    """REP Sitemap: directives in robots.txt drive seed expansion; the
    robots PARSER carries them (cross-group field) and rule parsing is
    unaffected."""
    from walker_spark.functions.robots import parse_robots
    from walker_spark.sources.sitemap import seeds_from_robots

    d = spark.createDataFrame(
        [
            (0, "a.example", "https://a.example/p/1"),
            (1, "a.example", "https://a.example/p/2"),
            (2, "b.example", "https://b.example/q/1"),
        ],
        "doc_id long, host string, loc string",
    )
    files = write_sitemaps(d, str(tmp_path / "sm"), loc_col="loc", group_col="host")
    by_host = {f.rsplit("sitemap-", 1)[1].split(".xml")[0]: f for f in files[:-1]}
    robots = {
        "a.example": (
            "User-agent: *\nDisallow: /private/\n"
            f"Sitemap: file://{by_host['a.example']}\n"
        ),
        "b.example": f"Sitemap: {by_host['b.example']}\n",  # bare path form
        "c.example": "User-agent: *\nDisallow:\n",          # no sitemap
    }
    rd = parse_robots(robots["a.example"])
    assert rd.sitemaps == [f"file://{by_host['a.example']}"]
    assert not rd.find_group("walker").test("/private/x")   # rules still parse
    seeds = {(r["url"], r["host"]) for r in seeds_from_robots(spark, robots).collect()}
    assert seeds == {
        ("https://a.example/p/1", "a.example"),
        ("https://a.example/p/2", "a.example"),
        ("https://b.example/q/1", "b.example"),
    }
