"""CDX index: SURT dialect unit checks, global sortedness of the
sharded sink, and a write → read round-trip."""

import gzip
import os

from pyspark.sql import functions as F

from walker_spark.sources.cdx import cdx_records, read_cdx, surt_expr, write_cdx


def test_surt_dialect(spark):
    cases = {
        "HTTP://WWW.Example.COM:80/A/B?b=2&a=1#frag": "com,example,www)/a/b?a=1&b=2",
        "https://user:pw@sub.ex.org:8443/": "org,ex,sub:8443)/",
        "https://ex.org": "org,ex)/",
        "https://ex.org?q=1": "org,ex)/?q=1",
        "http://ex.org:443/x": "org,ex)/x",  # 443 stripped regardless of scheme
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["surt"] for r in df.select("url", surt_expr("url").alias("surt")).collect()}
    assert got == cases


def test_cdx_write_read_roundtrip(spark, tmp_path):
    d = spark.range(0, 200).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 13).alias("warc_ts"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )
    recs = cdx_records(d)
    out = str(tmp_path / "cdx")
    files = write_cdx(recs, out, n_files=4)
    assert files and all(os.path.exists(f) for f in files)

    # concatenating shards in filename order yields ONE sorted index
    lines = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            lines.extend(fh.read().splitlines())
    keys = [(ln.split(" ", 2)[0], ln.split(" ", 2)[1]) for ln in lines]
    assert len(lines) == 200
    assert keys == sorted(keys)

    back = read_cdx(spark, out)
    exp = {(r["surt"], r["ts"], r["url"], r["digest"], r["length"])
           for r in recs.collect()}
    got = {(r["surt"], r["ts"], r["url"], r["digest"], r["length"])
           for r in back.collect()}
    assert got == exp


def test_revisit_records_semantics(spark):
    from walker_spark.sources.cdx import revisit_records, revisit_stats

    caps = spark.createDataFrame(
        [
            # one URL, digests A B A A across four crawls
            ("com,ex)/p", "20240101000000", "http://ex.com/p", "A", 100),
            ("com,ex)/p", "20240201000000", "http://ex.com/p", "B", 120),
            ("com,ex)/p", "20240301000000", "http://ex.com/p", "A", 100),
            ("com,ex)/p", "20240401000000", "http://ex.com/p", "A", 100),
            # other URL, never re-captured
            ("com,ex)/q", "20240101000000", "http://ex.com/q", "C", 50),
        ],
        "surt string, ts string, url string, digest string, length long",
    )
    recs = {(r["surt"], r["ts"]): r for r in revisit_records(caps).collect()}
    r1 = recs[("com,ex)/p", "20240101000000")]
    assert r1["record_type"] == "response" and r1["refers_to_ts"] is None
    assert r1["stored_length"] == 100
    for ts in ("20240301000000", "20240401000000"):
        r = recs[("com,ex)/p", ts)]
        assert r["record_type"] == "revisit"
        assert r["refers_to_ts"] == "20240101000000"  # the ORIGINAL, not prior
        assert r["stored_length"] == 0
    assert recs[("com,ex)/p", "20240201000000")]["record_type"] == "response"
    assert recs[("com,ex)/q", "20240101000000")]["record_type"] == "response"

    st = {r["surt"]: r for r in revisit_stats(caps).collect()}
    p = st["com,ex)/p"]
    assert (p["n_captures"], p["n_payloads"], p["n_revisits"]) == (4, 2, 2)
    assert p["bytes_fetched"] == 420 and p["bytes_stored"] == 220
    assert p["saved_frac"] == 0.4762
    q = st["com,ex)/q"]
    assert q["n_revisits"] == 0 and q["saved_frac"] == 0.0


def test_retention_sample(spark):
    from walker_spark.sources.cdx import retention_sample

    caps = spark.createDataFrame(
        [
            # one URL, two months, 3 captures in the newer month
            ("k)/a", "20240305000000", "u"),
            ("k)/a", "20240310000000", "u"),
            ("k)/a", "20240320000000", "u"),
            ("k)/a", "20240201000000", "u"),
            ("k)/a", "20240215000000", "u"),
        ],
        "surt string, ts string, url string",
    )
    out = {r["ts"]: r for r in retention_sample(caps, keep_last=2).collect()}
    assert out["20240320000000"]["reason"] == "recent"
    assert out["20240310000000"]["reason"] == "recent"
    # newest of March already kept as recent; Feb newest kept monthly
    assert out["20240215000000"]["reason"] == "monthly"
    assert out["20240201000000"]["reason"] == "expired"
    assert out["20240305000000"]["reason"] == "expired"
    assert sum(1 for r in out.values() if r["keep"]) == 3

    # monthly=False: pure keep-last
    pure = {r["ts"]: r["keep"] for r in retention_sample(caps, keep_last=1, monthly=False).collect()}
    assert pure == {"20240320000000": True, "20240310000000": False,
                    "20240305000000": False, "20240215000000": False,
                    "20240201000000": False}
