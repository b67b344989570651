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
