"""WET source/sink: WARC-1.0 conversion-record round-trip, byte-level
reproducibility, and malformed-input robustness."""

import gzip
import hashlib
import shutil

import pyspark.sql.functions as F

from walker_spark.sources.wet import read_wet, write_wet


def _docs(spark, n=80):
    return spark.createDataFrame(
        [(i, f"doc {i} body with words " + "x " * (i % 17)) for i in range(n)],
        "doc_id long, text string",
    )


def test_wet_roundtrip(spark, tmp_path):
    d = _docs(spark)
    files = write_wet(d, str(tmp_path / "wet"), n_files=3)
    assert files and all(f.endswith(".warc.wet.gz") for f in files)
    back = read_wet(spark, str(tmp_path / "wet") + "/*.warc.wet.gz")
    got = {
        (r["doc_id"], r["t"]): r["content_length"]
        for r in back.select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
            F.col("text").alias("t"),
            "content_length",
        ).collect()
    }
    want = {(r["doc_id"], r["text"]) for r in d.collect()}
    assert set(got) == want
    # Content-Length header matches payload bytes
    assert all(cl == len(t.encode()) for (_, t), cl in got.items())


def test_wet_unicode_and_plain(spark, tmp_path):
    d = spark.createDataFrame(
        [(0, "naïve — héllo ✓"), (1, ""), (2, "plain ascii")],
        "doc_id long, text string",
    )
    write_wet(d, str(tmp_path / "w"), n_files=1, compress=False)
    back = read_wet(spark, str(tmp_path / "w") + "/*.warc.wet").collect()
    by_id = {
        int(r["target_uri"].rsplit("/", 1)[1]): r for r in back
    }
    assert by_id[0]["text"] == "naïve — héllo ✓"
    assert by_id[0]["content_length"] == len("naïve — héllo ✓".encode())
    assert by_id[1]["text"] == ""


def test_wet_byte_deterministic(spark, tmp_path):
    """Same corpus, different input partitioning → byte-identical files
    (per-shard sort + fixed gzip mtime)."""
    d = _docs(spark, 120)
    f1 = write_wet(d, str(tmp_path / "a"), n_files=4)
    f2 = write_wet(d.repartition(11), str(tmp_path / "b"), n_files=4)
    h = lambda fs: sorted(hashlib.md5(open(f, "rb").read()).hexdigest() for f in fs)  # noqa: E731
    assert h(f1) == h(f2)


def test_wet_malformed_files(spark, tmp_path):
    """A truncated record ends that file's scan (one counted error);
    other files parse fully; no task failure. A corrupt gzip member is
    one error and zero records."""
    d = _docs(spark, 40)
    files = write_wet(d, str(tmp_path / "m"), n_files=2, compress=False)
    raw = open(files[0], "rb").read()
    open(str(tmp_path / "m" / "broken.warc.wet"), "wb").write(raw[: len(raw) // 2] + b"JUNK")
    open(str(tmp_path / "m" / "badgz.warc.wet.gz"), "wb").write(b"\x1f\x8bnot really gzip")
    out = read_wet(spark, str(tmp_path / "m") + "/*.warc.wet*", with_errors=True)
    summaries = {
        r["wet_file"].rsplit("/", 1)[1]: r["content_length"]
        for r in out.filter(F.col("record_id") == "<parse-summary>").collect()
    }
    assert summaries["broken.warc.wet"] == 1
    assert summaries["badgz.warc.wet.gz"] == 1
    assert all(v == 0 for k, v in summaries.items() if k.startswith("wet-"))
    records = out.filter(F.col("record_id") != "<parse-summary>")
    # the two intact files still yield the full corpus
    assert records.filter(F.col("wet_file").rlike(r"wet-\d+")).count() == 40
    # the truncated copy yields a strict prefix of its intact twin
    n_broken = records.filter(F.col("wet_file").contains("broken")).count()
    twin = files[0].rsplit("/", 1)[1]
    n_twin = records.filter(F.col("wet_file").endswith(twin)).count()
    assert n_broken < n_twin


def test_export_crawl_wet(spark, tmp_path):
    """Crawl results → WET: only successful fetches with text ship;
    the URL is Target-URI and record key; re-export is byte-identical."""
    import hashlib

    rows = [
        ("https://h.example/a", 200, "extracted text of page a"),
        ("https://h.example/b", 200, "extracted text of page b"),
        ("https://h.example/dead", 404, None),       # dropped: code
        ("https://h.example/empty", 200, ""),        # dropped: no text
        ("https://h.example/redir", 301, "ignored"),  # dropped: code
    ]
    results = spark.createDataFrame(rows, "url string, code int, text string")
    from walker_spark.sources.wet import export_crawl_wet

    f1 = export_crawl_wet(results, str(tmp_path / "x"), n_files=2)
    back = read_wet(spark, str(tmp_path / "x") + "/*.warc.wet.gz").collect()
    assert {(r["target_uri"], r["text"]) for r in back} == {
        ("https://h.example/a", "extracted text of page a"),
        ("https://h.example/b", "extracted text of page b"),
    }
    f2 = export_crawl_wet(results.repartition(3), str(tmp_path / "y"), n_files=2)
    h = lambda fs: sorted(hashlib.md5(open(f, "rb").read()).hexdigest() for f in fs)  # noqa: E731
    assert h(f1) == h(f2)
