"""Host-level curation: suffix semantics, longest-match blocklist,
per-host caps, registered-domain rollup."""

import pyspark.sql.functions as F

from walker_spark.functions.hosts import (
    host_blocklist_filter,
    host_cap,
    host_stats,
    host_suffixes_expr,
)


def test_host_suffixes(spark):
    df = spark.createDataFrame(
        [("a.b.example",), ("example",), ("B.EXAMPLE",)], "h string"
    )
    got = {r["h"]: r["s"] for r in df.select("h", host_suffixes_expr(F.col("h")).alias("s")).collect()}
    assert got["a.b.example"] == ["a.b.example", "b.example"]
    assert got["example"] == []          # single label: no ≥2-label suffix
    assert got["B.EXAMPLE"] == ["b.example"]  # lowercased


def test_host_blocklist_longest_match(spark):
    docs = spark.createDataFrame(
        [
            (0, "a.spam.example"),     # blocked by spam.example
            (1, "spam.example"),       # exact rule match
            (2, "notspam.example"),    # suffix is label-wise: NOT blocked
            (3, "x.deep.spam.example"),  # deep.spam.example is more specific
            (4, "clean.example"),
        ],
        "doc_id long, host string",
    )
    rules = spark.createDataFrame(
        [("spam.example",), ("deep.spam.example",)], "rule string"
    )
    out = {r["doc_id"]: r for r in host_blocklist_filter(docs, rules).collect()}
    assert out[0]["blocked"] and out[0]["matched_rule"] == "spam.example"
    assert out[1]["blocked"] and out[1]["matched_rule"] == "spam.example"
    assert not out[2]["blocked"] and out[2]["matched_rule"] is None
    assert out[3]["matched_rule"] == "deep.spam.example"  # longest wins
    assert not out[4]["blocked"]


def test_host_cap_and_stats(spark):
    docs = spark.createDataFrame(
        [(i, f"h{i % 3}.src{i % 2}.example", "tok " * (1 + i % 5)) for i in range(60)],
        "doc_id long, host string, text string",
    )
    capped = host_cap(docs, max_per_host=4)
    per = capped.groupBy("host").count().collect()
    assert all(r["count"] <= 4 for r in per)
    # deterministic under repartitioning
    again = host_cap(docs.repartition(7), max_per_host=4)
    assert {r["doc_id"] for r in capped.collect()} == {r["doc_id"] for r in again.collect()}

    st = {r["registered_domain"]: r for r in host_stats(docs).collect()}
    assert set(st) == {"src0.example", "src1.example"}
    assert st["src0.example"]["n_docs"] == 30
    assert st["src0.example"]["n_hosts"] == 3
    total_tok = sum(1 + i % 5 for i in range(60) if i % 2 == 0)
    assert st["src0.example"]["n_tokens"] == total_tok


def test_registered_domains_psl_semantics(spark):
    from walker_spark.functions.hosts import registered_domains

    hosts = spark.createDataFrame(
        [
            ("www.example.co.uk",),   # longest rule co.uk beats uk
            ("example.co.uk",),
            ("co.uk",),               # bare public suffix -> NULL rd
            ("deep.a.example.com",),
            ("tenant.github.io",),    # private-domain rule
            ("sub.tenant.github.io",),
            ("a.b.foo.ck",),          # wildcard *.ck -> ps = foo.ck
            ("foo.ck",),              # host IS a wildcard public suffix
            ("www.ck",),              # exception !www.ck -> ps=ck, rd=www.ck
            ("sub.www.ck",),
            ("WWW.EXAMPLE.COM",),     # case folding
            ("unknowntld",),          # single label, no rule
            ("x.unknowntld",),        # implicit * rule
        ],
        "host string",
    )
    out = {r["host"]: (r["public_suffix"], r["registered_domain"])
           for r in registered_domains(hosts).collect()}
    assert out["www.example.co.uk"] == ("co.uk", "example.co.uk")
    assert out["example.co.uk"] == ("co.uk", "example.co.uk")
    assert out["co.uk"] == ("co.uk", None)
    assert out["deep.a.example.com"] == ("com", "example.com")
    assert out["tenant.github.io"] == ("github.io", "tenant.github.io")
    assert out["sub.tenant.github.io"] == ("github.io", "tenant.github.io")
    # PSL: rule *.ck has TWO labels — the public suffix is the matched
    # two labels (foo.ck), the registered domain one label more
    assert out["a.b.foo.ck"] == ("foo.ck", "b.foo.ck")
    assert out["foo.ck"] == ("foo.ck", None)
    assert out["www.ck"] == ("ck", "www.ck")
    assert out["sub.www.ck"] == ("ck", "www.ck")
    assert out["WWW.EXAMPLE.COM"] == ("com", "example.com")
    assert out["unknowntld"] == ("unknowntld", None)
    assert out["x.unknowntld"] == ("unknowntld", "x.unknowntld")
