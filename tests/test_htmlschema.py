"""Schema validator (H4) tests mirroring the reference example schemas
(htmlschema/example/schema/) and loader/validator quirks."""

import pyspark.sql.functions as F
import pytest

from walker_spark.functions.htmlschema import (
    GroupValidator,
    load_schema_html,
    validate,
)

DEFAULT_SCHEMA = """
<html>
    <head>
        <title val:score=10 val:min-length=10>we need a title</title>
    </head>
    <body>
        <val:selector selector="h1">
            <h1 val:score=100>A Title</h1>
        </val:selector>
        <val:selector selector="img">
            <img val:attr="alt;min-length:4">
        </val:selector>
    </body>
</html>
"""

NAV_COMPONENT = """
<nav val:score=100>
    <ul>
        <li val:min=2 val:max=10 val:score=10>Title</li>
    </ul>
</nav>
"""

PRODUCT_SCHEMA = """
<html>
    <head>
        <title val:score=10>my product</title>
        <meta property="og:title" val:attr="content;min-length:10;max-length:100" />
        <meta property="og:url" content="*">
    </head>
    <body>
        <header>
            <ref>components/nav.html</ref>
        </header>
    </body>
</html>
"""


def test_loader_defaults_and_occurrence_attrs():
    s = load_schema_html("<div val:score=5><span val:optional></span><i val:forbidden></i><b val:count=3></b></div>")
    d = s.elements[0]
    assert (d.min_occurrence, d.max_occurrence, d.score) == (1, 1, 5)
    span, i, b = d.children
    assert (span.min_occurrence, span.max_occurrence) == (0, -1)
    assert (i.min_occurrence, i.max_occurrence) == (-1, 0)
    assert (b.min_occurrence, b.max_occurrence) == (3, 3)


def test_good_page_scores():
    s = load_schema_html(DEFAULT_SCHEMA)
    good = """<html><head><title>long enough title</title></head>
    <body><h1>Hello</h1><img alt="a description" src="x.png"></body></html>"""
    r = validate(s, good)
    # html(0) + head(0) + title(10) + body(0) + h1 via selector (100) + img rules pass
    assert r.score == 110
    assert r.validations == []


def test_violations():
    s = load_schema_html(DEFAULT_SCHEMA)
    bad = """<html><head><title>short</title></head>
    <body><h1>t</h1><h1>t2</h1><img alt="ab" src="x.png"></body></html>"""
    r = validate(s, bad)
    types = sorted(v.type for v in r.validations)
    # title too short (content) + img alt too short (attribute)
    assert types == ["attribute", "content"]
    # two h1 via selector each score 100 (selectors skip occurrence checks)
    assert r.score == 10 + 100 + 100
    content = [v for v in r.validations if v.type == "content"][0]
    assert content.comment == "content too short got 5 expected 10"
    assert content.path == "html/head/title"


def test_missing_element_occurrence():
    s = load_schema_html("<html><head><title val:score=10></title></head></html>")
    r = validate(s, "<html><head></head></html>")
    occ = [v for v in r.validations if v.type == "occurence-mismatch"]
    assert len(occ) == 1
    assert occ[0].comment == "too few elements of <title> got 0 expected at least 1"


def test_forbidden_element():
    s = load_schema_html('<body><i val:forbidden val:score=1000>x</i></body>')
    r = validate(s, "<body><i>nope</i></body>")
    assert any(
        v.type == "occurence-mismatch" and "not more than 0" in v.comment and v.penalty == 1000
        for v in r.validations
    )
    r2 = validate(s, "<body></body>")
    assert r2.validations == []


def test_wildcard_and_exact_attribute_match():
    s = load_schema_html(
        '<head><meta property="og:url" content=* val:score=7><meta property="og:type" content="product" val:score=3></head>'
    )
    ok = '<head><meta property="og:url" content="https://x"><meta property="og:type" content="product"></head>'
    r = validate(s, ok)
    assert r.score == 10 and r.validations == []
    # empty content fails the * wildcard; wrong value fails exact
    bad = '<head><meta property="og:url" content=""><meta property="og:type" content="article"></head>'
    r2 = validate(s, bad)
    assert len([v for v in r2.validations if v.type == "occurence-mismatch"]) == 2


def test_ref_include():
    s = load_schema_html(
        PRODUCT_SCHEMA, name="product.html", includes={"components/nav.html": NAV_COMPONENT}
    )
    # the <ref> merged nav into header's children
    header = s.elements[0].children[1].children[0]
    assert header.name == "header"
    assert header.children[0].name == "nav" and header.children[0].score == 100

    good = """<html><head><title>p</title>
      <meta property="og:title" content="long enough title">
      <meta property="og:url" content="https://x"></head>
      <body><header><nav><ul><li>a</li><li>b</li></ul></nav></header></body></html>"""
    r = validate(s, good)
    # title 10 + nav 100 + 2×li×10 = 130 (+ul etc score 0)
    assert r.score == 130
    assert r.validations == []

    one_li = good.replace("<li>b</li>", "")
    r2 = validate(s, one_li)
    assert any(
        v.type == "occurence-mismatch" and "at least 2" in v.comment for v in r2.validations
    )


def test_regex_rule_urlescaped():
    # content/index.html quirk: regex arrives URL-escaped (%5E(de|en)%24)
    s = load_schema_html('<html val:attr="lang;regex:%5E%28de%7Cen%29%24;length:2"></html>')
    assert validate(s, '<html lang="de"></html>').validations == []
    r = validate(s, '<html lang="fr-FR"></html>')
    assert {v.type for v in r.validations} == {"attribute"}
    assert len(r.validations) == 2  # regex AND length rule both fail


def test_group_validator_resolution():
    gv = GroupValidator.from_dict(
        {
            "default": DEFAULT_SCHEMA,
            "catalogue/product": PRODUCT_SCHEMA,
        },
        includes={"components/nav.html": NAV_COMPONENT},
    )
    assert gv.schema_for("default") is not None
    assert gv.schema_for("catalogue/product") is not None
    assert gv.schema_for("nope/nope") is None
    rep = gv.validate("default", "<html><head><title>long enough title</title></head><body><h1>x</h1></body></html>")
    assert rep.score == 110


def test_validate_udf_and_metrics(spark):
    from walker_spark.functions.htmlschema import validate_udf, validation_metrics

    gv = GroupValidator.from_dict({"default": DEFAULT_SCHEMA})
    rows = [
        ("https://h.example/a/p1.html", "default",
         b"<html><head><title>long enough title</title></head><body><h1>x</h1></body></html>"),
        ("https://h.example/b/p2.html", "default",
         b"<html><head><title>short</title></head><body></body></html>"),
        ("https://h.example/a/p3.html", "unknown-group", b"<html></html>"),
    ]
    df = spark.createDataFrame(
        [(u, g, bytearray(h)) for u, g, h in rows], "url string, group string, html binary"
    )
    udf = validate_udf(spark, gv)
    out = df.withColumn("validation_report", udf(F.col("group"), F.col("html")))
    got = {r["url"]: r["validation_report"] for r in out.collect()}
    assert got["https://h.example/a/p1.html"]["score"] == 110
    assert got["https://h.example/a/p3.html"]["score"] is None  # no schema for group
    bad = got["https://h.example/b/p2.html"]
    assert bad["score"] == 10  # title present (10), no h1 match (+0)
    assert any(v["type"] == "content" for v in bad["validations"])

    scores, penalties = validation_metrics(out, ["/a", "/b"])
    sc = {(r["group"], r["path"]): r["score"] for r in scores.collect()}
    # p1 (110) under /a; p3 has no report (filtered); p2 (10) under /b
    assert sc == {("default", "/a"): 110, ("default", "/b"): 10}
    pen = {
        (r["group"], r["path"], r["validation_type"]): r["penalty"]
        for r in penalties.collect()
    }
    assert pen[("default", "/b", "content")] == 10
