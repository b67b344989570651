"""Property test: the Spark-native filter stack (operators/linkfilter)
must agree with the pure-Python spec (linkcore.filter_scrape_links) on
every input — same surviving links with same counts."""

import random

import pyspark.sql.functions as F
import pytest

from walker_spark.config import CrawlConfig, Target
from walker_spark.functions.robots import parse_robots
from walker_spark.linkcore import LinkLimitations, filter_scrape_links
from walker_spark.urlnorm import normalize_link

HOST = "shop.example"
BASE = f"https://{HOST}"

ROBOTS = """User-agent: *
Disallow: /private/
Allow: /private/open/
Disallow: /*.pdf$
"""

HREF_POOL = [
    "/a/x.html", "/a/y.html", "/b/z.html", "/private/p.html",
    "/private/open/q.html", "/doc.pdf", "/a/x.html#frag", "a/rel.html",
    "https://other.example/ext.html", "http://shop.example/scheme.html",
    "/a/x.html?page=2", "/a/x.html?utm_source=n", "/a/x.html?color=red",
    "/deep/1/2/3/4/5.html", "mailto:x@y.z", "javascript:void(0)",
    "//cdn.example/c.js", "", "/b/z.html?a=1&b=2", "?onlyquery=1",
    # ParseQuery edge cases: percent-encoded names decode before matching
    # (Go url.Values keys), '+' decodes to space, invalid escapes and
    # ';'-segments drop the pair (an all-invalid query string counts as
    # *no* query for ignore_all_queries)
    "/a/x.html?utm%5Fsource=n", "/a/x.html?utm+source=1",
    "/a/x.html?bad%zz=1", "/a/x.html?ok=%zz", "/a/x.html?a;b=1",
    "/a/x.html?utm_source%3D=x", "/a/x.html?=v",
]


def _rand_linklist(rng):
    n = rng.randrange(1, 12)
    links = {}
    for _ in range(n):
        links[rng.choice(HREF_POOL)] = rng.randrange(1, 4)
    return links


CONFIGS = [
    dict(),
    dict(depth=3),
    dict(ignore=["/b/"]),
    dict(ignore_all_queries=True),
    dict(ignore_queries_with=["utm_source"]),
    dict(paging=True),
    dict(target=Target(base_url=BASE, paths=["/a/", "/private/"])),
    dict(depth=4, ignore=["/deep/"], ignore_queries_with=["page", "utm_source"]),
]


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_spark_stack_matches_python_spec(spark, cfg_idx):
    kw = dict(CONFIGS[cfg_idx])
    kw.setdefault("target", Target(base_url=BASE, paths=["/"]))
    conf = CrawlConfig(agent="walker-spark", **kw)
    ll = LinkLimitations(
        depth=conf.depth,
        paging=conf.paging,
        ignore_all_queries=conf.ignore_all_queries,
        ignore_path_prefixes=conf.ignore,
        include_path_prefixes=conf.target.paths,
        ignore_queries_with=conf.ignore_queries_with,
    )
    group = parse_robots(ROBOTS).find_group(conf.agent)
    rng = random.Random(1000 + cfg_idx)

    pages = []
    expected = {}  # (src_url, link) -> count
    for p in range(25):
        src = f"{BASE}/a/src-{p}.html"
        links = _rand_linklist(rng)
        ln = rng.choice(["", "/a/x.html?page=3"])
        lp = rng.choice(["", "/a/x.html?page=1"])
        nn = normalize_link(BASE, ln) or ""
        pn = normalize_link(BASE, lp) or ""
        robots_meta = rng.choice(["", "index,follow", "noindex,nofollow"])
        if "nofollow" not in robots_meta:
            out = filter_scrape_links(links, BASE, nn, pn, ll, group)
            for link, cnt in out.items():
                expected[(src, link)] = cnt
        norms = []
        for raw in links:
            n = normalize_link(BASE, raw)
            if n is not None:
                norms.append(n)
        pages.append((src, HOST, 0, norms, nn, pn, robots_meta))

    cands = spark.createDataFrame(
        pages,
        "src_url string, src_host string, depth int, link_norms array<string>, "
        "link_next_norm string, link_prev_norm string, page_robots string",
    ).select(
        "src_url",
        "src_host",
        F.lit("https").alias("src_scheme"),
        "depth",
        F.explode("link_norms").alias("link"),
        "link_next_norm",
        "link_prev_norm",
        "page_robots",
    )
    from walker_spark.operators.linkfilter import apply_link_filters

    got_rows = (
        apply_link_filters(cands, conf, {HOST: ROBOTS}, spark)
        .groupBy("src_url", "link")
        .count()
        .collect()
    )
    got = {(r["src_url"], r["link"]): r["count"] for r in got_rows}
    assert got == expected
