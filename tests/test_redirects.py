"""Redirect-cap boundary parity: dispatcher oracle vs Spark resolve_redirects.

Go's CheckRedirect (reference ``scrapeloop.go:65-68``) errors when
``len(via) > 9`` and ``via`` includes the initial request — so exactly 9
redirects are followed; a chain needing 10 hops fails with "stopped after
10 redirects" and records the 9 hops it did follow. Both the pure-Python
oracle (:meth:`ReferenceDispatcher._fetch`) and the distributed
pointer-doubling resolver (:func:`resolve_redirects`) must agree on the
8/9/10/11-hop boundary and on cycles.
"""

from __future__ import annotations

import pytest

from walker_spark.config import CrawlConfig, Target
from walker_spark.dispatcher import PageStore, ReferenceDispatcher, StorePage
from walker_spark.plans.crawl import resolve_redirects


def _chain_store(n_hops: int) -> PageStore:
    """u0 → u1 → … → u{n_hops}, where the last is a real page."""
    pages = {}
    for i in range(n_hops):
        pages[f"https://h.example/r{i}"] = StorePage(
            url=f"https://h.example/r{i}",
            redirect_to=f"https://h.example/r{i+1}",
            redirect_code=301,
        )
    last = f"https://h.example/r{n_hops}"
    pages[last] = StorePage(url=last, html=b"<html><body>end</body></html>")
    return PageStore(pages)


def _dispatcher(store: PageStore) -> ReferenceDispatcher:
    conf = CrawlConfig(target=Target(base_url="https://h.example", paths=["/"]))
    return ReferenceDispatcher(store, conf, multi_host=True)


@pytest.mark.parametrize("n_hops,ok", [(1, True), (8, True), (9, True), (10, False), (11, False)])
def test_fetch_cap_boundary(n_hops, ok):
    d = _dispatcher(_chain_store(n_hops))
    page, chain, err = d._fetch("https://h.example/r0")
    if ok:
        assert err == "" and page is not None
        assert page.url == f"https://h.example/r{n_hops}"
        assert len(chain) == n_hops
        assert chain[-1] == (301, f"https://h.example/r{n_hops}")
    else:
        assert page is None
        assert err == "stopped after 10 redirects"
        # 9 followed hops recorded, like the Go client's request context
        assert len(chain) == 9
        assert chain[-1] == (301, "https://h.example/r9")


def test_fetch_cycle_errors():
    pages = {
        "https://h.example/a": StorePage(url="https://h.example/a", redirect_to="https://h.example/b"),
        "https://h.example/b": StorePage(url="https://h.example/b", redirect_to="https://h.example/a"),
    }
    page, chain, err = _dispatcher(PageStore(pages))._fetch("https://h.example/a")
    assert page is None and err == "stopped after 10 redirects" and len(chain) == 9


@pytest.mark.parametrize("n_hops", [1, 8, 9, 10, 11])
def test_resolve_redirects_matches_oracle(spark, n_hops):
    store = _chain_store(n_hops)
    edges = spark.createDataFrame(
        [(p.url, p.redirect_code, p.redirect_to) for p in store.pages.values() if p.redirect_to],
        "src string, code int, dst string",
    )
    got = {
        r["src"]: r
        for r in resolve_redirects(edges).collect()
    }
    d = _dispatcher(store)
    for i in range(n_hops):
        src = f"https://h.example/r{i}"
        page, chain, err = d._fetch(src)
        row = got[src]
        assert row["error"] == err, src
        assert [(c["code"], c["url"]) for c in row["redirects"]] == chain, src
        if err:
            assert row["final_url"] is None
        else:
            assert row["final_url"] == page.url


def test_resolve_redirects_shared_tail(spark):
    """Two chains merging into one shared tail — crosses the
    continuation-subgraph boundary the r6 resolver doubles over (heads
    are not continuation targets, the shared tail is); every src must
    match the reference dispatcher exactly."""
    pages = {
        "https://h.example/a": StorePage(url="https://h.example/a", redirect_to="https://h.example/b", redirect_code=301),
        "https://h.example/b": StorePage(url="https://h.example/b", redirect_to="https://h.example/c", redirect_code=302),
        "https://h.example/x": StorePage(url="https://h.example/x", redirect_to="https://h.example/c", redirect_code=301),
        "https://h.example/c": StorePage(url="https://h.example/c", redirect_to="https://h.example/d", redirect_code=301),
        "https://h.example/d": StorePage(url="https://h.example/d", html=b"<html></html>"),
    }
    store = PageStore(pages)
    edges = spark.createDataFrame(
        [(p.url, p.redirect_code, p.redirect_to) for p in pages.values() if p.redirect_to],
        "src string, code int, dst string",
    )
    got = {r["src"]: r for r in resolve_redirects(edges).collect()}
    d = _dispatcher(store)
    assert len(got) == 4
    for src in got:
        page, chain, err = d._fetch(src)
        assert got[src]["error"] == err, src
        assert [(c["code"], c["url"]) for c in got[src]["redirects"]] == chain, src
        assert got[src]["final_url"] == (page.url if page else None), src


def test_resolve_redirects_self_loop(spark):
    edges = spark.createDataFrame(
        [("https://h.example/s", 301, "https://h.example/s")],
        "src string, code int, dst string",
    )
    row = resolve_redirects(edges).collect()[0]
    assert row["error"] == "stopped after 10 redirects"
    assert row["final_url"] is None
    assert len(row["redirects"]) == 9
    assert all(c["url"] == "https://h.example/s" for c in row["redirects"])


def test_resolve_redirects_cycle(spark):
    edges = spark.createDataFrame(
        [("https://h.example/a", 302, "https://h.example/b"), ("https://h.example/b", 302, "https://h.example/a")],
        "src string, code int, dst string",
    )
    rows = {r["src"]: r for r in resolve_redirects(edges).collect()}
    for src in rows:
        assert rows[src]["error"] == "stopped after 10 redirects"
        assert rows[src]["final_url"] is None
        assert len(rows[src]["redirects"]) == 9
