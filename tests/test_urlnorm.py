"""Parity tests for walker NormalizeLink (filterscrapelinks.go:20-43) and
the north-rule canonicalizer."""

from walker_spark.urlnorm import (
    canonicalize,
    normalize_link,
    path_depth,
    url_host,
    url_path,
    url_query_names,
    url_scheme,
)

BASE = "https://example.com/shop"


def test_fragment_stripped():
    assert normalize_link(BASE, "/test#frag") == "https://example.com/test"
    assert normalize_link(BASE, "#only-anchor") == "https://example.com"


def test_host_scheme_inherited():
    assert normalize_link(BASE, "/a/b") == "https://example.com/a/b"
    assert normalize_link(BASE, "//cdn.example.net/x") == "https://cdn.example.net/x"
    assert normalize_link(BASE, "http://other.com/y") == "http://other.com/y"


def test_rootless_path_not_resolved_against_base_path():
    # walker does NOT call ResolveReference: "foo/bar" on /shop becomes
    # host-rooted /foo/bar (Go URL.String inserts the slash).
    assert normalize_link(BASE, "foo/bar") == "https://example.com/foo/bar"


def test_userinfo_inherited_from_base():
    assert (
        normalize_link("https://user:pw@example.com", "/x")
        == "https://user:pw@example.com/x"
    )
    # base user overrides link user (Go: link.User = baseURL.User)
    assert (
        normalize_link("https://user:pw@example.com", "https://other@example.com/x")
        == "https://user:pw@example.com/x"
    )


def test_opaque_urls_pass_through():
    assert normalize_link(BASE, "mailto:a@b.c") == "mailto:a@b.c"
    assert normalize_link(BASE, "tel:+4112345") == "tel:+4112345"
    assert normalize_link(BASE, "javascript:void(0)") == "javascript:void(0)"


def test_empty_link_becomes_base_origin():
    # extractLinks can emit "" (canonical with empty href); Go renders
    # scheme://host with empty path.
    assert normalize_link(BASE, "") == "https://example.com"


def test_query_preserved_verbatim():
    assert (
        normalize_link(BASE, "/p?b=2&a=1&a=0") == "https://example.com/p?b=2&a=1&a=0"
    )


def test_port_kept():
    assert (
        normalize_link("http://localhost:8080/", "/x") == "http://localhost:8080/x"
    )


def test_canonicalize():
    assert (
        canonicalize("HTTP://Example.COM:80/a?b=2&a=1#f")
        == "http://example.com/a?a=1&b=2"
    )
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("https://example.com:8080/x") == "https://example.com:8080/x"
    # %2F must NOT decode (path structure); %41 ('A', unreserved) must.
    assert canonicalize("https://e.com/a%2fb/%41x") == "https://e.com/a%2Fb/Ax"
    # stable under repetition (idempotent)
    u = "https://example.com/a%2Fb/Ax?a=1&b=2"
    assert canonicalize(canonicalize(u)) == canonicalize(u)


def test_accessors():
    assert url_host("https://a.b:81/x?q=1") == "a.b:81"
    assert url_scheme("https://a.b/x") == "https"
    assert url_path("https://a.b/x/y?q=1") == "/x/y"
    assert url_query_names("https://a.b/x?a=1&b&a=2") == ["a", "b"]
    assert url_query_names("https://a.b/x") == []
    assert path_depth("/a/b") == 2
    assert path_depth("/") == 1
    assert path_depth("") == 0
