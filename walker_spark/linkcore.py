"""Pure-Python link filter chain — semantics source of truth.

Mirror of reference ``filterscrapelinks.go:45-127`` (filters F1-F9 from
SURVEY.md §2.2). This module is the *specification*: the dispatcher
oracle uses it directly, and the Spark-native operator stack
(:mod:`walker_spark.operators.linkfilter`) must agree with it on every
input (property-tested).

Filter order (each drops the link and short-circuits, like the
``continue LinkLoop`` chain):

1. normalize (unparseable → drop)          — filterscrapelinks.go:57-58
2. pager link (next/prev) unless paging    — :61-65
3. external host or scheme                 — :67-70
4. depth: path segments − 1 > depth        — :72-77
5. ignore path prefixes                    — :80-84
6. robots disallow                         — :87-89
7. query filters (all / named params)      — :92-107
8. include path prefixes (must match one)  — :110-120
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.robots import RobotsGroup
from .urlnorm import normalize_link, path_depth, split_url

__all__ = ["LinkLimitations", "filter_scrape_links"]


@dataclass
class LinkLimitations:
    depth: int = 0
    paging: bool = False
    ignore_all_queries: bool = False
    ignore_path_prefixes: list[str] = field(default_factory=list)
    include_path_prefixes: list[str] = field(default_factory=list)
    ignore_queries_with: list[str] = field(default_factory=list)


_HEX = set("0123456789abcdefABCDEF")


def _query_unescape(s: str) -> str | None:
    """Go ``url.QueryUnescape``: '+' → space, strict %XX (invalid → None).
    Decoded bytes are read as UTF-8 with replacement, matching Java's
    URLDecoder (the engine's native ``try_url_decode``)."""
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "+":
            out.append(0x20)
            i += 1
        elif ch == "%":
            if i + 2 >= n or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
                return None
            out.append(int(s[i + 1 : i + 3], 16))
            i += 3
        else:
            out.extend(ch.encode("utf-8"))
            i += 1
    return out.decode("utf-8", errors="replace")


def _query_names(query: str) -> list[str]:
    """Keys of Go's ``linkU.Query()`` map (``net/url.ParseQuery``): split
    on '&', skip empty segments, skip segments containing ';', percent-
    and '+'-decode the name, skip pairs whose name fails to decode.
    Duplicate decoded names collapse (Query() is a map)."""
    names: list[str] = []
    seen: set[str] = set()
    for part in query.split("&"):
        if part == "" or ";" in part:
            continue
        raw_name, _, raw_value = part.partition("=")
        name = _query_unescape(raw_name)
        # ParseQuery also drops the pair when the *value* fails to decode
        if name is None or _query_unescape(raw_value) is None or name in seen:
            continue
        seen.add(name)
        names.append(name)
    return names


def filter_scrape_links(
    link_list: dict[str, int],
    base_url: str,
    link_next_normalized: str,
    link_prev_normalized: str,
    ll: LinkLimitations,
    robots_group: RobotsGroup | None,
) -> dict[str, int]:
    """Returns normalized-link → count of surviving links. Counts
    accumulate per normalized form (``links[linkU.String()]++``)."""
    base = split_url(base_url.split("#", 1)[0])
    links: dict[str, int] = {}
    for link_url in link_list:
        normalized = normalize_link(base_url, link_url)
        if normalized is None:
            continue
        u = split_url(normalized)

        if not ll.paging and normalized in (link_next_normalized, link_prev_normalized):
            continue
        if u.host != base.host or u.scheme != base.scheme:
            continue  # external link (opaque URLs land here too)
        if ll.depth > 0 and path_depth(u.path) > ll.depth:
            continue
        if any(u.path.startswith(p) for p in ll.ignore_path_prefixes):
            continue
        if robots_group is not None and not robots_group.test(u.path):
            continue
        qnames = _query_names(u.query)
        if qnames:
            if ll.ignore_all_queries:
                continue
            if any(n == ig for ig in ll.ignore_queries_with for n in qnames):
                continue
        if not any(u.path.startswith(p) for p in ll.include_path_prefixes):
            continue  # not in the scrape path (empty includes ⇒ drop all)

        links[normalized] = links.get(normalized, 0) + 1
    return links
