"""Spark-native link filter stack (F1-F9, SURVEY.md §2.2).

Reimplements reference ``filterscrapelinks.go:45-127`` as whole-stage-
codegen-friendly Column expressions over the exploded candidate-link
frame. Normalization (F1) already happened in the extract stage (the
``link_norms`` array, produced by the vectorized UDF per input_hint);
everything downstream is JVM-side except robots matching (F6), which is
an Arrow-batched pandas UDF over broadcast per-host rule sets (rule
lists are tiny; wildcard/anchor matching is regex-like and not worth
contorting into SQL).

URL parts are extracted with anchored ``regexp_extract`` rather than
``parse_url`` because Go's ``url.URL.Host`` keeps the port and drops
userinfo, while Java's parser strips ports — the regexes reproduce Go
exactly and stay inside codegen.

The pure-Python spec lives in :mod:`walker_spark.linkcore`; a property
test drives both on the same inputs and requires identical survivors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import CrawlConfig
from ..functions.robots import RobotsGroup, parse_robots

__all__ = [
    "scheme_of",
    "authority_of",
    "path_of",
    "query_of",
    "has_query",
    "query_param_names",
    "path_segment_depth",
    "apply_link_filters",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*):"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def scheme_of(c: Column) -> Column:
    return F.regexp_extract(c, _SCHEME_RE, 1)


def authority_of(c: Column) -> Column:
    """host[:port], userinfo stripped — Go ``url.URL.Host`` semantics."""
    return F.substring_index(F.regexp_extract(c, _AUTH_RE, 1), "@", -1)


def path_of(c: Column) -> Column:
    return F.regexp_extract(c, _PATH_RE, 1)


def query_of(c: Column) -> Column:
    return F.regexp_extract(c, _QUERY_RE, 1)


def has_query(c: Column) -> Column:
    """Go ``len(linkU.Query()) > 0``: at least one *valid* parsed pair
    (ParseQuery skips empty segments, ';'-segments, and pairs whose name
    or value fails percent-decoding)."""
    return F.size(query_param_names(c)) > 0


def query_param_names(c: Column) -> Column:
    """Decoded keys of Go's ``linkU.Query()`` map — lockstep with
    :func:`walker_spark.linkcore._query_names`: '+' → space, strict %XX
    via native ``try_url_decode`` (NULL on invalid → pair skipped), the
    pair also skipped when its *value* fails to decode, duplicates
    collapsed (Query() is a map)."""

    def _name(s: Column) -> Column:
        kv = F.split(s, "=", 2)
        value = F.coalesce(F.try_element_at(kv, F.lit(2)), F.lit(""))
        return F.when(
            (s != F.lit(""))
            & ~s.contains(";")
            & F.try_url_decode(value).isNotNull(),
            F.try_url_decode(kv[0]),
        )

    return F.array_distinct(
        F.filter(
            F.transform(F.split(query_of(c), "&"), _name),
            lambda x: x.isNotNull(),
        )
    )


def path_segment_depth(path: Column) -> Column:
    """walker depth metric: ``len(strings.Split(path, "/")) - 1``
    (``filterscrapelinks.go:74``)."""
    return F.size(F.split(path, "/", -1)) - 1


def _robots_filter_udf(spark: SparkSession, robots_bodies: dict[str, str], agent: str):
    """Vectorized F6: (host, path) → allowed. Broadcasts parsed per-host
    groups; hosts without robots allow everything (nil group)."""
    parsed: dict[str, RobotsGroup] = {
        host: parse_robots(body).find_group(agent) for host, body in robots_bodies.items()
    }
    bc = spark.sparkContext.broadcast(parsed)

    @pandas_udf("boolean")
    def robots_allowed(host: pd.Series, path: pd.Series) -> pd.Series:
        groups = bc.value
        out = []
        for h, p in zip(host, path):
            g = groups.get(h)
            out.append(True if g is None else g.test(p or ""))
        return pd.Series(out)

    return robots_allowed


def apply_link_filters(
    cands: DataFrame,
    conf: CrawlConfig,
    robots_bodies: dict[str, str] | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Filter the exploded candidate frame.

    Expected columns: ``link`` (normalized URL), ``src_url``, ``src_host``,
    ``src_scheme``, ``link_next_norm``, ``link_prev_norm``,
    ``page_robots`` (structure.robots of the source page).

    Applies F9 (nofollow gate), F2 (pager), F3 (external), F4 (depth),
    F5 (ignore prefixes), F6 (robots), F7 (queries), F8 (include
    prefixes) with walker's short-circuit semantics (pure conjunction —
    order only matters for cost, so cheap predicates run first).
    """
    link = F.col("link")
    lhost = authority_of(link)
    lscheme = scheme_of(link)
    lpath = path_of(link)

    df = cands
    if not conf.ignore_robots:
        # F9: page-level nofollow gate (scrapeloop.go:346)
        df = df.filter(~F.coalesce(F.col("page_robots"), F.lit("")).contains("nofollow"))
    if not conf.paging:
        # F2 (filterscrapelinks.go:61-65)
        df = df.filter(
            (link != F.coalesce(F.col("link_next_norm"), F.lit("")))
            & (link != F.coalesce(F.col("link_prev_norm"), F.lit("")))
        )
    # F3 (…:67-70): same host AND scheme as the page origin
    df = df.filter((lhost == F.col("src_host")) & (lscheme == F.col("src_scheme")))
    # F4 (…:72-77)
    if conf.depth > 0:
        df = df.filter(path_segment_depth(lpath) <= F.lit(conf.depth))
    # F5 (…:80-84)
    for prefix in conf.ignore:
        df = df.filter(~lpath.startswith(prefix))
    # F7 (…:92-107)
    if conf.ignore_all_queries:
        df = df.filter(~has_query(link))
    elif conf.ignore_queries_with:
        df = df.filter(
            ~F.arrays_overlap(
                query_param_names(link),
                F.array(*[F.lit(q) for q in conf.ignore_queries_with]),
            )
        )
    # F8 (…:110-120): must match one include prefix; empty ⇒ drop all
    if conf.target.paths:
        inc = None
        for p in conf.target.paths:
            cond = lpath.startswith(p)
            inc = cond if inc is None else (inc | cond)
        df = df.filter(inc)
    else:
        df = df.filter(F.lit(False))
    # F6 (…:87-89): robots last — it's the only Python hop
    if not conf.ignore_robots and robots_bodies:
        udf = _robots_filter_udf(spark or cands.sparkSession, robots_bodies, conf.agent)
        df = df.filter(udf(F.col("src_host"), lpath))
    return df
