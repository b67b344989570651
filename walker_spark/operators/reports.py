"""The analytics suite: walker's 11 report endpoints as DataFrame queries.

Each reporter in reference ``reports/`` is a full scan + aggregation over
the in-memory results map; here each is a declarative query over the
``results`` table (SURVEY.md §2.3-2.5, §3.3). All column names are
aliased explicitly so the DuckDB oracle harness can hash-compare.

Input frame: the crawl ``results`` schema (plans/crawl.py RESULT_SCHEMA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.buckets import bucket_expr

__all__ = [
    "status_histogram",
    "group_counts",
    "latency_buckets",
    "duration_minmax",
    "duration_quantiles",
    "highscore",
    "list_report",
    "paginate",
    "error_report",
    "redirect_report",
    "broken_links",
    "reverse_links",
    "links_edges",
    "duplications",
    "seo_report",
    "final_url",
    "normalize_canonical",
    "filter_results",
]


# ---- helpers ----

def final_url(df_or_col) -> F.Column:
    """coalesce(last redirect url, url) — reference
    ``reports/reports.go:218-224``. ``try_element_at``: ANSI mode makes
    plain ``element_at`` throw on empty chains."""
    return F.coalesce(
        F.try_element_at(F.col("redirects"), F.lit(-1))["url"], F.col("url")
    )


def normalize_canonical(url: F.Column, canonical: F.Column) -> F.Column:
    """reference ``reports/seo.go:14-37``: absolute canonical kept as-is;
    relative canonical prefixed with the target's scheme://host[:port];
    empty canonical → empty."""
    from .linkfilter import authority_of, scheme_of

    has_scheme = canonical.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    return (
        F.when(canonical == "", F.lit(""))
        .when(has_scheme, canonical)
        .otherwise(F.concat(scheme_of(url), F.lit("://"), authority_of(url), canonical))
    )


def links_edges(results: DataFrame) -> DataFrame:
    """The exploded link-graph edge table
    ``links(src_url, dst_url, cnt)`` = results ⨯ explode(normalized_links)
    (SURVEY.md §2.3). All of J3/J4 run over this."""
    return results.select(
        F.col("url").alias("src_url"),
        F.explode(F.col("normalized_links")).alias("dst_url", "cnt"),
    )


def filter_results(
    results: DataFrame,
    prefix: str = "",
    status: list[int] | None = None,
    min_dur_us: int = 0,
    max_dur_us: int = 0,
    url: str = "",
) -> DataFrame:
    """F10/F11 result filter chain (``service.go:70-98``,
    ``reports/reports.go:100-124``)."""
    df = results
    if url:
        df = df.filter(F.col("url") == url)
    if prefix:
        df = df.filter(F.col("url").startswith(prefix))
    if status:
        df = df.filter(F.col("code").isin(status))
    if max_dur_us > 0:
        df = df.filter(F.col("duration_us") < max_dur_us)
    if min_dur_us > 0:
        df = df.filter(F.col("duration_us") > min_dur_us)
    return df


# ---- aggregations (A*) ----

def status_histogram(results: DataFrame) -> DataFrame:
    """A1 (``reports/reports.go:263-277``): count per HTTP code, code asc."""
    return (
        results.groupBy(F.col("code"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("code")
    )


def group_counts(results: DataFrame) -> DataFrame:
    """A3 (``reports/reports.go:289-299``)."""
    return (
        results.groupBy(F.col("group"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("group")
    )


def latency_buckets(results: DataFrame) -> DataFrame:
    """A2 (``reports/reports.go:283-330``): per (group, bucket) count and
    % of group. Buckets with no rows are absent (walker prints 0-rows;
    emitting only non-empty groups keeps this a pure aggregation —
    re-densify with the bucket dimension table if needed)."""
    w = Window.partitionBy("group")
    return (
        results.withColumn("bucket", bucket_expr(F.col("duration_us")))
        .filter(F.col("bucket").isNotNull())
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("pct", F.round(F.col("cnt") / F.sum("cnt").over(w) * 100))
        .orderBy("group", "bucket")
    )


def duration_minmax(results: DataFrame) -> DataFrame:
    """A4 (``service.go:100-112``)."""
    return results.agg(
        F.min("duration_us").alias("min_dur_us"),
        F.max("duration_us").alias("max_dur_us"),
    )


def duration_quantiles(results: DataFrame) -> DataFrame:
    """A12 (``metrics.go:26-33``): p50/p90/p99 scrape duration."""
    return results.agg(
        F.percentile_approx("duration_us", 0.5).alias("p50_us"),
        F.percentile_approx("duration_us", 0.9).alias("p90_us"),
        F.percentile_approx("duration_us", 0.99).alias("p99_us"),
    )


# ---- sorts / top-k (W*) ----

def highscore(results: DataFrame) -> DataFrame:
    """W1 (``reports/highscore.go:11-43``): results sorted by duration
    ascending, with a rank column."""
    w = Window.orderBy(F.col("duration_us").asc(), F.col("url").asc())
    return results.select(
        "url", "code", "group", "duration_us"
    ).withColumn("rank", F.row_number().over(w)).orderBy("rank")


def list_report(results: DataFrame) -> DataFrame:
    """reportList (``reports/reports.go:225-250``): "code url" strings,
    lexicographically sorted."""
    return (
        results.select(
            F.concat(F.col("code").cast("string"), F.lit(" "), F.col("url")).alias("entry")
        )
        .orderBy("entry")
    )


def paginate(results: DataFrame, page: int, page_size: int) -> DataFrame:
    """W3 (``service.go:137-166``): lexicographic URL sort, page slice.
    Out-of-range input follows the reference exactly: service.go
    computes ``end = start + pageSize`` BEFORE clamping ``start < 0``
    to 0, then only slices when ``end > start`` — so any negative page
    leaves ``end <= start`` and the FULL unsliced (sorted) result set
    is returned, not the first page (service.go:153-165)."""
    w = Window.orderBy(F.col("url").asc())
    start = page * page_size
    end = start + page_size
    start = max(0, start)
    if end <= start:
        return results.orderBy(F.col("url").asc())
    return (
        results.withColumn("_rn", F.row_number().over(w) - 1)
        .filter((F.col("_rn") >= start) & (F.col("_rn") < end))
        .drop("_rn")
    )


# ---- error/redirect classifiers ----

def error_report(results: DataFrame) -> DataFrame:
    """F12 (``walkerstatus.go:43-55``): bucket results into error classes
    (not_found / server_error / transport_error / client_error / ok)."""
    cls = (
        F.when(F.col("code") == 404, "not_found")
        .when(F.col("code") >= 500, "server_error")
        .when(F.col("code") == 0, "transport_error")
        .when(F.col("code") >= 400, "client_error")
        .otherwise("ok")
    )
    return (
        results.withColumn("error_class", cls)
        .groupBy("error_class")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("error_class")
    )


def redirect_report(results: DataFrame) -> DataFrame:
    """A10 (``reports/redirects.go:19-34``): group by max redirect code
    in the chain; list the URLs, sorted."""
    return (
        results.filter(F.size("redirects") > 0)
        .withColumn("max_code", F.array_max(F.col("redirects.code")))
        .groupBy("max_code")
        .agg(F.sort_array(F.collect_list("url")).alias("urls"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("max_code")
    )


# ---- link-graph joins (J3, J4) ----

def broken_links(results: DataFrame, top_sources: int = 20) -> DataFrame:
    """J3 (``reports/brokenlinks.go:16-55``): for each 404 URL, all pages
    linking to it, sorted, truncated to 20 (walker's print cap)."""
    edges = links_edges(results)
    broken = results.filter(F.col("code") == 404).select(F.col("url").alias("dst_url"))
    return (
        broken.join(edges, "dst_url", "left")
        .groupBy("dst_url")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("src_url")), 1, top_sources
            ).alias("sources"),
            F.count(F.col("src_url")).alias("n_sources"),
        )
        .orderBy("dst_url")
    )


def reverse_links(results: DataFrame) -> DataFrame:
    """J4 (``reports/links.go:10-33``): for every result URL, the sorted
    set of pages linking to it. Walker's inner loop `break`s on first
    match per source page — i.e. a source appears once per target —
    which collect_set reproduces."""
    edges = links_edges(results).select("src_url", "dst_url").distinct()
    return (
        results.select(F.col("url"))
        .join(edges, results["url"] == edges["dst_url"], "left")
        .groupBy("url")
        .agg(F.sort_array(F.collect_set("src_url")).alias("linked_from"))
        .orderBy("url")
    )


# ---- SEO (A6/A7, F13) ----

def progress_gauges(frontier: DataFrame, results: DataFrame) -> dict:
    """A13 (``scrapeloop.go:204-205``, ``service.go:169-186``): open =
    frontier entries awaiting fetch, done = results count. (The BSP
    engine has no 'pending' mid-flight state — a batch is fetched
    atomically within its round.)"""
    return {"open": frontier.count(), "done": results.count(), "pending": 0}


def render_summary(results: DataFrame) -> str:
    """S8 text sink: walker's /summary report rendered as text
    (``reports/reports.go:252-330``) — status-code lines then per-group
    latency buckets with percentages."""
    lines = ["summary", "-" * 45, "", "status codes", "-" * 45]
    for r in status_histogram(results).collect():
        lines.append(f"{r['code']} {r['cnt']}")
    lines += ["", "performance buckets", "-" * 45]
    for r in latency_buckets(results).collect():
        lines.append(
            f"group: {r['group']}  {r['cnt']}\t{int(r['pct'])} %\t{r['bucket']}"
        )
    return "\n".join(lines)


def duplications(results: DataFrame, value_col: F.Column, name: str) -> DataFrame:
    """A6 (``reports/reports.go:172-205``): values shared by >1 URL."""
    return (
        results.select(value_col.alias(name), F.col("url"))
        .filter(F.col(name) != "")
        .groupBy(name)
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
        .filter(F.size("urls") > 1)
        .orderBy(name)
    )


def seo_report(results: DataFrame) -> dict[str, DataFrame]:
    """reportSEO (``reports/seo.go:39-101``): the full SEO suite.

    Eligibility (seo.go:49-63): code==200, html content-type, normalized
    canonical == final URL. Heading iteration quirks faithfully kept:
    * titles/missing-titles only counted for pages WITH headings
      (the title check sits inside the headings loop, seo.go:66-77);
    * h1 text trimmed with TrimSpace for the empty test.
    """
    f_url = final_url(results)
    eligible = (
        results.filter(F.col("code") == 200)
        .filter(F.col("content_type").contains("html"))
        .withColumn("final_url", f_url)
        .filter(
            normalize_canonical(F.col("url"), F.col("structure.canonical"))
            == F.col("final_url")
        )
    )
    st = F.col("structure")

    descriptions = duplications(
        eligible.withColumn("url", F.col("final_url")), st["description"], "description"
    )
    missing_descriptions = (
        eligible.filter(st["description"] == "")
        .select(F.col("final_url").alias("url"))
        .distinct()
        .orderBy("url")
    )
    with_headings = eligible.filter(F.size(st["headings"]) > 0)
    titles = duplications(
        with_headings.withColumn("url", F.col("final_url")), st["title"], "title"
    )
    missing_titles = (
        with_headings.filter(st["title"] == "")
        .select(F.col("final_url").alias("url"))
        .distinct()
        .orderBy("url")
    )
    h1 = eligible.select(
        F.col("final_url").alias("url"), F.explode(st["headings"]).alias("h")
    ).filter(F.col("h.level") == 1)
    h1s = (
        h1.filter(F.trim(F.col("h.text")) != "")
        .groupBy(F.col("h.text").alias("h1"))
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
        .filter(F.size("urls") > 1)
        .orderBy("h1")
    )
    empty_h1 = (
        h1.filter(F.trim(F.col("h.text")) == "").select("url").distinct().orderBy("url")
    )
    missing_h1 = (
        eligible.filter(
            ~F.exists(st["headings"], lambda h: h["level"] == F.lit(1))
        )
        .select(F.col("final_url").alias("url"))
        .distinct()
        .orderBy("url")
    )
    return {
        "duplicate_h1": h1s,
        "duplicate_titles": titles,
        "duplicate_descriptions": descriptions,
        "missing_titles": missing_titles,
        "missing_descriptions": missing_descriptions,
        "missing_h1": missing_h1,
        "empty_h1": empty_h1,
    }
