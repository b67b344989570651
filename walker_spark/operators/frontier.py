"""Frontier management beyond per-round politeness: global budget
allocation across hosts and crawler-trap detection — the two controls
a web-scale scheduler applies BEFORE the per-host top-k batch op
(operators/politeness.py) runs.

Reference semantics anchor: the reference bounds per-host work with a
flat host budget (walker scrapeloop host budget; see
plans/crawl.py docstrings for the file:line pins). At fleet scale a
flat cap wastes budget on small hosts and starves large ones, so the
public apportionment construction (Hamilton's largest-remainder
method — the same arithmetic legislatures use for seats) allocates an
integer global budget proportionally to per-host demand, exactly and
deterministically.

Everything here is integer arithmetic end to end — engine-exact at any
scale, no float quotas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "allocate_host_budget",
    "url_trap_templates",
    "url_template_expr",
    "url_host_expr",
    "frontier_priorities",
]


def allocate_host_budget(
    demand: DataFrame,
    total_budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of ``total_budget``
    fetch slots across hosts proportionally to ``demand`` (e.g.
    frontier size): ``base = (B*d) div D``, and the ``B - Σbase``
    leftover slots go to the largest integer remainders
    ``(B*d) mod D`` (ties broken by host ascending). Output per host:
    ``base``, ``extra`` (0/1), ``budget``; ``Σ budget == B`` exactly
    (when ``D > 0``).

    Scale shape: one scalar aggregate for total demand (broadcast
    back), one projection, and a ``orderBy().limit(extra)`` partial
    top-k (TakeOrderedAndProject — never a global window) to pick the
    remainder winners, flagged back with one broadcast join on ids.
    All quotas are BIGINT products/divisions — no float apportionment
    drift anywhere, on any engine. ``B*d`` stays within int64 for
    B·d < 2^63 (document-scale budgets; raise to decimal only if you
    truly hand one host 10^10 × 10^9).
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    d = demand.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    tot = d.agg(F.sum("demand").alias("__D"))
    base = (
        d.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "demand",
            F.when(
                F.col("__D") > 0,
                F.expr(f"({total_budget} * demand) div __D"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("base"),
            F.when(
                F.col("__D") > 0,
                (F.lit(total_budget) * F.col("demand")) % F.col("__D"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("__rem"),
        )
        .persist()
    )
    n_extra = total_budget - (base.agg(F.sum("base")).collect()[0][0] or 0)
    winners = (
        base.filter(F.col("__rem") > 0)
        .orderBy(F.desc("__rem"), F.asc("host"))
        .limit(int(n_extra))
        .select("host", F.lit(1).alias("__w"))
    )
    out = (
        base.join(F.broadcast(winners), "host", "left")
        .select(
            F.col("host").alias(host_col),
            "demand",
            "base",
            F.coalesce(F.col("__w"), F.lit(0)).cast("long").alias("extra"),
            (F.col("base") + F.coalesce(F.col("__w"), F.lit(0)))
            .cast("long")
            .alias("budget"),
        )
    )
    base.unpersist()
    return out


def url_host_expr(url):
    """Lowercased hostname of a URL column (port and userinfo split
    off) — shared by the trap detector and the priority composer."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(
            u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )


def url_template_expr(url):
    """URL → trap template (see :func:`url_trap_templates`): scheme +
    fragment dropped, decimal runs in the path fold to ``N``, query
    reduced to its sorted parameter names. Native expressions only."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(u, r"#.*$", "")
    rest = F.regexp_replace(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path_t = F.regexp_replace(path, r"[0-9]+", "N")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    pnames = F.array_join(
        F.array_sort(
            F.transform(
                F.filter(F.split(query, "&"), lambda kv: kv != F.lit("")),
                lambda kv: F.regexp_replace(kv, r"=.*$", ""),
            )
        ),
        "&",
    )
    return F.concat(
        path_t,
        F.when(pnames == "", F.lit("")).otherwise(F.concat(F.lit("?"), pnames)),
    )


def url_trap_templates(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    trap_threshold: int = 1000,
) -> DataFrame:
    """Crawler-trap detection by URL templating — the standard crawl
    hygiene pass (calendar pages, session ids, faceted search: a
    handful of PATH TEMPLATES generating unbounded URL sets). Each URL
    maps to a template: scheme and fragment dropped, every decimal run
    in the path replaced by ``N``, and the query reduced to its SORTED
    parameter NAMES (values discarded — value churn is exactly what a
    trap looks like). Per (host, template): distinct-URL count, one
    deterministic example (min url), and ``is_trap`` when the count
    reaches ``trap_threshold``.

    The output is template-cardinality (tiny vs the frontier), meant to
    be broadcast-joined back as a frontier filter; the counting is one
    map-side-combined groupBy over (host, template, url-distinct)
    pairs. Pure native regex/string expressions — whole-stage codegen,
    SQL-replicable.
    """
    u = F.col(url_col)
    host = F.col(host_col) if host_col else url_host_expr(u)
    pairs = urls.select(
        host.alias("host"),
        url_template_expr(u).alias("template"),
        u.alias("url"),
    ).distinct()
    return pairs.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.min("url").alias("example_url"),
        (F.count(F.lit(1)) >= trap_threshold).alias("is_trap"),
    )


def frontier_priorities(
    frontier: DataFrame,
    host_ranks: DataFrame | None = None,
    trap_templates: DataFrame | None = None,
    url_col: str = "url",
    depth_col: str = "depth",
    rank_quantum: int = 1_000_000,
) -> DataFrame:
    """Compose the scheduler's per-URL priority key from the signals
    the other frontier/graph ops produce: a host centrality prior
    (e.g. :func:`~walker_spark.operators.graph.pagerank` over
    :func:`~walker_spark.operators.graph.host_graph` output), crawl
    depth, and trap exclusion (:func:`url_trap_templates`).

    ``priority = floor(rank * rank_quantum + 0.5) div (1 + depth)``
    — the quantized host prior decays harmonically with depth (the
    standard BFS-with-prior frontier ordering), entirely INTEGER once
    the one quantization lands, so the global sort order is
    engine-exact. URLs whose (host, template) is a flagged trap get
    priority −1 (schedulers drop or defer them); unknown hosts rank 0.

    Scale shape: two broadcast joins (host ranks are host-cardinality,
    trap templates template-cardinality) onto the frontier — the
    frontier itself never shuffles; the downstream per-round pick is
    the politeness op's top-k, which consumes this column.
    """
    host = url_host_expr(F.col(url_col))
    out = frontier.withColumn("host", host).withColumn(
        "template", url_template_expr(F.col(url_col))
    )
    if host_ranks is not None:
        r = host_ranks.select(
            F.col("host").alias("__rh"), F.col("rank").alias("__rank")
        )
        out = out.join(
            F.broadcast(r), out["host"] == F.col("__rh"), "left"
        ).drop("__rh")
    else:
        out = out.withColumn("__rank", F.lit(None).cast("double"))
    if trap_templates is not None:
        t = trap_templates.filter(F.col("is_trap")).select(
            F.col("host").alias("__th"),
            F.col("template").alias("__tt"),
            F.lit(True).alias("__trap"),
        )
        out = out.join(
            F.broadcast(t),
            (out["host"] == F.col("__th")) & (out["template"] == F.col("__tt")),
            "left",
        ).drop("__th", "__tt")
    else:
        out = out.withColumn("__trap", F.lit(None).cast("boolean"))
    return (
        out.withColumn("is_trap", F.coalesce(F.col("__trap"), F.lit(False)))
        .withColumn(
            "priority",
            F.when(F.col("is_trap"), F.lit(-1)).otherwise(
                F.expr(
                    f"CAST(floor(coalesce(__rank, 0d) * {rank_quantum} + 0.5d)"
                    f" AS BIGINT) div (CAST({depth_col} AS BIGINT) + 1)"
                )
            ).cast("long"),
        )
        .drop("__rank", "__trap")
    )
