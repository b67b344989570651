"""Prometheus text-format rendering of walker's metric families (S7).

Walker registers eight metric families (reference ``metrics.go:8-109``)
and observes them as scrapes complete (``scrapeloop.go:204-205,327-332``)
and when a loop finishes (``validationmetrics.go:10-43``). The BSP engine
computes the same families from the checkpointed results table with
column-pruned aggregations and renders the standard Prometheus text
exposition format — the payload walker's ``/metrics`` endpoint serves.

Summaries: prometheus client summaries are streaming φ-quantile
estimates with error objectives (0.5±0.05, 0.9±0.01, 0.99±0.001); the
batch engine computes them with ``percentile_approx`` over the full
result set, which is within the same objectives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import sort_paths_by_length

__all__ = ["render_prometheus"]

_QS = [0.5, 0.9, 0.99]


def _fmt(v: float) -> str:
    """client_golang renders floats via strconv 'g'."""
    if v == int(v):
        return str(int(v))
    return repr(float(v))


def _summary_lines(name: str, help_text: str, rows, label_names: list[str]) -> list[str]:
    out = [f"# HELP {name} {help_text}", f"# TYPE {name} summary"]
    for r in rows:
        labels = ",".join(f'{ln}="{r[ln]}"' for ln in label_names)
        for q, v in zip(_QS, r["qs"]):
            sep = "," if labels else ""
            out.append(f'{name}{{{labels}{sep}quantile="{q}"}} {_fmt(float(v))}')
        out.append(f"{name}_sum{{{labels}}} {_fmt(float(r['s']))}")
        out.append(f"{name}_count{{{labels}}} {int(r['c'])}")
    return out


def render_prometheus(
    results: DataFrame,
    frontier_open: int = 0,
    paths: list[str] | None = None,
) -> str:
    """Render the eight walker metric families for a crawl's results.

    ``frontier_open`` feeds ``walker_progress_gauge_open`` (the queued
    jobs gauge); ``paths`` are the config's include paths, used for the
    longest-prefix ``path`` label of the validation summaries, exactly
    like ``validationmetrics.go:16-30``.
    """
    out: list[str] = []

    # walker_scrape_durations_seconds — summary {group}
    dur = (
        results.groupBy("group")
        .agg(
            F.percentile_approx(F.col("duration_us") / 1e6, _QS).alias("qs"),
            F.sum(F.col("duration_us") / 1e6).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy("group")
        .collect()
    )
    out += _summary_lines(
        "walker_scrape_durations_seconds",
        "scrape duration whole request time including streaming of body",
        dur,
        ["group"],
    )

    # validation summaries — {group, path} and {group, path, type}
    vr = results.filter(F.col("validation_report").isNotNull())
    path_expr = F.lit("/")
    for p in reversed(sort_paths_by_length(paths or [])):
        # longest prefix wins ⇒ apply shortest→longest, later overwrite
        path_expr = F.when(
            F.startswith(
                F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
                F.lit(p),
            ),
            F.lit(p),
        ).otherwise(path_expr)
    vr = vr.withColumn("path", path_expr)
    score = (
        vr.groupBy("group", "path")
        .agg(
            F.percentile_approx(F.col("validation_report.score").cast("double"), _QS).alias("qs"),
            F.sum(F.col("validation_report.score").cast("double")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy("group", "path")
        .collect()
    )
    out += _summary_lines(
        "walker_validation_score",
        "html schema score for groups in paths",
        score,
        ["group", "path"],
    )
    # per-result penalties sum per validation type, observed once per
    # (result, type) — validationmetrics.go:32-39
    pen = (
        vr.select("group", "path", "url", F.explode(F.col("validation_report.validations")).alias("v"))
        .groupBy("group", "path", "url", F.col("v.type").alias("type"))
        .agg(F.sum("v.penalty").cast("double").alias("penalty"))
        .groupBy("group", "path", "type")
        .agg(
            F.percentile_approx("penalty", _QS).alias("qs"),
            F.sum("penalty").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy("group", "path", "type")
        .collect()
    )
    out += _summary_lines(
        "walker_validation_penalty",
        "html schema score for groups and validation types in paths",
        pen,
        ["group", "path", "type"],
    )

    # walker_scrape_running_total — counter {group, status=code}
    out += [
        "# HELP walker_scrape_running_total Number of scrapes in scan.",
        "# TYPE walker_scrape_running_total counter",
    ]
    run_rows = (
        results.groupBy("group", F.col("code").cast("string").alias("status"))
        .count()
        .orderBy("group", "status")
        .collect()
    )
    for r in run_rows:
        out.append(
            f'walker_scrape_running_total{{group="{r["group"]}",status="{r["status"]}"}} {r["count"]}'
        )

    total = results.count()
    out += [
        "# HELP walker_scrape_counter_total number of scrapes since start of walker",
        "# TYPE walker_scrape_counter_total counter",
        f"walker_scrape_counter_total {total}",
        "# HELP walker_progress_gauge_open progress open to scrape",
        "# TYPE walker_progress_gauge_open gauge",
        f"walker_progress_gauge_open {int(frontier_open)}",
        "# HELP walker_progress_gauge_complete progress complete scrapes",
        "# TYPE walker_progress_gauge_complete gauge",
        f"walker_progress_gauge_complete {total}",
        "# HELP walker_progress_status_code_total status codes for running scrape",
        "# TYPE walker_progress_status_code_total counter",
    ]
    st_rows = (
        results.groupBy(F.col("code").cast("string").alias("status"))
        .count()
        .orderBy("status")
        .collect()
    )
    for r in st_rows:
        out.append(f'walker_progress_status_code_total{{status="{r["status"]}"}} {r["count"]}')
    return "\n".join(out) + "\n"
