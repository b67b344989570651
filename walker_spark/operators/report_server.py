"""The served report surface (S8) — walker's 11 HTTP reporters + /metrics.

Reference ``reports/reports.go:61-127`` routes eleven text reporters and
supports ``?url=``/``?prefix=`` result filters plus a ``?status=running,
complete`` selector over the two crawl snapshots (``vo/status.go:3-12``:
*complete* = the last finished loop, *running* = the loop in flight).
This module renders the same endpoints as text from the checkpointed
results tables (each reporter is the corresponding DataFrame op from
:mod:`walker_spark.operators.reports`), and serves them with a stdlib
HTTP server. ``/metrics`` renders the Prometheus families
(:mod:`walker_spark.operators.prometheus`).

Report rendering collects to the driver by design — reports are the
human-facing tail of the pipeline and walker itself holds them in one
process's memory; the heavy lifting (aggregation, joins, sorts) happens
in Spark before the collect.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import yaml
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import reports as R
from .prometheus import render_prometheus

__all__ = ["REPORT_NAMES", "render_report", "report_dual_status", "serve_reports", "results_yaml"]

SEP = "=" * 77


def _hdr(title, n=None) -> list[str]:
    return [f"{title}" + (f" {n}" if n is not None else ""), "-" * 45]


def results_yaml(results: DataFrame, url: str = "", prefix: str = "") -> str:
    """reportResults (``reports/results.go:10-24``): every result as a
    YAML document — the full-results dump (S9)."""
    df = R.filter_results(results, prefix=prefix, url=url)
    rows = df.orderBy("url").collect()
    out = _hdr("results", len(rows))
    for r in rows:
        out.append(yaml.safe_dump(r.asDict(recursive=True), sort_keys=True))
    return "\n".join(out)


def _render_list(results, page=None, page_size=None, **kw) -> str:
    """reportList; with ``?page=``/``?pageSize=`` the walker Service
    pagination (W3, ``service.go:137-166``) slices the URL-sorted result
    set BEFORE rendering — the header count is the page's row count."""
    if page is not None:
        results = R.paginate(results, page, page_size or 50)
    rows = R.list_report(results).collect()
    return "\n".join(_hdr("list", len(rows)) + [r["entry"] for r in rows])


def _render_highscore(results, **kw) -> str:
    rows = R.highscore(results).collect()
    return "\n".join(
        _hdr("highscore", len(rows))
        + [f"{r['rank']}\t{r['duration_us'] / 1e6:.6f}s\t{r['code']} {r['url']}" for r in rows]
    )


def _render_broken(results, **kw) -> str:
    rows = R.broken_links(results).collect()
    out = _hdr("broken links", len(rows))
    for r in rows:
        out.append(r["dst_url"])
        for s in r["sources"]:
            if s is not None:
                out.append(f"\t{s}")
    return "\n".join(out)


def _render_links(results, **kw) -> str:
    rows = R.reverse_links(results).collect()
    out = _hdr("links", len(rows))
    for r in rows:
        out.append(r["url"])
        for s in r["linked_from"]:
            if s is not None:
                out.append(f"\t{s}")
    return "\n".join(out)


def _render_redirects(results, **kw) -> str:
    rows = R.redirect_report(results).collect()
    out = _hdr("redirects")
    for r in rows:
        out.append(f"max code {r['max_code']} ({r['cnt']})")
        for u in r["urls"]:
            out.append(f"\t{u}")
    return "\n".join(out)


def _render_errors(results, **kw) -> str:
    rows = R.error_report(results).collect()
    return "\n".join(
        _hdr("errors") + [f"{r['error_class']} {r['cnt']}" for r in rows]
    )


def _render_validations(results, **kw) -> str:
    rows = (
        results.filter(F.size(F.coalesce(F.col("validations"), F.array())) > 0)
        .select("url", "validations")
        .orderBy("url")
        .collect()
    )
    out = _hdr("validations")
    for r in rows:
        out.append(r["url"])
        for v in r["validations"]:
            out.append(f"\t{v['group']} {v['level']} {v['message']}")
    return "\n".join(out)


def _render_schema(results, **kw) -> str:
    rows = (
        results.select("url", "validation_report").orderBy("url").collect()
    )
    out = _hdr("results", len(rows))
    for r in rows:
        vr = r["validation_report"]
        if vr is None:
            out.append(f"no validation report for: {r['url']}")
            continue
        out.append(f"validation report for: {r['url']}")
        out.append(f"\tscore: {vr['score']}")
        for v in vr["validations"] or []:
            out.append(f"\t{v['type']} {v['path']} penalty {v['penalty']} {v['comment']}")
    return "\n".join(out)


def _render_seo(results, **kw) -> str:
    rep = R.seo_report(results)
    out = _hdr("seo")
    for name, df in rep.items():
        rows = df.collect()
        out += ["", f"{name} ({len(rows)})"]
        for r in rows:
            out.append("\t" + " | ".join(str(v) for v in r))
    return "\n".join(out)


REPORT_NAMES = {
    "summary": lambda results, **kw: R.render_summary(results),
    "results": lambda results, **kw: results_yaml(results, **kw),
    "list": _render_list,
    "highscore": _render_highscore,
    "broken-links": _render_broken,
    "seo": _render_seo,
    "redirects": _render_redirects,
    "schema": _render_schema,
    "validations": _render_validations,
    "errors": _render_errors,
    "links": _render_links,
}


def render_report(
    name: str,
    results: DataFrame,
    url: str = "",
    prefix: str = "",
    page: int | None = None,
    page_size: int | None = None,
) -> str:
    """One endpoint's text for one snapshot, with walker's url/prefix
    result filters applied first (and Service pagination on /list)."""
    fn = REPORT_NAMES[name]
    if name != "results":  # results_yaml filters itself (keeps its header count right)
        results = R.filter_results(results, prefix=prefix, url=url)
        if name == "list":
            return fn(results, page=page, page_size=page_size)
        return fn(results)
    return fn(results, url=url, prefix=prefix)


def report_dual_status(
    name: str,
    running: DataFrame | None,
    complete: DataFrame | None,
    statuses: list[str] | None = None,
    url: str = "",
    prefix: str = "",
    page: int | None = None,
    page_size: int | None = None,
) -> str:
    """walker's dual-snapshot wrapper (``reports/reports.go:134-160``):
    render the report per requested status, defaulting to both."""
    statuses = [s for s in (statuses or []) if s in ("running", "complete")] or [
        "running",
        "complete",
    ]
    out: list[str] = []
    for s in statuses:
        df = running if s == "running" else complete
        out += [f"STATUS {s}", SEP]
        if df is None:
            out[-2] = f"STATUS {s} is nil"
            out.pop()
            continue
        out += [
            render_report(name, df, url=url, prefix=prefix, page=page, page_size=page_size),
            "",
            "",
        ]
    return "\n".join(out)


def menu_html(base: str = "") -> str:
    items = "\n".join(
        f'<li><a href="{base}/{n}">{n}</a></li>' for n in REPORT_NAMES
    )
    return f"<html><body><ul>{items}\n<li><a href=\"{base}/metrics\">metrics</a></li></ul></body></html>"


def serve_reports(crawler, port: int = 0, paths: list[str] | None = None):
    """Serve the report surface for a (possibly looping) crawl. Returns
    the (server, thread) pair; ``server.server_address[1]`` is the bound
    port (pass port=0 for an ephemeral one). Call ``server.shutdown()``
    to stop."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            q = parse_qs(parsed.query)
            name = parsed.path.strip("/")
            try:
                if name == "":
                    body, ctype = menu_html(), "text/html; charset=utf-8"
                elif name == "metrics":
                    body, ctype = (
                        render_prometheus(
                            crawler.results_df(), frontier_open=0, paths=paths
                        ),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                elif name in REPORT_NAMES:
                    running = crawler.running_results_df()
                    complete = crawler.complete_results_df()
                    statuses = [
                        s.strip()
                        for s in ",".join(q.get("status", [])).split(",")
                        if s.strip()
                    ]
                    def _int_or_none(v):
                        # non-numeric ?page=/?pageSize= fall back to
                        # unpaged rather than a 500 (ADVICE r3)
                        try:
                            return int(v) if v is not None else None
                        except ValueError:
                            return None

                    page_q = _int_or_none((q.get("page") or [None])[0])
                    size_q = _int_or_none((q.get("pageSize") or [None])[0])
                    body = report_dual_status(
                        name,
                        running,
                        complete,
                        statuses=statuses,
                        url=(q.get("url") or [""])[0],
                        prefix=(q.get("prefix") or [""])[0],
                        page=page_q,
                        page_size=size_q,
                    )
                    ctype = "text/plain; charset=utf-8"
                else:
                    self.send_error(404)
                    return
            except Exception as e:  # surface errors as 500 text
                self.send_response(500)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            data = body.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, t
