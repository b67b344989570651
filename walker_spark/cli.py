"""Command-line entry point — the `walker -c config.yaml` analogue.

Usage:
    python -m walker_spark.cli CONFIG.yaml --pages PATH [options]

Runs the BSP crawl described by the walker-style YAML config against a
pages parquet table and prints the summary plus the standard reports
(walker's /summary text output). A reference user's config file works
as-is (polymorphic target, ignore/depth/paging/agent fields).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="walker_spark", description=__doc__)
    ap.add_argument("config", help="walker-style YAML config file")
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--redirects", help="redirect_edges parquet path")
    ap.add_argument("--robots", help="robots parquet path (host, body)")
    ap.add_argument("--checkpoint", default="./walker_spark_ckpt")
    ap.add_argument("--master", default=None, help="spark master (default local[*])")
    ap.add_argument("--resume", action="store_true", help="resume from checkpoint")
    ap.add_argument("--multi-host", action="store_true")
    ap.add_argument(
        "--loops",
        type=int,
        default=1,
        help="crawl to fixpoint N times, restarting from seeds each time "
        "(walker's monitoring loop; each loop keeps its own snapshot)",
    )
    report_choices = [
        "summary", "results", "list", "highscore", "broken-links", "seo",
        "redirects", "schema", "validations", "errors", "links",
        "prometheus", "none",
    ]
    ap.add_argument(
        "--report",
        choices=report_choices,
        default="summary",
        help="render one of walker's report endpoints (reports/reports.go:61-127) "
        "or the prometheus metrics text after the crawl",
    )
    ap.add_argument(
        "--serve",
        type=int,
        metavar="PORT",
        help="serve all report endpoints + /metrics over HTTP after the crawl "
        "(blocks until interrupted)",
    )
    args = ap.parse_args(argv)

    from .config import load_config
    from .plans.crawl import Crawler
    from .session import get_spark

    with open(args.config) as f:
        conf = load_config(f.read())

    spark = get_spark(app_name="walker-spark-cli", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    robots = {}
    if args.robots:
        robots = {
            r["host"]: r["body"]
            for r in spark.read.parquet(args.robots).collect()
        }
    crawler = Crawler(
        spark,
        conf,
        pages=spark.read.parquet(args.pages),
        redirect_edges=spark.read.parquet(args.redirects) if args.redirects else None,
        robots_bodies=robots,
        checkpoint_dir=args.checkpoint,
        multi_host=args.multi_host,
    )
    if args.loops > 1:
        summaries = crawler.run_loops(args.loops, resume=args.resume)
        summary = summaries[-1]
        print(json.dumps({"loops": len(summaries), "last": summary}))
    else:
        summary = crawler.run(resume=args.resume)
        print(json.dumps(summary))
    if args.report == "prometheus":
        from .operators.prometheus import render_prometheus

        print(render_prometheus(crawler.results_df(), paths=conf.target.paths))
    elif args.report != "none":
        from .operators.report_server import render_report

        print(render_report(args.report, crawler.results_df()))
    if args.serve is not None:
        from .operators.report_server import serve_reports

        server, thread = serve_reports(crawler, args.serve, paths=conf.target.paths)
        print(f"serving reports on http://127.0.0.1:{server.server_address[1]}/")
        try:
            thread.join()
        except KeyboardInterrupt:
            server.shutdown()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
