"""CLI smoke: the walker-style YAML config path end-to-end in its own
process — crawl with --loops 2, render a report endpoint and the
prometheus text (the `walker -c config.yaml` analogue)."""

import pytest
import json
import os
import subprocess
import sys

from walker_spark.sources.synthetic import SiteSpec, write_pages_tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# multi-loop CLI sweep (loop semantics stay default in test_loops) — ~1 min; VERDICT r4 #4 suite-wall triage
@pytest.mark.slow
def test_cli_loops_and_report(spark, tmp_path):
    spec = SiteSpec(seed=5, n_hosts=2, n_pages=14)  # smallest site that still multi-rounds
    paths = write_pages_tables(spark, spec, str(tmp_path / "site"))
    cfg = tmp_path / "walker.yaml"
    cfg.write_text(
        "target: https://host-0000.example/\n"
        "agent: walker-spark\n"
        "group-header: group\n"
        "ignore-robots: true\n"
    )
    env = {**os.environ, "PYTHONPATH": REPO}
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "walker_spark.cli",
            str(cfg),
            "--pages",
            paths["pages"],
            "--redirects",
            paths["redirect_edges"],
            "--checkpoint",
            str(tmp_path / "ck"),
            "--master",
            "local[4]",
            "--loops",
            "2",
            "--report",
            "prometheus",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    summary = json.loads(next(ln for ln in lines if ln.startswith("{")))
    assert summary["loops"] == 2
    assert summary["last"]["total_fetched"] > 0
    assert "# TYPE walker_scrape_durations_seconds summary" in proc.stdout
    assert os.path.isdir(tmp_path / "ck" / "loop=001")
