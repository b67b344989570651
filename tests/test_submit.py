"""The north rule's deployment mode, exercised for real: zip the
package, ``spark-submit --py-files`` it from a scrubbed environment
(cwd=/tmp, no repo on PYTHONPATH), and check the crawl ran — proving
both the driver script and the executor python workers resolve
``walker_spark`` from the distributed zip alone."""

import pytest
import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


# spark-submit --py-files end-to-end (the BASELINE.json launch-mode check) — ~1 min; VERDICT r4 #4 suite-wall triage
@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    zip_base = str(tmp_path / "walker_spark")
    zip_path = shutil.make_archive(zip_base, "zip", REPO, "walker_spark")

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the only source
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            str(tmp_path / "site"),
            str(tmp_path / "ckpt"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/tmp",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("@@SUBMIT ")), None
    )
    assert line, proc.stdout[-2000:]
    summary = json.loads(line[len("@@SUBMIT ") :])
    assert summary["fetched"] > 0 and summary["rounds"] >= 1
    assert summary["codes"].get("200", summary["codes"].get(200, 0)) > 0
