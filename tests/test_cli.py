"""The spark-submit entrypoint (scripts/run_job.py) must work as a real
subprocess CLI — argument wiring, session bootstrap, resume-on-rerun."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_job_cli_end_to_end(tmp_path, pages_parquet):
    out = str(tmp_path / "out")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "run_job.py"),
           "--input", pages_parquet, "--output", out,
           "--buckets", "16", "--commit-groups", "2", "--stage-input"]
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        cwd=REPO, timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    summary = json.loads(r1.stdout.strip().splitlines()[-1])
    assert summary["rows"] > 0 and summary["completed"] > 0
    # re-run resumes: a finished job is a no-op with identical row count
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        cwd=REPO, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["rows"] == summary["rows"]
