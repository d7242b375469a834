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


def test_bench_stdout_line_fits_driver_tail():
    """The driver records only the last ~2000 chars of bench.py stdout
    and parses the JSON line out of that tail (BENCH_r04.json went
    "parsed": null when the full result outgrew it). Pin that
    compact_result stays under the window with EVERY registered
    BENCH_QUERIES wall at a worst-case width, and that it still carries
    the driver-contract keys."""
    import bench

    result = {
        "metric": "extraction_wall_sec_240000_docs",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 99999.999 for name in bench.BENCH_QUERIES},
        "sf": 0.1,
        "extract": {"docs": 240000, "wall_sec": 99999.999,
                    "docs_per_sec": 99999.9, "split_bytes": 123456789},
        "dedup": {"docs": 240000, "wall_sec": 99999.999,
                  "docs_per_sec": 9.9, "kept": 1, "kept_frac": 0.0001},
        "ann_scale": [{"n": 100000, "dim": 768, "blas": {"x": 1.0}}] * 3,
        "scale": {"extract": {"wall_sec": 99999.999},
                  "dedup": {"wall_sec": 99999.999},
                  "lsh_prod": {"wall_sec": 99999.999}},
        "warc": {"docs_per_sec": 99999.9, "disk_mb_per_sec": 99999.9},
        "cpus": 32,
    }
    line = bench.compact_result(result)
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert parsed["detail"] == "BENCH_FULL.json"
    # no truncation needed at the CURRENT registry size — every timed
    # query's wall is on the line
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
