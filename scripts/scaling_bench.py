"""N vs 4N scaling evidence (north_rule: efficiency >= 0.8).

No real cluster in this sandbox, so the same extraction job runs on the
same cached corpus at two parallelism levels — local[8] (N) and
local[32] (4N) — in fresh JVMs (subprocess per level, so no executor
warm-state leaks between runs). Writes BENCH.md.

Usage: python scripts/scaling_bench.py [--docs 240000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--extract-only", "--cpus", str(cpus), "--docs", str(docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240000)
    args = ap.parse_args()

    r8 = run(8, args.docs)
    r32 = run(32, args.docs)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    lines = [
        "# BENCH — scaling evidence (N vs 4N, north_rule)",
        "",
        "Same extraction job, same deterministic corpus "
        f"({args.docs} synthesized pages: ~80% HTML / ~20% PDF / ~1% broken, "
        "Zipf-skewed hosts), two parallelism levels, fresh JVM each:",
        "",
        "| parallelism | docs | wall (s) | docs/sec |",
        "| --- | --- | --- | --- |",
        f"| local[8]  (N)  | {r8['docs']} | {r8['wall_sec']} | {r8['docs_per_sec']} |",
        f"| local[32] (4N) | {r32['docs']} | {r32['wall_sec']} | {r32['docs_per_sec']} |",
        "",
        f"**Scaling efficiency (R_4N / R_N) / 4 = {eff:.3f}** "
        f"(target ≥ 0.8 per BASELINE.json north_rule).",
        "",
        "Reference single-node baseline (BASELINE.md): 10–20 docs/minute "
        "(0.17–0.33 docs/sec) for the OCR-based pipeline; this engine's "
        "deterministic parse path replaces OCR inference, so the honest "
        "comparison is architecture-level: both are CPU-bound per-document "
        "pipelines, ours is Arrow-batched and embarrassingly partition-"
        "parallel.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"n8": r8, "n32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
