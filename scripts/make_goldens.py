"""Regenerate tests/golden/extracted.parquet from the pure-Python oracle.

Run after any deliberate spec change:  python scripts/make_goldens.py
(The golden files pin the extraction spec; the pytest suite fails loudly
if oracle output drifts from them — SURVEY.md §5.2.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webextract import fixtures, golden, oracle  # noqa: E402

N_GOLDEN = 500

def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    records = [
        oracle.extract_document(url, payload)
        for url, _ts, payload, _t, _l in fixtures.gen_pages(N_GOLDEN)
    ]
    golden.write_golden(os.path.join(out_dir, "extracted.parquet"), records)
    n_fail = sum(1 for r in records if r["status"] == "FAILED")
    print(f"wrote {len(records)} golden records ({n_fail} FAILED) to {out_dir}")


if __name__ == "__main__":
    main()
