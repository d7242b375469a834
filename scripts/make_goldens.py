"""Regenerate the committed golden fixtures from the pure-Python oracle.

Run after any deliberate spec change:  python scripts/make_goldens.py
(The golden files pin the extraction spec; the pytest suite fails loudly
if oracle output drifts from them — SURVEY.md §5.2.)

Three artifacts under tests/golden/:

- ``extracted.parquet`` — full-fidelity oracle records (arrays as
  structs) for the first N_GOLDEN fixture pages; the byte-parity target
  of tests/test_golden.py.
- ``flagship_driver.parquet`` — the DRIVER-CONTRACT projection of the
  first N_DRIVER pages (the exact column set __spark_entry__ registers
  for ``extract_flagship``): content from the pure-Python oracle,
  arrays serialized with the SAME Spark ``to_json`` the live query
  applies (fixed encoding over independently-derived content). This is
  what turns extract_flagship from rows-only into hash-oracled — the
  driver's DuckDB reads this file (VERDICT r3 #2; the reference intended
  exactly this and never shipped it, test_real_document.py:206-222).
- ``pdf_pages_driver.parquet`` — same idea for ``extract_pdf_pages``
  (fixture PDFs → exploded per-page block rows).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webextract import fixtures, golden, oracle  # noqa: E402

N_GOLDEN = 500
N_DRIVER = 200  # must match _fixture_pages(spark) in __spark_entry__.py


def write_driver_goldens(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from webextract import pipeline

    records = [
        oracle.extract_document(url, payload)
        for url, _ts, payload, _t, _l in fixtures.gen_pages(N_DRIVER)
    ]
    tmp = os.path.join(tempfile.mkdtemp(), "oracle.parquet")
    golden.write_golden(tmp, records)

    spark = pipeline.build_session(cpus=4, shuffle_partitions=4,
                                   app="make-goldens")
    ext = spark.read.parquet(tmp)
    flag = ext.select(
        "url", "doc_type", "status", "text",
        F.round("confidence", 4).alias("confidence"), "n_pages", "error",
        F.to_json("spans").alias("spans_json"),
        F.to_json("blocks").alias("blocks_json"),
    ).toPandas()
    flag_schema = pa.schema([
        ("url", pa.string()), ("doc_type", pa.string()),
        ("status", pa.string()), ("text", pa.string()),
        ("confidence", pa.float64()), ("n_pages", pa.int32()),
        ("error", pa.string()), ("spans_json", pa.string()),
        ("blocks_json", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(flag, schema=flag_schema, preserve_index=False),
        os.path.join(out_dir, "flagship_driver.parquet"))

    pdfs = ext.filter(
        F.col("url").endswith(".pdf") & (F.col("status") == "COMPLETED"))
    pages = pdfs.select("url", "n_pages", F.explode("blocks").alias("b")) \
        .select("url", "n_pages", F.col("b.page").alias("page"),
                F.col("b.n_chars").alias("page_chars")).toPandas()
    pdf_schema = pa.schema([
        ("url", pa.string()), ("n_pages", pa.int32()),
        ("page", pa.int32()), ("page_chars", pa.int32()),
    ])
    pq.write_table(
        pa.Table.from_pandas(pages, schema=pdf_schema, preserve_index=False),
        os.path.join(out_dir, "pdf_pages_driver.parquet"))
    spark.stop()
    print(f"wrote flagship_driver ({len(flag)} rows) and "
          f"pdf_pages_driver ({len(pages)} rows) to {out_dir}")


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
    write_driver_goldens(out_dir)


if __name__ == "__main__":
    main()
