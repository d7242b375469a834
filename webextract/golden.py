"""Golden-fixture I/O: oracle records ⇄ parquet (SURVEY.md §5.2 #1)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SPAN_PA = pa.struct(
    [
        ("name", pa.string()),
        ("value", pa.string()),
        ("field_type", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("confidence", pa.float64()),
        ("is_required", pa.bool_()),
        ("method", pa.string()),
    ]
)
BLOCK_PA = pa.struct(
    [("page", pa.int32()), ("score", pa.float64()), ("n_chars", pa.int32())]
)
EXTRACTED_PA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_type", pa.string()),
        ("status", pa.string()),
        ("text", pa.string()),
        ("spans", pa.list_(SPAN_PA)),
        ("blocks", pa.list_(BLOCK_PA)),
        ("confidence", pa.float64()),
        ("n_pages", pa.int32()),
        ("error", pa.string()),
    ]
)


def write_golden(path: str, records: list[dict]) -> None:
    cols = {name: [r[name] for r in records] for name in EXTRACTED_PA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[n], type=EXTRACTED_PA.field(n).type) for n in EXTRACTED_PA.names],
        schema=EXTRACTED_PA,
    )
    pq.write_table(table, path)


def read_golden(path: str) -> list[dict]:
    return pq.read_table(path).to_pylist()
