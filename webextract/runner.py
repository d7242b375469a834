"""Resumable batch job: commit-group loop + anti-join resume (north_rule).

A 10^12-row job WILL be killed mid-flight. Spark gives durability only at
action boundaries, so the runner splits the stable bucket space
(bucket = pmod(xxhash64(url), n_buckets), pipeline.with_bucket) into
``commit_groups`` contiguous ranges and commits each group's
``extracted`` output + per-bucket ``lineage`` rows atomically to the
checkpoint catalog. A killed run leaves complete groups durable; the next
run anti-joins the already-completed buckets
(pages LEFT ANTI JOIN lineage.ok_buckets) and processes only the rest —
exactly the resume mechanic the north_rule demands, at bucket
granularity. Re-running a finished job is a no-op (idempotence).

Scale note: each group commit is a full distributed job over ~1/groups of
the input; the bucket filter is a cheap hash predicate evaluated at the
scan (no shuffle added — stage 1 repartitions by bucket anyway). On a
1000-executor cluster you'd size commit_groups so one group ≈ 15-60 min
of work: failure loses at most one group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import pipeline
from .checkpoint import Catalog

EXTRACTED_TABLE = "extracted"
LINEAGE_TABLE = "lineage"


def completed_buckets(spark: SparkSession, catalog: Catalog) -> set[int]:
    lin = catalog.read(spark, LINEAGE_TABLE)
    if lin is None:
        return set()
    rows = (
        lin.filter(F.col("stage") == "final")
        .select("partition_id").distinct().collect()
    )
    return {r["partition_id"] for r in rows}


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str | None = None,
    n_buckets: int = pipeline.DEFAULT_BUCKETS,
    commit_groups: int = 8,
    max_groups: int | None = None,
    resume: bool = True,
    sorted_layout: bool = False,
) -> DataFrame:
    """Run (or resume) the extraction job; returns the full extracted
    table as of the last commit. ``max_groups`` limits how many commit
    groups this invocation processes (test hook simulating a kill).
    ``sorted_layout`` range-partitions each commit's output by url
    (pipeline.layout_by_url) for point-lookup/min-max pruning."""
    run_id = run_id or pipeline.new_run_id()
    catalog = Catalog(out_root)
    done = completed_buckets(spark, catalog) if resume else set()

    # lineage-driven anti-join resume: done buckets never re-read payloads
    group_of = lambda b: b * commit_groups // n_buckets  # noqa: E731
    pending_groups: list[list[int]] = [[] for _ in range(commit_groups)]
    for b in range(n_buckets):
        if b not in done:
            pending_groups[group_of(b)].append(b)

    prepped = pipeline.with_bucket(pipeline.with_doc_type(pages), n_buckets)
    if done:
        done_df = spark.createDataFrame(
            [(b,) for b in sorted(done)], "bucket int"
        )
        prepped = prepped.join(F.broadcast(done_df), "bucket", "left_anti")

    processed = 0
    for buckets in pending_groups:
        if not buckets:
            continue
        if max_groups is not None and processed >= max_groups:
            break
        chunk = prepped.filter(F.col("bucket").isin(buckets))
        extracted = pipeline.run_extract_full(chunk, n_buckets, repartition=True)
        # one pass per group: cache so extracted + lineage don't recompute
        extracted = extracted.persist()
        try:
            out_rows = extracted.select(*pipeline.EXTRACTED_COLUMNS)
            if sorted_layout:
                out_rows = pipeline.layout_by_url(out_rows)
            catalog.append(EXTRACTED_TABLE, out_rows)
            catalog.append(
                LINEAGE_TABLE, pipeline.lineage_of(extracted, run_id, "final")
            )
        finally:
            extracted.unpersist()
        processed += 1

    out = catalog.read(spark, EXTRACTED_TABLE)
    if out is None:
        return spark.createDataFrame([], pipeline_schema(spark))
    return out


PARSED_TABLE = "ckpt_parsed"


def run_job_staged(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str | None = None,
    n_buckets: int = pipeline.DEFAULT_BUCKETS,
) -> DataFrame:
    """Staged variant of run_job: materializes the parse stage (the
    expensive payload-touching pass) to the checkpoint catalog, then
    derives extracted from it. Enables C4-style reprocessing: a changed
    field registry re-runs ONLY assemble+fields from ``ckpt_parsed``,
    never re-reading/re-parsing payloads (reference analogue:
    reprocess-with-cached-OCR, document_service.py:253-282)."""
    run_id = run_id or pipeline.new_run_id()
    catalog = Catalog(out_root)
    parsed = pipeline.stage_parse(pages, n_buckets).persist()
    try:
        catalog.append(PARSED_TABLE, parsed)
        extracted = pipeline.stage_fields(pipeline.stage_assemble(parsed)).persist()
        try:
            catalog.append(EXTRACTED_TABLE,
                           extracted.select(*pipeline.EXTRACTED_COLUMNS))
            catalog.append(LINEAGE_TABLE,
                           pipeline.lineage_of(extracted, run_id, "final"))
        finally:
            extracted.unpersist()
    finally:
        parsed.unpersist()
    return catalog.read(spark, EXTRACTED_TABLE)


def reprocess_fields(
    spark: SparkSession,
    out_root: str,
    out_table: str = "extracted_v2",
    run_id: str | None = None,
    version: int | None = None,
) -> DataFrame:
    """Re-run assemble+fields from the checkpointed parse output (pinned
    to a catalog snapshot) — zero payload re-reads. Returns the new
    extracted table; writes it + lineage under ``out_table``."""
    run_id = run_id or pipeline.new_run_id()
    catalog = Catalog(out_root)
    parsed = catalog.read(spark, PARSED_TABLE, version=version)
    if parsed is None:
        raise ValueError(f"no {PARSED_TABLE} checkpoint under {out_root}")
    extracted = pipeline.stage_fields(pipeline.stage_assemble(parsed)).persist()
    try:
        catalog.append(out_table, extracted.select(*pipeline.EXTRACTED_COLUMNS))
        catalog.append(LINEAGE_TABLE,
                       pipeline.lineage_of(extracted, run_id, "reprocess"))
    finally:
        extracted.unpersist()
    return catalog.read(spark, out_table)


def pipeline_schema(spark: SparkSession):
    from .udfs import BLOCK_T, SPAN_T

    return (
        "url string, warc_ts timestamp, doc_type string, status string, "
        f"text string, spans {SPAN_T}, blocks {BLOCK_T}, confidence double, "
        "n_pages int, error string"
    )
