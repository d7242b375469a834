"""Robustness fuzz (SURVEY.md §7.6 hard-part #2): deterministic
mutations of fixture payloads — truncations, splices, duplications,
byte corruption — must (a) terminate, (b) never throw past the document
(failures are data, C2), and (c) keep Spark byte-identical to the
single-node oracle on every mutant."""

import pyspark.sql.functions as F

from webextract import fixtures, oracle, pipeline

N_BASE = 24


def _mutants():
    for i in range(N_BASE):
        url, _ts, payload, _t, _l = fixtures.gen_page(i)
        r = fixtures.mix(i, 999)
        cut = r % max(1, len(payload))
        corrupt_at = fixtures.mix(i, 998) % max(1, len(payload))
        corrupted = bytearray(payload)
        corrupted[corrupt_at] = (corrupted[corrupt_at] + 1 + i) % 256
        yield f"{url}?m=trunc", payload[:cut]
        yield f"{url}?m=splice", payload[:cut] + b"<div><p>&#x;<b>" + payload[cut:]
        yield f"{url}?m=dup", payload + payload
        yield f"{url}?m=corrupt", bytes(corrupted)


def test_oracle_total_on_mutants():
    n = 0
    for url, payload in _mutants():
        rec = oracle.extract_document(url, payload)
        assert rec["status"] in ("COMPLETED", "FAILED")
        assert isinstance(rec["text"], str)
        if rec["status"] == "FAILED":
            assert rec["error"]
        n += 1
    assert n == N_BASE * 4


def test_spark_equals_oracle_on_mutants(spark):
    muts = list(_mutants())
    want = {u: oracle.extract_document(u, p) for u, p in muts}
    import datetime as dt
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [(u, ts, bytearray(p), "", "vi") for u, p in muts],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r["url"]: r for r in pipeline.run_extract(df, n_buckets=8).collect()}
    assert set(got) == set(want)
    for u, w in want.items():
        g = got[u]
        assert g["text"] == w["text"], u
        assert g["status"] == w["status"], u
        assert (g["error"] or None) == (w["error"] or None), u


def test_staged_path_equals_fused_on_mutants(spark):
    """The 3-stage path must agree with the fused path on adversarial
    inputs too, not just on well-formed goldens — the native HOF argmax
    and the Python argmax see empty/failed candidate lists here."""
    import datetime as dt
    muts = list(_mutants())
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [(u, ts, bytearray(p), "", "vi") for u, p in muts],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    fused = {r["url"]: r for r in pipeline.run_extract(df, n_buckets=8).collect()}
    staged = {r["url"]: r for r in
              pipeline.run_extract(df, n_buckets=8, fused=False).collect()}
    assert set(fused) == set(staged)
    for u in fused:
        assert fused[u]["text"] == staged[u]["text"], u
        assert fused[u]["status"] == staged[u]["status"], u
        assert fused[u]["confidence"] == staged[u]["confidence"], u


def test_mutant_failures_counted_in_lineage(spark, tmp_path):
    from webextract import runner
    from webextract.checkpoint import Catalog
    import datetime as dt
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    muts = list(_mutants())
    df = spark.createDataFrame(
        [(u, ts, bytearray(p), "", "vi") for u, p in muts],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "fuzz")
    ext = runner.run_job(spark, df, out, n_buckets=8, commit_groups=2)
    lin = Catalog(out).read(spark, runner.LINEAGE_TABLE)
    sums = lin.agg(F.sum("ok_count").alias("ok"), F.sum("fail_count").alias("f"),
                   F.sum("input_count").alias("n")).collect()[0]
    assert sums["n"] == len(muts)
    assert sums["f"] == ext.filter(F.col("status") == "FAILED").count()
