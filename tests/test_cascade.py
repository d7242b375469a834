"""M12 — confidence-gated engine cascade (pipeline.run_extract_cascade).

Reference shape: ai_service_local.py:513-537 (local result ≥ threshold →
accept; below → run the expensive engine, keep the strictly-better
result). Ours is deterministic on both arms, so the cascade's exact
output is pinned against the two fixed engines it composes.
"""

import datetime as dt

from webextract import pipeline


def _rows(df):
    return {r["url"]: r for r in df.collect()}


def _short_block_pages(spark, n=3):
    """Adversarial docs where the cascade's second pass genuinely wins:
    every content paragraph is < 25 chars, so the strict profile
    (min_chars 25) keeps nothing → confidence 0; the lenient profile
    (min_chars 10) keeps the planted field sentences and recovers
    spans. On the stock fixture corpus strict already ties the full
    ensemble everywhere, so these rows are what make the gate bite."""
    rows = []
    for k in range(n):
        html = ("<html><body><div><a href='/'>home</a></div>"
                f"<p>Số văn bản: {100 + k}/QD</p>"
                f"<p>Ngày 0{k + 1}/02/2025</p>"
                "</body></html>").encode()
        rows.append((f"https://ex.org/cascade/VANBAN_{k}.html",
                     dt.datetime(2025, 1, 1), bytearray(html), "", "vi"))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def test_cascade_gate_semantics(spark, pages_parquet):
    pages = (spark.read.parquet(pages_parquet).limit(100)
             .unionByName(_short_block_pages(spark)))
    strict = _rows(pipeline.run_extract(pages, profiles=("strict",)))
    full = _rows(pipeline.run_extract(pages))
    casc = _rows(pipeline.run_extract_cascade(pages, accept=0.7))
    assert set(casc) == set(strict)
    n_accepted = n_retried = n_improved = 0
    for url, r in casc.items():
        s = strict[url]
        if s["status"] != "COMPLETED" or s["confidence"] >= 0.7:
            n_accepted += 1
            assert r == s          # gate accepted pass 1 verbatim
        else:
            n_retried += 1
            f = full[url]
            want = f if f["confidence"] > s["confidence"] else s
            assert r == want       # strictly-better wins, pass 1 keeps ties
            assert r["confidence"] >= s["confidence"]
            if r["confidence"] > s["confidence"]:
                n_improved += 1
    # the corpus must exercise both branches AND a genuine pass-2 win
    assert n_accepted > 0 and n_retried >= 3 and n_improved >= 3


def test_cascade_cheap_fields_gate_semantics(spark, pages_parquet):
    # cheap_fields=True: pass 1 is strict-profile + patterns-only fields.
    # Same gate contract as the full cascade, pinned against the two
    # fixed engines it composes (r3 verdict #5).
    pages = (spark.read.parquet(pages_parquet).limit(100)
             .unionByName(_short_block_pages(spark)))
    cheap = _rows(pipeline.run_extract(pages, profiles=("strict",),
                                       patterns_only=True))
    full = _rows(pipeline.run_extract(pages))
    casc = _rows(pipeline.run_extract_cascade(pages, accept=0.7,
                                              cheap_fields=True))
    assert set(casc) == set(cheap)
    n_accepted = n_retried = 0
    for url, r in casc.items():
        c = cheap[url]
        if c["status"] != "COMPLETED" or c["confidence"] >= 0.7:
            n_accepted += 1
            assert r == c
            # accepted rows carry patterns-only spans: no other method
            assert all(s["method"] in ("pattern", "none") for s in r["spans"])
        else:
            n_retried += 1
            f = full[url]
            want = f if f["confidence"] > c["confidence"] else c
            assert r == want
    assert n_accepted > 0 and n_retried >= 3


def test_cascade_in_batch_equals_two_pass(spark, pages_parquet):
    # the r4 in-batch plan (per-document escalation inside the fused
    # map) must emit EXACTLY the two-pass plan's rows — same gate, same
    # strictly-better pick — at both cheap_fields settings
    pages = (spark.read.parquet(pages_parquet).limit(100)
             .unionByName(_short_block_pages(spark)))
    for cf in (False, True):
        two = _rows(pipeline.run_extract_cascade(pages, accept=0.7,
                                                 cheap_fields=cf))
        one = _rows(pipeline.run_extract_cascade_in_batch(
            pages, accept=0.7, cheap_fields=cf))
        assert one == two, f"cheap_fields={cf}"


def test_cascade_accept_zero_equals_cheap_pass(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet).limit(80)
    strict = _rows(pipeline.run_extract(pages, profiles=("strict",)))
    casc = _rows(pipeline.run_extract_cascade(pages, accept=0.0))
    assert casc == strict


def test_cascade_deterministic(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet).limit(80)
    one = _rows(pipeline.run_extract_cascade(pages, accept=0.7))
    two = _rows(pipeline.run_extract_cascade(pages, accept=0.7))
    assert one == two


def test_profiles_restrict_candidates():
    from webextract import boiler, dom

    html = (b"<html><body><p>plain text content with enough characters to"
            b" be kept by every profile</p></body></html>")
    blocks = boiler.blocks_of(dom.parse_html(html))
    assert [c["profile"] for c in boiler.candidates(blocks)] \
        == ["strict", "lenient"]
    assert [c["profile"] for c in boiler.candidates(blocks, ("strict",))] \
        == ["strict"]


def test_staged_path_rejects_profiles(spark, pages_parquet):
    import pytest

    pages = spark.read.parquet(pages_parquet).limit(4)
    with pytest.raises(ValueError):
        pipeline.run_extract(pages, fused=False, profiles=("strict",))


def test_runner_cascade_kill_resume(spark, pages_parquet, tmp_path):
    """run_job(cascade=True): same resume mechanics — a killed cascade
    run resumes to the byte-identical final table, and the final table
    equals the unchunked cascade over the same pages."""
    from webextract import runner

    pages = (spark.read.parquet(pages_parquet).limit(100)
             .unionByName(_short_block_pages(spark)))

    def final(df):
        rows = df.select("url", "text", "status", "confidence").collect()
        return sorted((r["url"], r["text"], r["status"], r["confidence"])
                      for r in rows)

    want = final(pipeline.run_extract_cascade(pages, accept=0.7))
    full = runner.run_job(spark, pages, str(tmp_path / "cf"),
                          commit_groups=4, cascade=True)
    assert final(full) == want

    out = str(tmp_path / "ck")
    partial = runner.run_job(spark, pages, out, commit_groups=4,
                             max_groups=2, cascade=True)
    assert 0 < partial.count() < 103
    resumed = runner.run_job(spark, pages, out, commit_groups=4,
                             cascade=True)
    assert final(resumed) == want


def test_runner_cascade_in_batch_kill_resume(spark, pages_parquet, tmp_path):
    """run_job(cascade='in_batch'): the r4 in-batch plan under the same
    resume mechanics — a killed run resumes to the same final table,
    which equals both the unchunked in-batch cascade AND the two-pass
    cascade at the SAME cheap_fields setting (defaults aligned at
    False, r4 advice; the kill/resume half runs cheap_fields=True to
    pin the run_job plumbing)."""
    from webextract import runner

    pages = (spark.read.parquet(pages_parquet).limit(100)
             .unionByName(_short_block_pages(spark)))

    def final(df):
        rows = df.select("url", "text", "status", "confidence").collect()
        return sorted((r["url"], r["text"], r["status"], r["confidence"])
                      for r in rows)

    # default-vs-default: the two runner cascade modes share defaults now
    want = final(pipeline.run_extract_cascade(pages, accept=0.7))
    full = runner.run_job(spark, pages, str(tmp_path / "ibf"),
                          commit_groups=4, cascade="in_batch")
    assert final(full) == want

    want_cheap = final(pipeline.run_extract_cascade(pages, accept=0.7,
                                                    cheap_fields=True))
    out = str(tmp_path / "ibk")
    partial = runner.run_job(spark, pages, out, commit_groups=4,
                             max_groups=2, cascade="in_batch",
                             cheap_fields=True)
    assert 0 < partial.count() < 103
    resumed = runner.run_job(spark, pages, out, commit_groups=4,
                             cascade="in_batch", cheap_fields=True)
    assert final(resumed) == want_cheap


def test_cascade_multi_snapshot_urls(spark):
    """(url, warc_ts) is the document key: two snapshots of one url —
    one confident, one below the gate — must yield exactly two output
    rows (keying on url alone cross-joined all snapshots of any url
    with a low one)."""
    import datetime as dt

    good = ("<html><body><p>" + "Số văn bản: 77/QD và đây là một đoạn "
            "văn dài đủ ký tự để profile strict giữ lại trọn vẹn." * 3
            + "</p></body></html>").encode()
    short = (b"<html><body><p>S\xe1\xbb\x91 v\xc4\x83n b\xe1\xba\xa3n: "
             b"9/QD</p></body></html>")
    rows = [
        ("https://ex.org/snap/VANBAN_0.html", dt.datetime(2025, 1, 1),
         bytearray(good), "", "vi"),
        ("https://ex.org/snap/VANBAN_0.html", dt.datetime(2025, 6, 1),
         bytearray(short), "", "vi"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    out = pipeline.run_extract_cascade(pages, accept=0.7).collect()
    assert len(out) == 2
    by_ts = {r["warc_ts"]: r for r in out}
    assert len(by_ts) == 2
    fixed = {r["warc_ts"]: r
             for r in pipeline.run_extract(pages).collect()}
    # the low snapshot's winner matches the full-ensemble result
    low_ts = dt.datetime(2025, 6, 1)
    assert by_ts[low_ts]["confidence"] >= 0.0
    assert by_ts[low_ts]["text"] == fixed[low_ts]["text"]


def test_runner_cascade_with_staged_input(spark, pages_parquet, tmp_path):
    """cascade=True composes with stage_input=True (the staged read
    feeds the cascade's pass 1; pass-2 retries still semi-join against
    the staged chunk)."""
    from webextract import runner

    pages = (spark.read.parquet(pages_parquet).limit(60)
             .unionByName(_short_block_pages(spark)))
    ref = runner.run_job(spark, pages, str(tmp_path / "c1"),
                         commit_groups=3, cascade=True)
    staged = runner.run_job(spark, pages, str(tmp_path / "c2"),
                            commit_groups=3, cascade=True,
                            stage_input=True)

    def final(df):
        rows = df.select("url", "text", "status", "confidence").collect()
        return sorted((r["url"], r["text"], r["status"], r["confidence"])
                      for r in rows)

    assert final(staged) == final(ref)
