"""Hypothesis property tests: the oracle must be TOTAL and DETERMINISTIC
on arbitrary byte inputs (C2: failures are data; SURVEY §7.6 #2 — any
input must terminate with some deterministic output). Derandomized so CI
runs are reproducible."""

from hypothesis import given, settings, strategies as st

from webextract import oracle

COMMON = dict(max_examples=80, deadline=None, derandomize=True)

tagish = st.text(
    alphabet="<>/= \"'&#;xabpdivscrptul\n\t-!?%PDF0123456789",
    max_size=300,
)


def _check(url: str, payload: bytes) -> None:
    rec1 = oracle.extract_document(url, payload)
    rec2 = oracle.extract_document(url, payload)
    assert rec1 == rec2  # deterministic
    assert rec1["status"] in ("COMPLETED", "FAILED")
    assert isinstance(rec1["text"], str)
    assert isinstance(rec1["spans"], list)
    assert rec1["confidence"] >= 0.0
    for s in rec1["spans"]:
        if s["start"] >= 0:  # span offsets index into extracted text
            assert rec1["text"][s["start"]:s["end"]] == s["value"]


@settings(**COMMON)
@given(st.binary(max_size=400))
def test_total_on_arbitrary_bytes(payload):
    _check("https://fuzz.example.org/docs/VANBAN_x.html", payload)


@settings(**COMMON)
@given(tagish)
def test_total_on_tag_soup(text):
    _check("https://fuzz.example.org/docs/BIA_x.html", text.encode("utf-8"))


@settings(**COMMON)
@given(st.binary(max_size=200))
def test_total_on_pdf_magic(payload):
    _check("https://fuzz.example.org/docs/MUCLUC_x.pdf", b"%PDF-1.4\n" + payload)
