"""Single-node pure-Python oracle: bytes → extracted record.

This is the golden source (SURVEY.md §5.2): the Spark pipeline's pandas
UDFs call EXACTLY these functions per document, so Spark output is
byte-identical per url by construction. It mirrors the reference's
pipeline compose (ocr-ai-service/app/services/document_service.py:90-182,
C1): validate → detect type → parse → best-of assemble → field extract,
with per-document error capture instead of exceptions
(document_service.py:173-182, C2 — failures are data).
"""

from __future__ import annotations

from . import MAX_PAYLOAD_BYTES
from .boiler import blocks_of, candidates
from .dom import parse_html
from .fields import detect_doc_type, extract_spans
from .pdfrun import extract_pdf

STATUS_COMPLETED = "COMPLETED"
STATUS_FAILED = "FAILED"
# Raster-only input (scanned page / raw image): structurally valid but
# carries no extractable text runs. The reference's core competence is
# OCR-ing exactly these (ocr_service_advanced.py:360-428 hybrid_ocr);
# this engine is deterministic-parse-only by mandate, so instead of an
# empty-text COMPLETED or an opaque FAILED it CLASSIFIES the document —
# status=NEEDS_OCR with the sniffed format in ``error``
# ("needs_ocr: image/jpeg", "needs_ocr: pdf-raster") — the honest
# routing row a downstream OCR stage would consume (VERDICT r4 #1).
STATUS_NEEDS_OCR = "NEEDS_OCR"

PDF_MAGIC = b"%PDF-"

# magic-byte table shared with the multimodal sniffer
# (multimodal._sniff_format builds its table from this one)
MEDIA_MAGICS: dict[bytes, str] = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"II*\x00": "tiff",
    b"MM\x00*": "tiff",
}


def sniff_kind(payload: bytes) -> str:
    """Payload sniff (the reference keys on filename extension,
    document_service.py:58; we key on magic bytes like its PDF check).
    Returns "pdf", "image/<fmt>" (raw raster payload — the NEEDS_OCR
    input class), or "html" (the permissive default: tag soup parses)."""
    if payload[:5] == PDF_MAGIC:
        return "pdf"
    for magic, name in MEDIA_MAGICS.items():
        if payload[: len(magic)] == magic:
            return f"image/{name}"
    return "html"


def parse_candidates(payload: bytes,
                     profiles: tuple[str, ...] | None = None) -> dict:
    """Stage-1 semantics: payload → candidate texts + per-candidate blocks.

    Returns {kind, n_pages, candidates:[{profile,conf,score,text,
    blocks:[{page,score,n_chars}]}], error}. Candidates empty + error set
    on failure (size guard S2, parse errors). ``profiles`` restricts the
    HTML candidate ensemble (M12 cascade cheap pass); the PDF arm is a
    single deterministic parse either way."""
    if payload is None or len(payload) == 0:
        return {"kind": "html", "n_pages": 0, "candidates": [], "error": "empty payload"}
    if len(payload) > MAX_PAYLOAD_BYTES:
        return {
            "kind": sniff_kind(payload),
            "n_pages": 0,
            "candidates": [],
            "error": f"payload too large: {len(payload)} > {MAX_PAYLOAD_BYTES}",
        }
    kind = sniff_kind(payload)
    if kind.startswith("image/"):
        # raw raster payload: nothing to parse deterministically —
        # classify for a downstream OCR stage (status=NEEDS_OCR)
        return {"kind": kind, "n_pages": 0, "candidates": [], "error": None}
    try:
        if kind == "pdf":
            pages = extract_pdf(payload)
            if pages and all(p == "" for p in pages) and b"/Image" in payload:
                # structurally-valid PDF whose pages carry images but ZERO
                # text runs — a scanned document (the reference rasterizes
                # + OCRs these, ocr_service.py:41-54): classify, keep the
                # real page count as metadata
                return {"kind": "pdf-raster", "n_pages": len(pages),
                        "candidates": [], "error": None}
            text = "\n\n".join(p for p in pages if p)  # F2: skip empty pages
            blocks = [
                {"page": i, "score": 1.0, "n_chars": len(p)} for i, p in enumerate(pages)
            ]
            cand = {
                "profile": "pdf",
                "conf": 1.0,
                "score": 1.0 * 0.7 + len(text) / 1000 * 0.3,
                "text": text,
                "blocks": blocks,
            }
            return {"kind": kind, "n_pages": len(pages), "candidates": [cand], "error": None}
        dom = parse_html(payload)
        cands = candidates(blocks_of(dom), profiles)
        return {"kind": kind, "n_pages": 1, "candidates": cands, "error": None}
    except Exception as e:  # noqa: BLE001 — C2: never throw past the doc
        return {"kind": kind, "n_pages": 0, "candidates": [], "error": f"{type(e).__name__}: {e}"}


def best_candidate(cands: list[dict]) -> dict | None:
    """O3 argmax on precomputed score, first-wins ties (strictly-greater
    replaces). The Spark pipeline does this step natively (aggregate HOF)
    with identical semantics."""
    best = None
    for c in cands:
        if best is None or c["score"] > best["score"]:
            best = c
    return best


def extract_document(url: str, payload: bytes,
                     profiles: tuple[str, ...] | None = None,
                     patterns_only: bool = False) -> dict:
    """Full per-document pipeline → one row of the ``extracted`` table.
    ``profiles`` restricts the candidate ensemble; ``patterns_only``
    restricts the fields stage to the compiled-pattern arm (both M12
    cascade cheap-pass knobs)."""
    doc_type = detect_doc_type(url)
    parsed = parse_candidates(payload, profiles)
    if parsed["error"] is not None:
        return {
            "url": url,
            "doc_type": doc_type,
            "status": STATUS_FAILED,
            "text": "",
            "spans": [],
            "blocks": [],
            "confidence": 0.0,
            "n_pages": 0,
            "error": parsed["error"],
        }
    kind = parsed["kind"]
    if kind == "pdf-raster" or kind.startswith("image/"):
        # raster-only document: classified, not failed — error carries
        # the sniffed format as routing metadata for an OCR stage
        return {
            "url": url,
            "doc_type": doc_type,
            "status": STATUS_NEEDS_OCR,
            "text": "",
            "spans": [],
            "blocks": [],
            "confidence": 0.0,
            "n_pages": parsed["n_pages"],
            "error": f"needs_ocr: {kind}",
        }
    best = best_candidate(parsed["candidates"])
    text = best["text"] if best else ""
    blocks = best["blocks"] if best else []
    spans, confidence = extract_spans(text, doc_type, patterns_only)
    return {
        "url": url,
        "doc_type": doc_type,
        "status": STATUS_COMPLETED,
        "text": text,
        "spans": spans,
        "blocks": blocks,
        "confidence": confidence,
        "n_pages": parsed["n_pages"],
        "error": None,
    }


def extract_document_cascade(url: str, payload: bytes, accept: float = 0.7,
                             cheap_profiles: tuple[str, ...] = ("strict",),
                             cheap_fields: bool = False) -> dict:
    """In-process M12 cascade (r4): the document-level twin of
    pipeline.run_extract_cascade's two-pass plan — cheap pass first;
    a COMPLETED result below the ``accept`` gate is re-extracted with
    the full ensemble and the strictly-better result wins (the cheap
    pass keeps ties, exactly the reference's openai-vs-local pick,
    ai_service_local.py:513-537). Running the escalation inside the
    SAME batch skips the two-pass plan's cache materialization, second
    input scan, and merge joins — per-document output is IDENTICAL
    (pinned by tests/test_cascade.py)."""
    first = extract_document(url, payload, cheap_profiles,
                             patterns_only=cheap_fields)
    if first["status"] != STATUS_COMPLETED or first["confidence"] >= accept:
        return first
    full = extract_document(url, payload)
    return full if full["confidence"] > first["confidence"] else first
