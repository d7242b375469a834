"""Regex field registry + char-span extraction.

Re-expresses the reference's rule-based field extraction
(ocr-ai-service/app/services/ai_service.py:219-255 ``extract_field_with_rules``
and the per-doc-type field registry ai_service.py:28-57), with the
span-producing behavior of its regex NER
(ai_service_local.py:112-134 — ``m.start()/m.end()`` char offsets, F12).

Semantics kept from the reference:
- per-document-type field list with types + required flags (ai_service.py:28-57)
- ordered pattern list per field, first-match-wins (ai_service.py:237-242, O5)
- match confidence 0.8; generic DATE fallback ``\\d{1,2}[/-]\\d{1,2}[/-]\\d{4}``
  at 0.6 (F8); generic NUMERIC fallback ``(\\d+)`` at 0.4 (F9); miss → ""/0.0
- value = group(1) stripped (ai_service.py:241)
- overall confidence = mean of nonzero field confidences (ai_service.py:200-201, A3)
- doc-type detection by basename prefix BIA/MUCLUC (ocr_service.py:170-179, F1)

Divergences decided by spec (SURVEY.md §7.4 — goldens pin these):
- free-text captures use ``[^\\n]+`` instead of the reference's DOTALL
  ``(.+)`` (which captured to end-of-document — a bug, not a behavior)
- we emit explicit [start, end) char offsets of the *stripped* group(1)
  into the extracted text; missing fields carry start = end = -1
- patterns exist for every registry field (the reference's dict covered
  only 8 of its 22 declared fields; the rest silently hit fallbacks)

Everything here is pure Python ``re`` — the same module runs in the
single-node oracle and inside the Spark pandas UDF, never mixed with Java
regex on the golden path (SURVEY.md §4.3).
"""

from __future__ import annotations

import re

DOC_BIA = "THONG_TIN_HO_SO"
DOC_MUCLUC = "MUC_LUC_TAI_LIEU"
DOC_VANBAN = "THONG_TIN_VAN_BAN"

# (name, field_type, is_required) — ai_service.py:28-57
DOC_FIELDS: dict[str, list[tuple[str, str, bool]]] = {
    DOC_BIA: [
        ("so_ho_so", "TEXT", True),
        ("tieu_de_ho_so", "TEXT", True),
        ("don_vi_lap_ho_so", "TEXT", False),
        ("thoi_han_bao_quan", "TEXT", False),
        ("ngay_bat_dau", "DATE", False),
        ("ngay_ket_thuc", "DATE", False),
        ("tong_so_trang", "NUMERIC", False),
        ("ghi_chu", "TEXT", False),
    ],
    DOC_MUCLUC: [
        ("so_thu_tu", "NUMERIC", True),
        ("so_ky_hieu", "TEXT", True),
        ("ngay_thang", "DATE", False),
        ("trich_yeu_noi_dung", "TEXT", True),
        ("so_trang", "NUMERIC", False),
        ("ghi_chu", "TEXT", False),
    ],
    DOC_VANBAN: [
        ("so_van_ban", "TEXT", True),
        ("ngay_ban_hanh", "DATE", False),
        ("trich_yeu", "TEXT", True),
        ("don_vi_ban_hanh", "TEXT", False),
        ("nguoi_ky", "TEXT", False),
        ("loai_van_ban", "TEXT", False),
        ("so_trang", "NUMERIC", False),
        ("ghi_chu", "TEXT", False),
    ],
}

_DATE = r"(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{4})"
_LINE = r"([^\n]+)"

# ordered, first-match-wins (ai_service.py:223-232 style, completed per spec)
PATTERNS: dict[str, list[str]] = {
    "so_ho_so": [r"Số hồ sơ\s*:?\s*(\d[\w\-/]*)", r"Hồ sơ số\s*:?\s*(\d[\w\-/]*)"],
    "tieu_de_ho_so": [r"Tiêu đề\s*:\s*" + _LINE, r"Nội dung\s*:\s*" + _LINE],
    "don_vi_lap_ho_so": [r"Đơn vị lập hồ sơ\s*:\s*" + _LINE, r"Đơn vị\s*:\s*" + _LINE],
    "thoi_han_bao_quan": [r"Thời hạn bảo quản\s*:\s*" + _LINE],
    "ngay_bat_dau": [r"Ngày bắt đầu\s*:?\s*" + _DATE],
    "ngay_ket_thuc": [r"Ngày kết thúc\s*:?\s*" + _DATE],
    "tong_so_trang": [r"Tổng số\s*:?\s*(\d+)\s*trang", r"(\d+)\s*trang"],
    "ghi_chu": [r"Ghi chú\s*:\s*" + _LINE],
    "so_thu_tu": [r"Số thứ tự\s*:?\s*(\d+)", r"STT\s*:?\s*(\d+)"],
    "so_ky_hieu": [r"Số ký hiệu\s*:?\s*(\d[\w\-/]*)", r"Ký hiệu\s*:?\s*(\d[\w\-/]*)"],
    "ngay_thang": [r"Ngày tháng\s*:?\s*" + _DATE, r"Ngày\s*:?\s*" + _DATE],
    "trich_yeu_noi_dung": [r"Trích yếu nội dung\s*:\s*" + _LINE, r"Trích yếu\s*:\s*" + _LINE],
    "so_trang": [r"(\d+)\s*trang", r"Trang\s*:?\s*(\d+)"],
    "so_van_ban": [r"Số văn bản\s*:?\s*(\d[\w\-/]*)", r"Văn bản số\s*:?\s*(\d[\w\-/]*)",
                   r"Số\s*:\s*(\d[\w\-/]*)"],
    "ngay_ban_hanh": [r"Ngày ban hành\s*:?\s*" + _DATE, r"[Nn]gày\s+" + _DATE],
    "trich_yeu": [r"Trích yếu\s*:\s*" + _LINE, r"Nội dung\s*:\s*" + _LINE],
    "don_vi_ban_hanh": [r"Đơn vị ban hành\s*:\s*" + _LINE, r"Ban hành\s*:\s*" + _LINE],
    "nguoi_ky": [r"Người ký\s*:\s*" + _LINE, r"Ký\s*:\s*" + _LINE],
    "loai_van_ban": [r"Loại văn bản\s*:\s*" + _LINE],
}

_COMPILED: dict[str, list[re.Pattern]] = {
    name: [re.compile(p, re.IGNORECASE) for p in pats]
    for name, pats in PATTERNS.items()
}
_DATE_FALLBACK = re.compile(_DATE)
_NUM_FALLBACK = re.compile(r"(\d+)")


def detect_doc_type(url: str) -> str:
    """F1: basename-prefix classification (ocr_service.py:170-179)."""
    base = url.rsplit("/", 1)[-1].upper()
    if base.startswith("BIA"):
        return DOC_BIA
    if base.startswith("MUCLUC"):
        return DOC_MUCLUC
    return DOC_VANBAN


def _strip_span(text: str, start: int, end: int) -> tuple[str, int, int]:
    """Trim whitespace off a match span, keeping offsets consistent."""
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    return text[start:end], start, end


def extract_field(text: str, name: str, field_type: str) -> tuple[str, float, int, int]:
    """→ (value, confidence, start, end); start=end=-1 on miss."""
    for pat in _COMPILED.get(name, ()):
        m = pat.search(text)
        if m and m.group(1):
            value, s, e = _strip_span(text, m.start(1), m.end(1))
            if value:
                return value, 0.8, s, e
    if field_type == "DATE":
        m = _DATE_FALLBACK.search(text)
        if m:
            value, s, e = _strip_span(text, m.start(1), m.end(1))
            return value, 0.6, s, e
    elif field_type == "NUMERIC":
        m = _NUM_FALLBACK.search(text)
        if m:
            value, s, e = _strip_span(text, m.start(1), m.end(1))
            return value, 0.4, s, e
    return "", 0.0, -1, -1


def extract_spans(text: str, doc_type: str) -> tuple[list[dict], float]:
    """All registry fields for the doc type → (spans, overall_confidence)."""
    spans: list[dict] = []
    confs: list[float] = []
    for name, ftype, required in DOC_FIELDS.get(doc_type, DOC_FIELDS[DOC_VANBAN]):
        value, conf, s, e = extract_field(text, name, ftype)
        spans.append(
            {
                "name": name,
                "value": value,
                "field_type": ftype,
                "start": s,
                "end": e,
                "confidence": conf,
                "is_required": required,
            }
        )
        if conf > 0:
            confs.append(conf)
    overall = sum(confs) / len(confs) if confs else 0.0
    return spans, overall
