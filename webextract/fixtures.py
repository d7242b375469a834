"""Deterministic synthetic ``pages`` generator (tests + bench + bench scale).

No ``random`` at generation time: all content derives from splitmix64
mixing of the row index (FIXTURES.md convention; mirrors the reference's
hash-offset fixture trick, ocr-ai-service/test_handwriting.py:65,109, and
its canned mock document, ocr_service_mock.py:26-35).

Output schema = BASELINE.json input_hint (authoritative):
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Mix: ~76% HTML (boilerplate nav/footer/ads + main article with planted
Vietnamese field sentences), ~20% PDF (1-3 pages, 1-2 columns, half
FlateDecode), ~2% scanned (image-only) PDFs and ~2% raw image payloads
(the NEEDS_OCR classes — the reference's core OCR input,
test_handwriting.py:15-76 generates exactly these), ~1% malformed
payloads (error path). Hosts Zipf-skewed: host 0 owns ~30% of rows
(skew test, SURVEY.md §5.2#4).
"""

from __future__ import annotations

import datetime as dt
import zlib

MASK64 = (1 << 64) - 1

VOCAB = (
    "giấy tờ lưu trữ quốc gia hành chính quyết định thông tư nghị định "
    "văn phòng ủy ban nhân dân tỉnh thành phố huyện xã phường ban hành "
    "quản lý hồ sơ tài liệu điện tử số hóa bảo quản khai thác sử dụng "
    "regulation archive record administration document storage digital"
).split()

HOSTS = ["archive%02d.example.org" % i for i in range(40)]
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
# bump when generated content changes: cache keys (bench corpus) include it
CONTENT_VERSION = 3


def mix(i: int, salt: int = 0) -> int:
    """splitmix64 finalizer — the deterministic entropy source."""
    z = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def words(i: int, salt: int, n: int) -> str:
    return " ".join(VOCAB[mix(i, salt * 1000 + k) % len(VOCAB)] for k in range(n))


def _host(i: int) -> str:
    r = mix(i, 1)
    if r % 100 < 30:  # Zipf head: one hot host with ~30% of rows
        return HOSTS[0]
    return HOSTS[1 + r % 39]


def _doc_kind(i: int) -> str:
    r = mix(i, 2) % 100
    if r < 1:
        return "broken"
    if r < 21:
        return "pdf"
    # NEEDS_OCR classes carved from the html range so broken/pdf doc
    # assignments are stable across CONTENT_VERSION 2→3
    if r < 23:
        return "scanned"
    if r < 25:
        return "image"
    return "html"


def _prefix(i: int) -> str:
    return ("BIA", "MUCLUC", "VANBAN")[mix(i, 3) % 3]


def field_sentences(i: int, prefix: str) -> list[str]:
    """Planted field sentences matching webextract.fields.PATTERNS."""
    r = mix(i, 4)
    d1 = f"{1 + r % 28:02d}/{1 + (r >> 8) % 12:02d}/{2020 + (r >> 16) % 6}"
    d2 = f"{1 + (r >> 24) % 28:02d}/{1 + (r >> 32) % 12:02d}/{2020 + (r >> 40) % 6}"
    num = f"{2020 + r % 6}/VKTL-{r % 997:03d}"
    pages = 1 + mix(i, 5) % 200
    who = "Nguyễn Văn " + chr(ord("A") + mix(i, 6) % 26)
    unit = "Phòng Lưu trữ số " + str(1 + mix(i, 7) % 12)
    title = words(i, 8, 4 + mix(i, 9) % 5).capitalize()
    if prefix == "BIA":
        return [
            f"Số hồ sơ: {num}",
            f"Tiêu đề: {title}",
            f"Đơn vị lập hồ sơ: {unit}",
            "Thời hạn bảo quản: Vĩnh viễn" if r % 2 else "Thời hạn bảo quản: 20 năm",
            f"Ngày bắt đầu: {d1}",
            f"Ngày kết thúc: {d2}",
            f"Tổng số: {pages} trang",
            f"Ghi chú: {words(i, 10, 3)}",
        ]
    if prefix == "MUCLUC":
        # every ~7th MUCLUC doc embeds its date inside a token: patterns
        # and the boundary-anchored DATE entity both miss, the generic
        # DATE fallback (F8, conf 0.6) is the only arm that fires —
        # pins method='fallback' + a low-confidence span under goldens
        ngay_sent = (f"thoi gian x{d1} ghi nhan"
                     if mix(i, 91) % 7 == 0 else f"Ngày tháng: {d1}")
        return [
            f"Số thứ tự: {1 + r % 500}",
            f"Số ký hiệu: {num}",
            ngay_sent,
            f"Trích yếu nội dung: {title}",
            f"Trang: {pages}",
            f"Ghi chú: {words(i, 10, 3)}",
        ]
    # every ~5th VANBAN doc phrases its issue date so the regex patterns
    # miss but all three keywords land in one sentence: the keyword-
    # proximity arm (M8 analogue, sim 1.0 → conf 0.8) extracts the date —
    # pins method='proximity' + F10/F11 under goldens
    issue_sent = (f"xem ngày ban hành của văn bản ấy {d1} nhé"
                  if mix(i, 90) % 5 == 0 else f"Ngày ban hành: {d1}")
    return [
        f"Số văn bản: {num}",
        issue_sent,
        f"Trích yếu: {title}",
        f"Đơn vị ban hành: {unit}",
        f"Người ký: {who}",
        "Loại văn bản: Quyết định" if r % 2 else "Loại văn bản: Công văn",
        f"{pages} trang",
    ]


def _nav_links(i: int, salt: int, n: int) -> str:
    return "".join(
        f'<li><a href="/cat/{mix(i, salt + k) % 50}">{words(i, salt + k, 2)}</a></li>'
        for k in range(n)
    )


def gen_html(i: int, prefix: str) -> bytes:
    r = mix(i, 11)
    sents = field_sentences(i, prefix)
    paras = "".join(
        f"<p>{words(i, 20 + k, 18 + mix(i, 30 + k) % 25)}. {s}. "
        f"{words(i, 40 + k, 10 + mix(i, 50 + k) % 15)}.</p>"
        for k, s in enumerate(sents)
    )
    extra = "".join(
        f"<p>{words(i, 60 + k, 30 + mix(i, 70 + k) % 40)}.</p>"
        for k in range(2 + r % 4)
    )
    quoting = 'class="x"' if r % 3 == 0 else ("class='x'" if r % 3 == 1 else "class=x")
    entity_bits = "Ti&#234;u &#x111;&#7873; &amp; n&#7897;i dung &ndash; b&#7843;n sao&hellip;"
    maybe_pre = (
        f"<pre>so lieu   {mix(i, 80) % 10**6}\n  dong 2\t{mix(i, 81) % 10**6}</pre>"
        if r % 5 == 0
        else ""
    )
    maybe_quote = (
        f"<blockquote>{words(i, 82, 16)}.</blockquote>" if r % 7 == 0 else ""
    )
    html = (
        "<!DOCTYPE html>\n"
        f'<html lang="vi"><head><meta charset="utf-8"><title>{words(i, 12, 3)}</title>\n'
        "<style>body { color: #222; } .ad > a { display:none }</style>\n"
        f"<script>var x = '<p>not text</p>'; if (1 < 2) {{ x += {r % 100}; }}</script>\n"
        "</head><body>\n"
        f"<!-- page {i} generated fixture -->\n"
        f'<div id="nav"><ul>{_nav_links(i, 100, 8 + r % 5)}</ul></div>\n'
        f'<div {quoting}><a href="/home">Trang chủ</a> &gt; <a href="/ds">Danh sách</a></div>\n'
        f"<article>\n<h1>{words(i, 13, 5).capitalize()}</h1>\n"
        f"<h2>{entity_bits}</h2>\n"
        f"{paras}{maybe_pre}{maybe_quote}{extra}\n"
        "</article>\n"
        f'<div class="ad"><ul>{_nav_links(i, 200, 6 + r % 4)}</ul></div>\n'
        f"<div id=footer>{_nav_links(i, 300, 5)}<p>&copy; 2025 <a href=\"/\">archive</a></p></div>\n"
        "<img src=/x.png><br>\n"
        "</body></html>\n"
    )
    return html.encode("utf-8")


# ---------------------------------------------------------------- PDF writer


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(lines_by_col: list[list[str]]) -> bytes:
    """1-2 columns of 12pt lines, 14pt leading, top y=720."""
    parts = []
    for ci, lines in enumerate(lines_by_col):
        x = 72 if ci == 0 else 330
        parts.append(f"BT /F1 12 Tf 1 0 0 1 {x} 720 Tm")
        first = True
        for ln in lines:
            if not first:
                parts.append("0 -14 Td")
            parts.append(f"({_pdf_escape(ln)}) Tj")
            first = False
        parts.append("ET")
    return " ".join(parts).encode("latin-1")


def gen_pdf(i: int) -> bytes:
    """Minimal PDF 1.4 in the subset pdfrun.py parses. ASCII text only
    (WinAnsi); Vietnamese planted values appear without diacritics, so the
    NUMERIC/DATE fallbacks and 'N trang' patterns still exercise fields."""
    r = mix(i, 90)
    n_pages = 1 + r % 3
    use_flate = bool(r & 8)
    two_cols = bool(r & 16)
    objs: list[bytes] = []  # bodies; object id = index+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_id = add(b"placeholder")  # patched after kids known
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    kids = []
    d1 = f"{1 + r % 28:02d}/{1 + (r >> 8) % 12:02d}/{2020 + (r >> 16) % 6}"
    for p in range(n_pages):
        base = [
            f"Trang so {p + 1} cua tai lieu {i}",
            f"Ngay {d1}",
            f"{1 + mix(i, 91 + p) % 99} trang",
        ] + [
            " ".join(
                VOCAB[mix(i, 500 + p * 40 + k * 7 + w) % len(VOCAB)] for w in range(6)
            ).encode("ascii", "ignore").decode("ascii").strip() or "van ban"
            for k in range(4 + mix(i, 92 + p) % 5)
        ]
        if two_cols:
            half = (len(base) + 1) // 2
            cols = [base[:half], base[half:]]
        else:
            cols = [base]
        stream = _page_stream(cols)
        if use_flate:
            z = zlib.compress(stream)
            body = b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (len(z), z)
        else:
            body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        cid = add(body)
        pid = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>" % (font, cid)
        )
        kids.append(pid)
    objs[pages_id - 1] = (
        b"<< /Type /Pages /Kids [" + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % n_pages
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for oid, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, cat, xref_at)
    )
    return bytes(out)


def gen_scanned_pdf(i: int) -> bytes:
    """Image-only PDF (scanned document): structurally valid pages whose
    content streams draw image XObjects and carry ZERO text runs — the
    reference's core OCR input class (it rasterizes + OCRs these,
    ocr_service.py:41-54). pdfrun parses the page tree fine and yields
    empty page texts; the pipeline classifies the document
    status=NEEDS_OCR (oracle.parse_candidates pdf-raster arm)."""
    r = mix(i, 99)
    n_pages = 1 + r % 3
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_id = add(b"placeholder")
    # deterministic fake raster bytes: the parser never decodes image
    # streams (they are not page /Contents), so ASCII filler suffices
    fake = bytes(32 + mix(i, 100 + k) % 95 for k in range(64 + r % 128))
    img = add(
        b"<< /Type /XObject /Subtype /Image /Width 612 /Height 792 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceRGB /Length %d >>\n"
        b"stream\n%s\nendstream" % (len(fake), fake)
    )
    kids = []
    for _p in range(n_pages):
        stream = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
        cid = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                  % (len(stream), stream))
        pid = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im0 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (img, cid)
        )
        kids.append(pid)
    objs[pages_id - 1] = (
        b"<< /Type /Pages /Kids [" + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % n_pages
    )
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def gen_image(i: int) -> bytes:
    """Raw raster payload (JPEG or PNG magic + deterministic filler) —
    a crawl response whose body is an image, not markup. The pipeline
    classifies it status=NEEDS_OCR with the sniffed format."""
    r = mix(i, 101)
    body = bytes(mix(i, 102 + k) % 256 for k in range(256 + r % 512))
    if r % 2:
        return b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + body + b"\xff\xd9"
    return b"\x89PNG\r\n\x1a\n" + body


def gen_broken(i: int) -> bytes:
    r = mix(i, 95)
    if r % 2:
        return b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog garbage"  # no pages → FAILED
    return gen_pdf(i)[: 64 + r % 128]  # truncated pdf


def gen_page(i: int) -> tuple[str, dt.datetime, bytes, str, str]:
    """Row i of the pages table: (url, warc_ts, html, text, lang)."""
    kind = _doc_kind(i)
    prefix = _prefix(i)
    host = _host(i)
    ext = {"pdf": "pdf", "broken": "pdf", "scanned": "pdf",
           "image": "jpg"}.get(kind, "html")
    url = f"https://{host}/docs/{prefix}_{i:08d}.{ext}"
    ts = EPOCH + dt.timedelta(seconds=int(mix(i, 96) % (365 * 86400)))
    if kind == "pdf":
        payload = gen_pdf(i)
    elif kind == "broken":
        payload = gen_broken(i)
    elif kind == "scanned":
        payload = gen_scanned_pdf(i)
    elif kind == "image":
        payload = gen_image(i)
    else:
        payload = gen_html(i, prefix)
    noisy = words(i, 97, 30)  # raw-ish snapshot; pipeline must ignore it
    lang = "vi" if mix(i, 98) % 3 else "en"
    return url, ts, payload, noisy, lang


def gen_pages(n: int, start: int = 0):
    """Yield n deterministic rows starting at index ``start``."""
    for i in range(start, start + n):
        yield gen_page(i)


PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def write_pages_parquet(path: str, n: int, start: int = 0,
                        rows_per_group: int = 2000) -> None:
    """Materialize n rows as a parquet file (pyarrow; binary html column).
    Row-group size kept small so Spark can split the scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    buf: list[tuple] = []
    for row in gen_pages(n, start):
        buf.append(row)
        if len(buf) >= rows_per_group:
            writer.write_table(pa.Table.from_arrays(
                [pa.array(list(col)) for col in zip(*buf)], schema=schema))
            buf = []
    if buf:
        writer.write_table(pa.Table.from_arrays(
            [pa.array(list(col)) for col in zip(*buf)], schema=schema))
    writer.close()
