"""Minimal from-scratch PDF text extraction (stdlib only).

Reference parity: processors/pdf/processor.py
(/root/reference/crawl4ai/processors/pdf/processor.py) extracts per-page
text/metadata with external PDF libs. This kernel covers the structural
subset a training-data pipeline meets most — text shown with Tj/TJ/' ops in
plain or FlateDecode content streams — using only re + zlib, so the Spark
stage (operators/pdf.py) runs everywhere. Encrypted, predictor-coded, or
image-only PDFs yield empty text (never a crash); a real deployment swaps
pdfminer into the same mapInPandas seam.

Also provides build_simple_pdf() — a deterministic single/multi-page PDF
writer used by tests and the oracle gate to round-trip the parser.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_TEXT_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_TJ_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s\w])")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i:i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < min(i + 4, len(s)) and s[j:j + 1].isdigit():
                    j += 1
                out.append(int(s[i + 1:j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return bytes(out)


def _stream_text(content: bytes) -> str:
    parts: list[bytes] = []
    for m in _TEXT_SHOW_RE.finditer(content):
        parts.append(_unescape(m.group(1)))
    for m in _TJ_ARRAY_RE.finditer(content):
        for s in _TJ_STR_RE.finditer(m.group(1)):
            parts.append(_unescape(s.group(1)))
    return b" ".join(p for p in parts if p).decode("latin-1", errors="replace")


def pdf_text(data: bytes) -> str:
    """All text shown by Tj/TJ/' operators, stream order, space-joined."""
    if not data or not data.startswith(b"%PDF"):
        return ""
    texts: list[str] = []
    for m in _STREAM_RE.finditer(data):
        hdr, body = m.group(1), m.group(2)
        if b"/FlateDecode" in hdr:
            # decompressobj tolerates the trailing newline before
            # 'endstream' — and zlib payloads may legitimately END in
            # 0x0a/0x0d bytes, so stripping them would corrupt the stream
            try:
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        t = _stream_text(body)
        if t:
            texts.append(t)
    return " ".join(texts)


def pdf_page_count(data: bytes) -> int:
    if not data or not data.startswith(b"%PDF"):
        return 0
    return len(_PAGE_RE.findall(data))


def build_simple_pdf(pages: list[str], compress: bool = True,
                     info: dict | None = None,
                     images_per_page: int = 0) -> bytes:
    """Deterministic minimal PDF: one Helvetica text line per page.
    Valid enough for real viewers; primarily the parser's round-trip twin.

    ``info`` adds a trailer /Info dict ({title, author, producer, created,
    modified} — dates as 'D:YYYYMMDDHHMMSS' strings); ``images_per_page``
    embeds that many tiny grayscale image XObjects per page."""
    objs: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages)
    ipp = int(images_per_page)
    img_base = 3 + 2 * n_pages  # image objects numbered after page/content
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(pages):
        content = f"BT /F1 12 Tf 72 720 Td ({esc(text)}) Tj ET".encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        res = ""
        if ipp:
            xo = " ".join(
                f"/Im{j} {img_base + i * ipp + j} 0 R" for j in range(ipp)
            )
            res = f"/Resources << /XObject << {xo} >> >> "
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R "
            f"{res}/MediaBox [0 0 612 792] >>".encode()
        )
        objs.append(
            b"<< " + filt + f"/Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream"
        )
    for i in range(n_pages):
        for j in range(ipp):
            px = bytes([(i * 31 + j * 7) & 0xFF] * 4)  # 2x2 gray pixels
            objs.append(
                b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                + f"/Length {len(px)} >>".encode()
                + b"\nstream\n" + px + b"\nendstream"
            )
    info_num = None
    if info:
        info_num = len(objs) + 1
        fields = {"title": "Title", "author": "Author",
                  "producer": "Producer", "created": "CreationDate",
                  "modified": "ModDate"}
        body = " ".join(
            f"/{pdf_key} ({esc(str(info[k]))})"
            for k, pdf_key in fields.items() if info.get(k) is not None
        )
        objs.append(f"<< {body} >>".encode("latin-1"))
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    trailer_info = f" /Info {info_num} 0 R" if info_num else ""
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{trailer_info} >>\n"
        f"startxref\n{xref_at}\n%%EOF".encode()
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Per-page structure + document metadata (reference PDFPage/PDFMetadata
# parity — processors/pdf/processor.py:25-49,204-233,415-437)
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\s*(.*?)\s*endobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+0\s+R")
_NAME_STR_RE = {
    key: re.compile(rb"/" + key + rb"\s*\(((?:[^()\\]|\\.)*)\)")
    for key in (b"Title", b"Author", b"Producer", b"CreationDate", b"ModDate")
}
_PDF_DATE_RE = re.compile(
    r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
)


def _pdf_date_iso(raw: str | None) -> str | None:
    """'D:20260115093000+00'00'' -> '2026-01-15T09:30:00' (reference
    _parse_pdf_date semantics, emitted as an ISO string)."""
    if not raw:
        return None
    m = _PDF_DATE_RE.match(raw)
    if not m:
        return None
    y, mo, d, h, mi, s = (m.group(i) or dflt for i, dflt in
                          ((1, "0000"), (2, "01"), (3, "01"),
                           (4, "00"), (5, "00"), (6, "00")))
    return f"{y}-{mo}-{d}T{h}:{mi}:{s}"


def _decode_stream(hdr: bytes, body: bytes) -> bytes:
    if b"/FlateDecode" in hdr:
        try:
            return zlib.decompressobj().decompress(body)
        except zlib.error:
            return b""
    return body


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def pdf_metadata(data: bytes) -> dict:
    """Document metadata: title/author/producer/created/modified/pages/
    encrypted/file_size — the reference PDFMetadata surface with dates as
    ISO strings (Arrow-friendly)."""
    out = {
        "title": None, "author": None, "producer": None,
        "created": None, "modified": None,
        "pages": pdf_page_count(data),
        "encrypted": b"/Encrypt" in data,
        "file_size": len(data) if data else 0,
    }
    if not data or not data.startswith(b"%PDF"):
        out["encrypted"] = False
        return out
    m = _INFO_RE.search(data)
    if m:
        objs = _objects(data)
        info = objs.get(int(m.group(1)), b"")
        vals = {}
        for key, rx in _NAME_STR_RE.items():
            s = rx.search(info)
            if s:
                vals[key.decode()] = _unescape(s.group(1)).decode(
                    "latin-1", errors="replace")
        out["title"] = vals.get("Title")
        out["author"] = vals.get("Author")
        out["producer"] = vals.get("Producer")
        out["created"] = _pdf_date_iso(vals.get("CreationDate"))
        out["modified"] = _pdf_date_iso(vals.get("ModDate"))
    return out


def pdf_pages(data: bytes) -> list[dict]:
    """Per-page structs: (page_number, text, n_images) — page objects
    resolved through /Contents refs, embedded images counted through the
    page's /Resources /XObject refs that resolve to /Subtype /Image
    objects. Pages appear in object order (the order build_simple_pdf and
    virtually all linear writers emit)."""
    if not data or not data.startswith(b"%PDF"):
        return []
    objs = _objects(data)
    image_objs = {
        n for n, body in objs.items()
        if b"/Subtype" in body and b"/Image" in body.split(b"stream", 1)[0]
    }
    pages: list[dict] = []
    for n in sorted(objs):
        body = objs[n]
        hdr = body.split(b"stream", 1)[0]
        if not _PAGE_RE.search(hdr):
            continue
        # text: every referenced /Contents stream, in ref order
        text_parts: list[str] = []
        cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+0\s+R)", hdr)
        if cm:
            for ref in _REF_RE.finditer(cm.group(1)):
                target = objs.get(int(ref.group(1)), b"")
                if b"stream" in target:
                    thdr, tbody = target.split(b"stream", 1)
                    tbody = tbody.lstrip(b"\r\n")
                    end = tbody.rfind(b"endstream")
                    if end >= 0:
                        tbody = tbody[:end].rstrip(b"\r\n")
                    t = _stream_text(_decode_stream(thdr, tbody))
                    if t:
                        text_parts.append(t)
        # images: XObject refs in the page's (inline) resources
        n_images = 0
        rm = re.search(rb"/XObject\s*<<([^>]*)>>", hdr)
        if rm:
            n_images = sum(
                1 for ref in _REF_RE.finditer(rm.group(1))
                if int(ref.group(1)) in image_objs
            )
        pages.append({
            "page_number": len(pages) + 1,
            "text": " ".join(text_parts),
            "n_images": n_images,
        })
    return pages
