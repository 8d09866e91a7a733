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


def build_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Deterministic minimal PDF: one Helvetica text line per page.
    Valid enough for real viewers; primarily the parser's round-trip twin."""
    objs: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages)
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
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R "
            f"/MediaBox [0 0 612 792] >>".encode()
        )
        objs.append(
            b"<< " + filt + f"/Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF".encode()
    )
    return bytes(out)
