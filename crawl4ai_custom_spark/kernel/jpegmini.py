"""Baseline JPEG decode (stdlib + numpy), plus a deterministic encoder for
the flat-block subset used by tests and oracle gates.

Reference parity: the reference's processors hand image bytes to Pillow;
this container has no image libs, so the multimodal operators
(operators/multimodal.py) previously surfaced jpeg as
``decoder='unsupported'``. This kernel turns the web's most common format
into real pixel stats for the honest subset:

  decode_jpeg   baseline DCT (SOF0), 8-bit, grayscale or 3-component
                4:4:4 (no chroma subsampling), single interleaved scan,
                no restart markers. Everything else (progressive SOF2,
                subsampled 4:2:0, arithmetic coding) still raises
                NotImplementedError — never silently faked.
  encode_jpeg_flat_blocks
                grayscale encoder for images whose 8x8 blocks are constant
                values with an all-ones quantization table: for such
                blocks the DCT has only a DC coefficient and the
                round-trip is EXACT, so a SQL oracle can recompute the
                decoded pixel stats from the generation parameters.

The bit-level entropy decode is pure Python (fine for fixture-scale
blocks); the IDCT is a vectorized numpy basis multiply.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard luminance Huffman tables (JPEG Annex K) as (bits, values)
_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT basis: block = C.T @ coef @ C
_C = np.array([
    [(math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
     * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, str]:
    """value -> bitstring, canonical JPEG code assignment."""
    out: dict[int, str] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[str, int]:
    return {v: k for k, v in _huff_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                else:
                    raise EOFError("marker inside entropy data")
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map the n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _read_huff(reader: _BitReader, table: dict[str, int]) -> int:
    code = ""
    for _ in range(16):
        code += str(reader.read_bit())
        if code in table:
            return table[code]
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array (h, w) grayscale or (h, w, 3) RGB.

    Supports SOF0, 8-bit, 1 or 3 components WITHOUT chroma subsampling,
    one interleaved scan, no restart intervals. Anything else raises
    NotImplementedError (progressive, 4:2:0, restarts) or ValueError
    (malformed stream)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_jpeg_body(data)
    except (struct.error, IndexError) as e:
        # truncated/corrupt streams surface as ValueError so every decode
        # consumer's error fence (decoder='error') catches them
        raise ValueError(f"corrupt JPEG: {e}") from e


def _decode_jpeg_body(data: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[str, int]] = {}
    frame = None          # (h, w, components)
    comps: list[dict] = []
    scan_data = None
    scan_comps: list[dict] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                            # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64)
                for i, z in enumerate(ZIGZAG):
                    q[z] = seg[p + 1 + i]
                qtables[tq] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:                    # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, sampling, tq = seg[6 + 3 * i:9 + 3 * i]
                hs, vs = sampling >> 4, sampling & 0x0F
                if (hs, vs) != (1, 1):
                    raise NotImplementedError("chroma subsampling")
                comps.append({"id": cid, "tq": tq})
            frame = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF 0x{marker:02x}")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append({**comp, "dc": tabs >> 4, "ac": tabs & 0x0F})
            scan_data = data[pos:]
            break
        # APPn/COM/other segments: skipped
    if frame is None or scan_data is None:
        raise ValueError("missing SOF/SOS")
    h, w, nc = frame
    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(nc)]
    reader = _BitReader(scan_data)
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for ci, sc in enumerate(scan_comps):
                coef = np.zeros(64)
                t = _read_huff(reader, htables[(0, sc["dc"])])
                diff = _extend(reader.receive(t), t)
                pred[ci] += diff
                coef[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _read_huff(reader, htables[(1, sc["ac"])])
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:              # EOB
                        break
                    if rs == 0xF0:              # ZRL
                        k += 16
                        continue
                    k += r
                    coef[ZIGZAG[k]] = _extend(reader.receive(s), s)
                    k += 1
                block = coef.reshape(8, 8) * qtables[sc["tq"]]
                px = _C.T @ block @ _C + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
    planes = [np.clip(np.round(p[:h, :w]), 0, 255) for p in planes]
    if nc == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# flat-block encoder (exact-round-trip subset)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, bitstr: str) -> None:
        for ch in bitstr:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write("1")                    # pad with 1s per spec


def encode_jpeg_flat_blocks(blocks: np.ndarray) -> bytes:
    """Grayscale baseline JPEG from an array of constant 8x8 blocks.

    ``blocks`` is (by, bx) uint8 — each entry becomes one 8x8 block of that
    exact value. The quantization table is all ones, so decode returns the
    input values EXACTLY (DC-only blocks; lossless round-trip by
    construction) — the property the oracle gate relies on."""
    blocks = np.asarray(blocks, dtype=np.int64)
    by, bx = blocks.shape
    h, w = by * 8, bx * 8
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    pred = 0
    for yb in range(by):
        for xb in range(bx):
            # orthonormal DCT of a constant block v: DC = 8*(v-128)
            dc = int(round(8 * (blocks[yb, xb] - 128)))
            diff = dc - pred
            pred = dc
            mag = abs(diff)
            t = mag.bit_length()
            wtr.write(dc_codes[t])
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                wtr.write(format(v, f"0{t}b"))
            wtr.write(ac_codes[0x00])          # EOB: all AC zero
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
              + bytes([0x01, 0x11, 0x00]))
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    )
    sos = seg(0xDA, bytes([1, 0x01, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(wtr.out)
            + b"\xff\xd9")


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """General grayscale baseline encoder (all-ones quant table): full DCT
    + zigzag run-length + Huffman. Near-lossless (quantization = rounding
    of DCT coefficients); exercises the decoder's AC path in tests."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.zeros((bh * 8, bw * 8))
    padded[:h, :w] = px
    if h < bh * 8:
        padded[h:, :w] = px[-1:, :]
    if w < bw * 8:
        padded[:, w:] = padded[:, w - 1:w]
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    pred = 0

    def put(codes, diff):
        mag = abs(diff)
        t = mag.bit_length()
        wtr.write(codes)
        return t

    for yb in range(bh):
        for xb in range(bw):
            block = padded[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128.0
            coef = np.round(_C @ block @ _C.T).astype(np.int64)
            zz = [int(coef.flat[z]) for z in ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            t = abs(diff).bit_length()
            wtr.write(dc_codes[t])
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                wtr.write(format(v, f"0{t}b"))
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run >= 16:
                    wtr.write(ac_codes[0xF0])
                    run -= 16
                s = abs(zz[k]).bit_length()
                wtr.write(ac_codes[(run << 4) | s])
                v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
                wtr.write(format(v, f"0{s}b"))
                run = 0
            if last_nz < 63:
                wtr.write(ac_codes[0x00])      # EOB
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
              + bytes([0x01, 0x11, 0x00]))
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    )
    sos = seg(0xDA, bytes([1, 0x01, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(wtr.out)
            + b"\xff\xd9")
