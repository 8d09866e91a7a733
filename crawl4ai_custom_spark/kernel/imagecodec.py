"""Pure-stdlib media codecs: PNG (gray8 / rgb8, all 5 scanline filters) and
WAV (PCM16 RIFF).

The container has no PIL/ffmpeg, so the multimodal decode seam
(`operators/multimodal.py`) historically stubbed decoding. These codecs make
the decode path REAL for the two formats a stdlib can honestly handle:

- PNG: zlib (stdlib) inflate/deflate + the five PNG scanline filters
  (None/Sub/Up/Average/Paeth) implemented from the PNG spec (RFC 2083 §6).
  Decoder accepts bit-depth-8 color types 0 (grayscale) and 2 (RGB).
- WAV: RIFF/WAVE chunk walk + PCM16 little-endian samples (struct/numpy).

Reference parity note: crawl4ai ships no codec of its own (it shells out to
Playwright screenshots / external libs); this kernel exists for the
training-data-pipeline multimodal axis, where decode -> feature-extract must
run inside Arrow batches on executors. Encoders exist so tests and gate
queries can build payloads deterministically and verify exact round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec §6.6)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode (h, w) gray8 or (h, w, 3) rgb8 -> PNG bytes.

    filter_mode: 'none' (filter 0 every scanline) or 'cycle' (scanline r uses
    filter r % 5 — exercises every filter type so round-trip tests prove the
    decoder's filter reconstruction, not just the happy path).
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, bpp = 0, 1
        h, w = px.shape
        flat = px.reshape(h, w * 1)
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, bpp = 2, 3
        h, w = px.shape[:2]
        flat = px.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")

    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for r in range(h):
        line = flat[r]
        ft = 0 if filter_mode == "none" else r % 5
        left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]]) if flat.shape[1] > bpp else np.zeros_like(line)
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) if flat.shape[1] > bpp else np.zeros_like(line)
        if ft == 0:
            enc = line
        elif ft == 1:  # Sub
            enc = line - left
        elif ft == 2:  # Up
            enc = line - prev
        elif ft == 3:  # Average
            enc = line - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:  # Paeth
            enc = line - _paeth(left, prev, upleft)
        raw.append(ft)
        raw.extend(enc.tobytes())
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) gray8 or (h, w, 3) rgb8 array.

    Supports bit depth 8, color types 0 and 2, no interlace — the subset the
    encoder above emits plus any standard non-interlaced gray/RGB PNG.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    try:
        return _decode_png_body(data)
    except (zlib.error, struct.error) as e:
        # corrupt-but-recognized payloads surface as ValueError so every
        # decode consumer's error fence (decoder='error') catches them
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_body(data: bytes) -> np.ndarray:
    pos = 8
    w = h = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG: depth={depth} color={color_type} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    bpp = 1 if color_type == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = line + prev  # uint8 wraparound == mod-256 per spec
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth need the reconstructed left byte — sequential
            # within the scanline (all arithmetic in Python ints, masked to a
            # byte, to sidestep NumPy-2 out-of-range assignment errors).
            recl = [0] * stride
            linel = line.tolist()
            prevl = prev.tolist()
            for i in range(stride):
                a = recl[i - bpp] if i >= bpp else 0
                b = prevl[i]
                c = prevl[i - bpp] if i >= bpp else 0
                if ft == 1:
                    recl[i] = (linel[i] + a) & 0xFF
                elif ft == 3:
                    recl[i] = (linel[i] + ((a + b) // 2)) & 0xFF
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    recl[i] = (linel[i] + pred) & 0xFF
            rec = np.array(recl, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter type {ft}")
        out[r] = rec
        prev = rec
    return out.reshape(h, w) if color_type == 0 else out.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (int16 samples, sample_rate). Mono PCM16 only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    try:
        return _decode_wav_body(data)
    except struct.error as e:
        raise ValueError(f"corrupt WAV: {e}") from e


def _decode_wav_body(data: bytes) -> tuple[np.ndarray, int]:
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + length + (length & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate
