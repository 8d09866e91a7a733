"""Minimal MJPEG-in-AVI container codec (pure stdlib).

The video leg of the multimodal decode path: AVI is a RIFF container (the
same chunk grammar the WAV decoder walks) whose ``movi`` list carries one
``00dc``/``00db`` chunk per frame; in an MJPEG AVI each chunk is a complete
baseline JPEG, which `kernel.jpegmini.decode_jpeg` already parses. So a
container walk + the existing JPEG decoder = real video frame decode with
zero new entropy-coding machinery.

Scope (honest fence, like jpegmini): one video stream, MJPEG codec,
uncompressed index-free layout — the shape the encoder below emits plus any
straightforward MJPEG AVI. Other codecs (xvid/h264/...) raise
NotImplementedError: recognized, never faked. Corrupt containers raise
ValueError so decode consumers' error fences catch them.

Reference parity note: the reference treats video as an opaque media URL
(crawl4ai captures <video> sources, no decoding); this engine decodes the
one container its stdlib scope allows and fences the rest, mirroring the
PNG/WAV/JPEG policy.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG frame payloads -> a minimal but structurally standard MJPEG
    AVI: RIFF('AVI ') / LIST hdrl (avih + strl/strh MJPG) / LIST movi
    with one 00dc chunk per frame."""
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (HASINDEX off)
        len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )[:56]
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        fps, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of decoded frame arrays (via jpegmini).

    Raises ValueError for corrupt/non-AVI RIFF, NotImplementedError for
    non-MJPEG video streams (codec read from strh when present)."""
    from .jpegmini import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    try:
        payloads = _walk_avi(data)
    except struct.error as e:
        raise ValueError(f"corrupt AVI: {e}") from e
    if not payloads:
        raise ValueError("AVI has no video frames")
    return [decode_jpeg(p) for p in payloads]


def _walk_avi(data: bytes) -> list[bytes]:
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = min(body_start + length, end)
            if tag == b"LIST":
                list_type = data[body_start:body_start + 4]
                if list_type in (b"movi", b"hdrl", b"strl", b"rec "):
                    walk(body_start + 4, body_end)
            elif tag == b"strh":
                fcc_type = data[body_start:body_start + 4]
                codec = data[body_start + 4:body_start + 8]
                if fcc_type == b"vids" and codec not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"unsupported AVI video codec: {codec!r}"
                    )
            elif tag[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[body_start:body_end]))
            pos = body_start + length + (length & 1)

    walk(12, min(12 + struct.unpack("<I", data[4:8])[0] - 4, len(data)))
    return frames
