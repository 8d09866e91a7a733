"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media payloads exactly like html: opaque ``binary`` columns
with a typed metadata struct, flowing through Arrow-batched stages.

Decode is REAL for PNG (gray8/rgb8, all five scanline filters) and WAV
(PCM16) via the pure-stdlib codecs in `kernel/imagecodec.py` —
`decode_media_stats` parses actual bytes on executors and emits exact
integer statistics (dimensions, value sum/min/max), which the DuckDB gate
oracle recomputes from first principles (`q_image_decode`,
`q_audio_decode`). Formats a stdlib cannot honestly decode (jpeg, gif,
video) surface as `decoder='unsupported'` rows — never silently faked. The
byte-histogram stub (`_decode_image_stub`) remains as the
format-independent fallback feature and is itself exactly oracled
(`q_multimodal_features`).

What IS here:
- schema & plumbing: (media_id, kind, payload binary, meta struct)
- deterministic metadata sniffing (magic bytes -> format) — native exprs
- REAL PNG/WAV decode inside mapInPandas (Arrow batches in/out)
- batch-shaped feature extraction via mapInPandas
- frame sampling logic (which offsets to take) — pure arithmetic
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
    "pdf": b"%PDF",
}


def sniff_format(payload: Column) -> Column:
    """Container format from magic bytes — native substring comparisons.
    RIFF splits into 'avi' vs 'riff' (wav) at offset 8, like _sniff_bytes."""
    expr = F.lit("unknown")
    for name, magic in MAGIC.items():
        expr = F.when(
            F.substring(payload, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return F.when(
        (F.substring(payload, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(payload, 9, 4) == F.lit(b"AVI ")),
        F.lit("avi"),
    ).otherwise(expr)


def frame_sample_offsets(duration_s: Column, n_frames: int = 8) -> Column:
    """Deterministic frame-sample timestamps: n evenly spaced offsets."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (duration_s * (i + F.lit(0.5)) / F.lit(float(n_frames))).cast("double"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("decoder", StringType()),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'embedding': byte-histogram moments. A real
    deployment replaces this with PIL decode + model features; the Spark
    plumbing (batch shape, schema, partitioning) is identical.

    Raises NotImplementedError for payloads that claim real decoding needs
    (kept explicit so nobody mistakes the stub for a codec)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    h = hist.astype(np.float64)
    return h / max(1.0, h.sum())


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media(media_id long, payload binary) -> FEATURE_SCHEMA rows via
    mapInPandas (the real multimodal hot path shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, dim).tolist() for p in pdf["payload"]
            ]
            fmts = []
            for p in pdf["payload"]:
                fmt = "unknown"
                if p:
                    for name, magic in MAGIC.items():
                        if bytes(p[: len(magic)]) == magic:
                            fmt = name
                            break
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "n_bytes": [len(p) if p else 0 for p in pdf["payload"]],
                    "feature": feats,
                    "decoder": "stub-histogram",
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("decoder", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_values", LongType()),
        StructField("val_sum", LongType()),
        StructField("val_min", LongType()),
        StructField("val_max", LongType()),
    ]
)


def _sniff_bytes(p: bytes) -> str:
    if not p:
        return "unknown"
    # RIFF is a container family: AVI distinguishes from WAV at offset 8
    if bytes(p[:4]) == b"RIFF" and bytes(p[8:12]) == b"AVI ":
        return "avi"
    for name, magic in MAGIC.items():
        if bytes(p[: len(magic)]) == magic:
            return name
    return "unknown"


def decode_media_stats(media: DataFrame) -> DataFrame:
    """REAL decode path: parse PNG/WAV payload bytes on executors and emit
    exact integer statistics over the decoded values (pixels / samples).

    media(media_id long, payload binary) -> DECODE_SCHEMA. PNG, baseline
    JPEG, PCM16 WAV and MJPEG AVI (whole-video stats; per-frame rows live
    in :func:`video_frame_stats`) decode for real; anything else comes
    back decoder='unsupported' with null stats — explicit, never faked.
    """
    from ..kernel.avimini import decode_avi_mjpeg
    from ..kernel.imagecodec import decode_png, decode_wav
    from ..kernel.jpegmini import decode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt = _sniff_bytes(p)
                row = {
                    "media_id": mid, "format": fmt, "decoder": "unsupported",
                    "width": None, "height": None, "n_values": None,
                    "val_sum": None, "val_min": None, "val_max": None,
                }
                try:
                    if fmt == "png":
                        px = decode_png(bytes(p))
                        h, w = px.shape[:2]
                        v = px.astype(np.int64)
                        row.update(decoder="png-stdlib", width=w, height=h,
                                   n_values=int(v.size), val_sum=int(v.sum()),
                                   val_min=int(v.min()), val_max=int(v.max()))
                    elif fmt == "jpeg":
                        px = decode_jpeg(bytes(p))
                        h, w = px.shape[:2]
                        v = px.astype(np.int64)
                        row.update(decoder="jpeg-stdlib", width=w, height=h,
                                   n_values=int(v.size), val_sum=int(v.sum()),
                                   val_min=int(v.min()), val_max=int(v.max()))
                    elif fmt == "riff":
                        samples, rate = decode_wav(bytes(p))
                        v = samples.astype(np.int64)
                        row.update(decoder="wav-stdlib", width=rate, height=1,
                                   n_values=int(v.size), val_sum=int(v.sum()),
                                   val_min=int(v.min()), val_max=int(v.max()))
                    elif fmt == "avi":
                        frames = decode_avi_mjpeg(bytes(p))
                        v = np.concatenate(
                            [f.astype(np.int64).ravel() for f in frames]
                        )
                        fh, fw = frames[0].shape[:2]
                        # whole-video stats; per-frame rows live in
                        # video_frame_stats
                        row.update(decoder="avi-mjpeg-stdlib",
                                   width=fw, height=fh,
                                   n_values=int(v.size), val_sum=int(v.sum()),
                                   val_min=int(v.min()), val_max=int(v.max()))
                except NotImplementedError:
                    # honest fence: progressive/subsampled jpeg, exotic
                    # png color types — recognized but not decodable here
                    row["decoder"] = "unsupported"
                except (ValueError, EOFError):
                    row["decoder"] = "error"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(fn, DECODE_SCHEMA)


def synth_png_payloads(docs: DataFrame, id_col: str = "doc_id",
                       base_col: str | None = None,
                       bump: int = 0) -> DataFrame:
    """Deterministic grayscale PNG per row: w = 8 + base%5, h = 8 + base%3,
    pixel[i] = (base*37 + i*11 + 7) % 256 (row-major), where base defaults
    to the id itself; pass ``base_col`` (+ ``bump``) to mint NEAR-COPIES —
    a new media_id carrying the base id's pixels with pixel 0 bumped by
    ``bump`` (mod 256) — the planted near-duplicates of the image-dedup
    gates. Encoded with cycling scanline filters so the decode gate
    exercises Sub/Up/Average/Paeth too. The closed form lets the DuckDB
    oracle recompute every pixel via generate_series — an exact oracle
    over a REAL encode->decode round trip.
    """
    from ..kernel.imagecodec import encode_png
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    sel = [F.col(id_col).cast("long").alias("media_id"),
           F.col(base_col if base_col else id_col).cast("long").alias("base")]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, base in zip(pdf["media_id"], pdf["base"]):
                mid, base = int(mid), int(base)
                w, h = 8 + base % 5, 8 + base % 3
                i = np.arange(w * h, dtype=np.int64)
                px = (base * 37 + i * 11 + 7) % 256
                px[0] = (px[0] + bump) % 256
                px = px.astype(np.uint8).reshape(h, w)
                ids.append(mid)
                payloads.append(encode_png(px, filter_mode="cycle"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(*sel).mapInPandas(fn, out_schema)


def _ahash_of(px: "np.ndarray", grid_w: int, grid_h: int) -> int:
    """The exact-integer aHash bit rule over one decoded image — shared by
    image_ahash and the per-frame video hash. bit k = cy*grid_w + cx set
    when cell_sum * n_px > total_sum * cell_cnt (never a float mean)."""
    v = px.astype(np.int64)
    if v.ndim == 3:  # color: integer channel sum
        v = v.sum(axis=2)
    h, w = v.shape
    y, x = np.indices((h, w))
    cy, cx = y * grid_h // h, x * grid_w // w
    k = (cy * grid_w + cx).ravel()
    cell_sum = np.zeros(grid_w * grid_h, dtype=np.int64)
    np.add.at(cell_sum, k, v.ravel())
    cell_cnt = np.bincount(k, minlength=grid_w * grid_h)
    n_px, total = v.size, int(v.sum())
    bits = cell_sum * n_px > total * cell_cnt
    return int(sum(1 << i for i in np.flatnonzero(bits)))


AHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("format", StringType()),
    StructField("decoder", StringType()),
    StructField("ahash", LongType()),
])


def image_ahash(media: DataFrame, grid_w: int = 10,
                grid_h: int = 6) -> DataFrame:
    """Perceptual average-hash over DECODED pixels: downsample the image
    onto a grid_h x grid_w cell grid (pixel (x, y) -> cell
    (y*grid_h//h, x*grid_w//w)), set bit k = cy*grid_w + cx when the
    cell's mean intensity exceeds the image mean — the classic aHash,
    sized 60 bits by default so it shares :func:`dedup.hamming_neardup`'s
    60-bit banding (and the repo-wide bit conventions of simhash).

    The bit rule is EXACT integer arithmetic — bit = (cell_sum * n_px >
    total_sum * cell_cnt), never a float mean — so a SQL oracle working
    from closed-form pixels reproduces every bit. Intensity of a color
    pixel is the integer channel sum; cells that receive no pixels
    (image narrower than the grid) stay 0 on both sides of that rule.
    Undecodable payloads return ahash NULL with the honest decoder tag.

    Shape: one Arrow-batched pandas pass over (media_id, payload) — the
    image dimension distributes; everything downstream of the hash
    (banding, Hamming verify, clustering) is native and shuffles only on
    band blocks. The fingerprint is ~8 bytes/image: at 10^10 images the
    hash table is join-able the same way the minhash signature store is.
    """
    from ..kernel.imagecodec import decode_png
    from ..kernel.jpegmini import decode_jpeg

    if grid_w * grid_h > 63:
        raise ValueError("grid_w * grid_h must stay within a signed long")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt = _sniff_bytes(p)
                row = {"media_id": mid, "format": fmt,
                       "decoder": "unsupported", "ahash": None}
                try:
                    px = None
                    if fmt == "png":
                        px, row["decoder"] = decode_png(bytes(p)), "png-stdlib"
                    elif fmt == "jpeg":
                        px, row["decoder"] = decode_jpeg(bytes(p)), "jpeg-stdlib"
                    if px is not None:
                        row["ahash"] = _ahash_of(px, grid_w, grid_h)
                except NotImplementedError:
                    row["decoder"] = "unsupported"
                except (ValueError, EOFError):
                    row["decoder"] = "error"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(fn, AHASH_SCHEMA)


def synth_wav_payloads(docs: DataFrame, id_col: str = "doc_id",
                       base_col: str | None = None,
                       bump: int = 0) -> DataFrame:
    """Deterministic PCM16 WAV per row: n = 64 + base%50 samples,
    sample[i] = ((base*13 + i*7) % 65536) - 32768, rate 16000; base
    defaults to the id. Pass ``base_col`` (+ ``bump``, added to sample 0
    inside the mod) to mint planted near-copies, mirroring
    :func:`synth_png_payloads`."""
    from ..kernel.imagecodec import encode_wav
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    sel = [F.col(id_col).cast("long").alias("media_id"),
           F.col(base_col if base_col else id_col).cast("long").alias("base")]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, base in zip(pdf["media_id"], pdf["base"]):
                mid, base = int(mid), int(base)
                n = 64 + base % 50
                i = np.arange(n, dtype=np.int64)
                s = ((base * 13 + i * 7) % 65536) - 32768
                s[0] = ((base * 13 + bump) % 65536) - 32768
                s = s.astype(np.int16)
                ids.append(mid)
                payloads.append(encode_wav(s, 16000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(*sel).mapInPandas(fn, out_schema)


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("decoder", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_values", LongType()),
    StructField("val_sum", LongType()),
    StructField("val_min", LongType()),
    StructField("val_max", LongType()),
])


def video_frame_stats(media: DataFrame) -> DataFrame:
    """REAL video decode: parse MJPEG-AVI payloads on executors (RIFF walk
    + the from-scratch JPEG decoder — kernel/avimini.py) and emit exact
    per-frame pixel statistics: (media_id, decoder, frame_idx, width,
    height, n_values, val_sum, val_min, val_max).

    Non-MJPEG codecs come back as ONE row with decoder='unsupported'
    (recognized, never faked — the jpegmini/imagecodec policy); corrupt
    containers as decoder='error'; both with null frame stats. Frame
    arrays never leave the executor — only the stats rows do, so a video
    corpus distributes like any other binary column. Sampling offsets for
    long videos come from :func:`frame_sample_offsets` upstream."""
    from ..kernel.avimini import decode_avi_mjpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                nulls = {"frame_idx": None, "width": None, "height": None,
                         "n_values": None, "val_sum": None,
                         "val_min": None, "val_max": None}
                if _sniff_bytes(p) != "avi":
                    rows.append({"media_id": mid,
                                 "decoder": "unsupported", **nulls})
                    continue
                try:
                    frames = decode_avi_mjpeg(bytes(p))
                    for i, px in enumerate(frames):
                        v = px.astype(np.int64)
                        h, w = v.shape[:2]
                        rows.append({
                            "media_id": mid,
                            "decoder": "avi-mjpeg-stdlib",
                            "frame_idx": i, "width": w, "height": h,
                            "n_values": int(v.size),
                            "val_sum": int(v.sum()),
                            "val_min": int(v.min()),
                            "val_max": int(v.max()),
                        })
                except NotImplementedError:
                    rows.append({"media_id": mid,
                                 "decoder": "unsupported", **nulls})
                except (ValueError, EOFError):
                    rows.append({"media_id": mid,
                                 "decoder": "error", **nulls})
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        fn, VIDEO_FRAME_SCHEMA
    )


VIDEO_AHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("decoder", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("ahash", LongType()),
])


def video_ahash(media: DataFrame, grid_w: int = 10,
                grid_h: int = 6) -> DataFrame:
    """Per-frame perceptual hash of MJPEG-AVI payloads: decode each frame
    (kernel/avimini + jpegmini) and apply the SAME exact-integer aHash bit
    rule as :func:`image_ahash` — (media_id, decoder, frame_idx, ahash).
    Non-MJPEG / corrupt payloads yield one honest null-hash row.

    This is the video dedup signature: ~8 B per frame, joinable like the
    image hash table. Pair videos with :func:`video_neardup` (shared-frame
    containment) or run :func:`dedup.hamming_neardup` per frame for
    fuzzier matches."""
    from ..kernel.avimini import decode_avi_mjpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if _sniff_bytes(p) != "avi":
                    rows.append({"media_id": mid, "decoder": "unsupported",
                                 "frame_idx": None, "ahash": None})
                    continue
                try:
                    for i, px in enumerate(decode_avi_mjpeg(bytes(p))):
                        rows.append({
                            "media_id": mid,
                            "decoder": "avi-mjpeg-stdlib",
                            "frame_idx": i,
                            "ahash": _ahash_of(px, grid_w, grid_h),
                        })
                except NotImplementedError:
                    rows.append({"media_id": mid, "decoder": "unsupported",
                                 "frame_idx": None, "ahash": None})
                except (ValueError, EOFError):
                    rows.append({"media_id": mid, "decoder": "error",
                                 "frame_idx": None, "ahash": None})
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_AHASH_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        fn, VIDEO_AHASH_SCHEMA
    )


def video_neardup(frame_hashes: DataFrame, min_shared: int = 2,
                  min_frac: float = 0.5,
                  max_videos_per_hash: int = 50) -> DataFrame:
    """Video near-dup pairs from per-frame hashes (:func:`video_ahash`
    output): videos sharing >= ``min_shared`` distinct frame hashes
    covering >= ``min_frac`` of the SMALLER video's distinct frames —
    containment, so a clip fully contained in a longer video flags.
    Returns (id_a, id_b, shared, frac), id_a < id_b.

    Same bounded shape as :func:`linkgraph.mirror_hosts`: one distinct
    (video, hash), one groupBy(hash) building within-group pairs at the
    ARRAY level; hashes shared by more than ``max_videos_per_hash`` videos
    (black frames, title cards) drop FIRST, capping pair fan-out."""
    hf = (
        frame_hashes.where(F.col("ahash").isNotNull())
        .select(F.col("media_id").alias("vid"), F.col("ahash").alias("fp"))
        .distinct()
    )
    sizes = hf.groupBy("vid").agg(F.count(F.lit(1)).alias("n_frames"))
    grouped = hf.groupBy("fp").agg(F.collect_list("vid").alias("vids"))
    capped = grouped.where(
        (F.size("vids") <= max_videos_per_hash) & (F.size("vids") >= 2)
    )
    pairs = capped.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.array_sort("vids"),
                        lambda a: F.transform(
                            F.array_sort("vids"),
                            lambda b: F.struct(a.alias("id_a"),
                                               b.alias("id_b")),
                        ),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    shared = pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    sa = sizes.select(F.col("vid").alias("id_a"),
                      F.col("n_frames").alias("_na"))
    sb = sizes.select(F.col("vid").alias("id_b"),
                      F.col("n_frames").alias("_nb"))
    return (
        shared.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "frac",
            F.round(F.col("shared") / F.least("_na", "_nb") + 1e-9, 6),
        )
        .where((F.col("shared") >= min_shared)
               & (F.col("frac") >= min_frac))
        .select("id_a", "id_b", "shared", "frac")
    )


def synth_avi_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG AVI per row: 2 + id%3 frames of 16x24 pixels
    (2x3 constant 8x8 blocks), block k of frame f valued
    (id*31 + f*17 + k*7) % 256 — DC-only JPEG frames round-trip exactly,
    so the oracle recomputes every frame's pixel stats from the closed
    form via generate_series."""
    from ..kernel.avimini import encode_avi_mjpeg
    from ..kernel.jpegmini import encode_jpeg_flat_blocks
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n_frames = 2 + mid % 3
                frames = []
                for f in range(n_frames):
                    k = np.arange(6, dtype=np.int64)
                    blocks = ((mid * 31 + f * 17 + k * 7) % 256).astype(
                        np.uint8).reshape(2, 3)
                    frames.append(encode_jpeg_flat_blocks(blocks))
                ids.append(mid)
                payloads.append(encode_avi_mjpeg(frames, 24, 16))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        fn, out_schema
    )


def audio_ahash(media: DataFrame, n_windows: int = 60) -> DataFrame:
    """Perceptual average-hash over DECODED audio: split the sample stream
    into ``n_windows`` contiguous windows (sample i -> window
    i*n_windows//n), set bit k when the window's mean ENERGY (|sample|,
    integer) exceeds the clip mean — the audio twin of
    :func:`image_ahash`, sharing the same exact integer bit rule
    (win_sum * n_samples > total_sum * win_cnt) and the 60-bit
    :func:`dedup.hamming_neardup` banding. Robust to small edits (a few
    flipped samples move few window means); NOT pitch/time-shift
    invariant — that is a spectral fingerprint's job, which would slot in
    behind this same signature-table shape.

    Undecodable payloads return ahash NULL with the honest decoder tag;
    clips shorter than n_windows leave the empty windows' bits 0 on both
    sides of the rule.
    """
    from ..kernel.imagecodec import decode_wav

    if n_windows > 63:
        raise ValueError("n_windows must stay within a signed long")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt = _sniff_bytes(p)
                row = {"media_id": mid, "format": fmt,
                       "decoder": "unsupported", "ahash": None}
                try:
                    if fmt == "riff":
                        samples, _rate = decode_wav(bytes(p))
                        row["decoder"] = "wav-stdlib"
                        v = np.abs(samples.astype(np.int64))
                        n = v.size
                        if n:
                            k = np.arange(n) * n_windows // n
                            win_sum = np.zeros(n_windows, dtype=np.int64)
                            np.add.at(win_sum, k, v)
                            win_cnt = np.bincount(k, minlength=n_windows)
                            total = int(v.sum())
                            bits = win_sum * n > total * win_cnt
                            row["ahash"] = int(
                                sum(1 << i for i in np.flatnonzero(bits))
                            )
                        else:
                            row["ahash"] = 0
                except (ValueError, EOFError):
                    row["decoder"] = "error"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(fn, AHASH_SCHEMA)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Test/bench adapter: treat utf-8 text payloads as opaque media blobs."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def synth_jpeg_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic baseline JPEG per row from constant 8x8 blocks:
    by = 2 + id%2 block rows, bx = 2 + id%3 block cols,
    block value b(k) = (id*53 + k*17 + 5) % 256 (row-major block index).
    All-ones quant table + DC-only blocks => the decode is EXACT, so the
    DuckDB oracle recomputes every pixel stat from this closed form."""
    from ..kernel.jpegmini import encode_jpeg_flat_blocks
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                by, bx = 2 + mid % 2, 2 + mid % 3
                k = np.arange(by * bx, dtype=np.int64)
                blocks = ((mid * 53 + k * 17 + 5) % 256).astype(
                    np.uint8).reshape(by, bx)
                ids.append(mid)
                payloads.append(encode_jpeg_flat_blocks(blocks))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        fn, out_schema
    )


from pyspark.sql.types import BinaryType

RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("decoder", StringType()),
    StructField("src_width", IntegerType()),
    StructField("src_height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),
])


def _box_weights(src: int, dst: int) -> "np.ndarray":
    """Exact area-overlap weight matrix W[dst, src]: W[t, s] is the length
    of [t, t+1)*src/dst intersected with [s, s+1), normalized per row —
    the true box filter, fractional factors included."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float64)
    for t in range(dst):
        lo, hi = t * scale, (t + 1) * scale
        for s in range(int(np.floor(lo)), min(int(np.ceil(hi)), src)):
            w[t, s] = min(hi, s + 1) - max(lo, s)
    return w / w.sum(axis=1, keepdims=True)


def _nearest_idx(src: int, dst: int) -> "np.ndarray":
    return np.minimum(
        ((np.arange(dst) + 0.5) * src / dst).astype(np.int64), src - 1
    )


def image_resize(media: DataFrame, width: int, height: int,
                 method: str = "area") -> DataFrame:
    """REAL image resize over decoded pixels: PNG/JPEG payload -> decode
    (kernel codecs) -> resample to (width, height) -> re-encode PNG.
    The training-pipeline normalization step (every vision recipe resizes
    to a fixed input grid before feature extraction).

    method='area' is the exact box filter (area-overlap weights, correct
    for fractional factors, round-half-up to uint8) — the right
    downsampling filter; 'nearest' is index sampling (closed-form
    replicable, so the oracle gate can recompute every output pixel in
    SQL: q_image_resize). Gray and RGB both supported; JPEG decodes come
    back out as PNG (the engine's lossless interchange). Unsupported /
    corrupt payloads follow the decode_media_stats convention: decoder
    'unsupported'/'error', null payload — explicit, never faked.

    Scale shape: one Arrow-batched mapInPandas stage, embarrassingly
    parallel per image; output columns carry both geometries so a
    downstream audit never re-decodes.

    Reference parity: crawl4ai captures media as URLs + metadata only
    (media walk, content_scraping_strategy); pixel-level normalization is
    out of its scope — this is engine-side pipeline surface (task brief:
    decode / feature-extract / resize / frame-sample).
    """
    if method not in ("area", "nearest"):
        raise ValueError(f"unknown resize method {method!r}")
    from ..kernel.imagecodec import decode_png, encode_png
    from ..kernel.jpegmini import decode_jpeg

    tw, th = int(width), int(height)

    def resample(px: "np.ndarray") -> "np.ndarray":
        sh, sw = px.shape[:2]
        if method == "nearest":
            iy, ix = _nearest_idx(sh, th), _nearest_idx(sw, tw)
            return px[iy][:, ix]
        wy, wx = _box_weights(sh, th), _box_weights(sw, tw)
        p = px.astype(np.float64)
        if p.ndim == 2:
            out = wy @ p @ wx.T
        else:
            out = np.stack(
                [wy @ p[:, :, c] @ wx.T for c in range(p.shape[2])], axis=2
            )
        return np.floor(out + 0.5).astype(np.uint8)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                data = bytes(p) if p is not None else b""
                fmt = _sniff_bytes(data)
                try:
                    if fmt == "png":
                        px, dec = decode_png(data), "png-stdlib"
                    elif fmt == "jpeg":
                        px, dec = decode_jpeg(data), "jpeg-mini"
                    else:
                        rows.append((mid, "unsupported", None, None,
                                     tw, th, None))
                        continue
                except NotImplementedError:
                    # same fence as decode_media_stats: progressive /
                    # subsampled jpeg, exotic png color types
                    rows.append((mid, "unsupported", None, None,
                                 tw, th, None))
                    continue
                except (ValueError, EOFError):
                    rows.append((mid, "error", None, None, tw, th, None))
                    continue
                sh, sw = px.shape[:2]
                rows.append((mid, dec, sw, sh, tw, th,
                             encode_png(resample(px), filter_mode="none")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.select(
        F.col("media_id").cast("long").alias("media_id"), "payload"
    ).mapInPandas(fn, RESIZE_SCHEMA)
