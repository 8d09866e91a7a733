"""WARC source: parse Common-Crawl-style WARC blobs into a records table.

The 100 TB input named by BASELINE.json is "a Common-Crawl-style table";
Common Crawl's native at-rest format is WARC (ISO 28500): concatenated
records, each `WARC/1.0\\r\\n` + headers + `\\r\\n\\r\\n` + Content-Length
payload bytes + `\\r\\n\\r\\n`. This source turns a table of WARC blobs
(one row per warc chunk/file, exactly how CC ships 1 GB segments) into the
(url, html, ...) pages table the rest of the engine consumes.

Reference parity: crawl4ai seeds FROM the Common Crawl index
(async_url_seeder.py) but never parses WARC itself; this closes the
ingestion gap for the pipeline axis.

Scale shape: one Arrow-batched mapInPandas stage, one task per WARC blob —
the natural CC parallelism (100k+ segment files per crawl). Header parsing
is byte-exact (Content-Length is BYTES of the payload; utf-8 decode happens
after slicing), gzip member concatenation tolerated via `gz=True`.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("record_index", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _parse_blob(blob: bytes) -> list[dict]:
    """Parse concatenated WARC records from one blob. Tolerant: skips
    garbage between records by scanning for the next version line."""
    out: list[dict] = []
    pos = 0
    idx = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(_CRLF2, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + len(_CRLF2)
            continue
        body_start = hdr_end + len(_CRLF2)
        body = blob[body_start : body_start + clen]
        out.append(
            {
                "record_index": idx,
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_length": clen,
                "payload": body.decode("utf-8", "replace"),
            }
        )
        idx += 1
        pos = body_start + clen
    return out


def _gunzip_members(data: bytes) -> bytes:
    """Decompress possibly-multi-member gzip (CC concatenates one member per
    record); plain data passes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.extend(d.decompress(data[pos:]))
        pos = len(data) - len(d.unused_data)
        if not d.eof:
            break
    return bytes(out)


def parse_warc_records(blobs: DataFrame, id_col: str = "blob_id",
                       payload_col: str = "payload",
                       gz: bool = False) -> DataFrame:
    """(blob_id, payload binary) -> RECORD_SCHEMA rows. One Arrow stage;
    one task per blob is the natural CC-segment parallelism."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(blob) if blob is not None else b""
                if gz:
                    data = _gunzip_members(data)
                for rec in _parse_blob(data):
                    rec["blob_id"] = bid
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    return blobs.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, RECORD_SCHEMA)


def warc_records_as_pages(records: DataFrame) -> DataFrame:
    """Adapter: response records -> the engine's pages-table shape."""
    return records.where(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"),
        F.encode("payload", "utf-8").alias("html"),
        F.col("warc_date").alias("warc_ts"),
    )


def wet_records_as_documents(records: DataFrame) -> DataFrame:
    """Adapter: WET conversion records (Common Crawl's extracted-text
    derivative — same ISO-28500 framing `parse_warc_records` already
    splits, WARC-Type `conversion`, payload = plain text) -> the
    documents-table shape (doc_id, url, text, warc_ts). doc_id is the
    url+date hash so re-ingesting a crawl is idempotent upstream of the
    dedup family."""
    return records.where(F.col("warc_type") == "conversion").select(
        F.xxhash64("target_uri", "warc_date").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").alias("text"),
        F.col("warc_date").alias("warc_ts"),
    )


def build_warc_blobs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", group_size: int = 20,
                     uri_prefix: str = "https://", source_col: str = "source"
                     ) -> DataFrame:
    """Deterministic WARC blobs from the documents table — NATIVE exprs all
    the way (collect_list per group + transform + concat), so the gate's
    oracle can state the expected parse output in closed form. One record
    per doc, `group_size` records per blob, records ordered by doc id."""
    rec = F.transform(
        F.sort_array(F.collect_list(F.struct(id_col, source_col, text_col))),
        lambda x: F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
            F.lit(uri_prefix), x[source_col], F.lit(".example.com/doc/"),
            x[id_col].cast("string"),
            F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
            F.octet_length(x[text_col]).cast("string"),
            F.lit("\r\n\r\n"), x[text_col], F.lit("\r\n\r\n"),
        ),
    )
    return (
        docs.groupBy((F.col(id_col) / group_size).cast("long").alias("blob_id"))
        .agg(F.encode(F.concat_ws("", rec), "utf-8").alias("payload"))
    )


def _warc_record_expr(url: Column, date: Column, payload: Column,
                      warc_type: str) -> Column:
    """One WARC/1.0 record as a string expression (Content-Length is the
    BYTE length of the utf-8 payload, matching _parse_blob's slicing)."""
    return F.concat(
        F.lit(f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "), date,
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.encode(payload, "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"),
    )


def warc_write(pages: DataFrame, n_blobs: int,
               url_col: str = "url", payload_col: str = "html",
               ts_col: str | None = "warc_ts",
               warc_type: str = "response",
               gz: bool = False) -> DataFrame:
    """The sink half of this source: pages -> (blob_id, payload binary)
    WARC segments that `parse_warc_records` (and any ISO 28500 reader)
    re-ingests byte-exactly. Reference parity: crawl4ai persists crawl
    output to SQLite/files (async_database.py); at engine scale the
    interoperable at-rest format for fetched pages IS Common Crawl's own —
    this makes the engine a CC-style *producer*, closing the loop with the
    reader above (crawl -> warc_write -> parse_warc_records -> pages is
    identity, see test_warc_roundtrip / q_warc_roundtrip).

    Layout: records are assigned to blobs by hash(url) % n_blobs and
    sorted by url within a blob, so the segment set is deterministic under
    any input partitioning. The caller sizes n_blobs for the target
    segment size (CC ships ~1 GB): records/blob = |pages|/n_blobs bounds
    the per-group buffer, and the build is ONE groupBy(blob_id) shuffle —
    no window, no driver assembly.

    Payload domain: utf-8 text (html/markdown). Binary payload columns are
    decoded as utf-8 first — the parser returns utf-8 text payloads, so
    non-utf8 media bytes do not round-trip through the STRING record
    builder; store those as parquet binary columns instead (multimodal.py).

    gz=True emits one gzip member per record (mtime=0 for determinism) —
    CC's .warc.gz framing, re-read with parse_warc_records(gz=True). The
    compression crossing is applyInPandas per blob group (same single
    shuffle).
    """
    from pyspark.sql.types import (
        BinaryType as _Bin,
        LongType as _Long,
        StructField as _SF,
        StructType as _ST,
    )

    payload = F.col(payload_col)
    if isinstance(pages.schema[payload_col].dataType, _Bin):
        payload = F.decode(payload, "utf-8")
    if ts_col is None:
        date = F.lit("2024-01-01T00:00:00Z")
    else:
        dt = pages.schema[ts_col].dataType.simpleString()
        date = (F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
                if dt.startswith("timestamp") else F.col(ts_col).cast("string"))

    rows = pages.select(
        F.pmod(F.xxhash64(url_col), F.lit(n_blobs)).alias("blob_id"),
        F.col(url_col).alias("_u"),
        _warc_record_expr(F.col(url_col), date, payload, warc_type)
        .alias("_rec"),
    )
    # a null url/payload/ts nulls the whole record expr: drop those rows
    # EXPLICITLY so both paths behave identically (previously the plain
    # path silently skipped them in concat_ws while gz crashed) — callers
    # wanting them must materialize a placeholder payload first
    rows = rows.where(F.col("_rec").isNotNull())
    if not gz:
        rec = F.transform(
            F.sort_array(F.collect_list(F.struct("_u", "_rec"))),
            lambda x: x["_rec"],
        )
        return rows.groupBy("blob_id").agg(
            F.encode(F.concat_ws("", rec), "utf-8").alias("payload")
        )

    import gzip as _gzip
    import io

    out_schema = _ST([_SF("blob_id", _Long()), _SF("payload", _Bin())])

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        # total order (url, record) with a stable sort: duplicate urls
        # (e.g. recrawl waves) must not make segment bytes partitioning-
        # dependent — mirrors the plain path's sort_array over the struct
        pdf = pdf.sort_values(["_u", "_rec"], kind="mergesort")
        buf = io.BytesIO()
        for rec in pdf["_rec"]:
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec.encode("utf-8"))
        return pd.DataFrame(
            {"blob_id": [int(pdf["blob_id"].iloc[0])],
             "payload": [buf.getvalue()]}
        )

    return rows.groupBy("blob_id").applyInPandas(assemble, out_schema)
