"""warc_write (the WARC sink) round-trips byte-exactly through
parse_warc_records, plain and gzip, and the segment layout is
deterministic under input partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_custom_spark.sources.warc import (
    parse_warc_records,
    warc_records_as_pages,
    warc_write,
)


def _pages(spark):
    rows = [
        (f"https://site{i % 3}.example.com/p/{i}",
         f"<html><body>doc {i} é中文 -- CRLF\r\nline two "
         f"{'x' * (i * 7 % 50)}</body></html>",
         f"2024-03-0{1 + i % 9}T0{i % 10}:00:00Z")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["url", "html", "warc_ts"])


def _roundtrip(spark, gz: bool):
    pages = _pages(spark)
    blobs = warc_write(pages, n_blobs=5, gz=gz)
    back = warc_records_as_pages(
        parse_warc_records(blobs, gz=gz)
    ).select("url", F.decode("html", "utf-8").alias("html"), "warc_ts")
    orig = {r["url"]: (r["html"], r["warc_ts"]) for r in pages.collect()}
    got = {r["url"]: (r["html"], r["warc_ts"]) for r in back.collect()}
    assert got == orig  # byte-exact payloads, urls, dates


def test_warc_roundtrip_plain(spark):
    _roundtrip(spark, gz=False)


def test_warc_roundtrip_gzip(spark):
    _roundtrip(spark, gz=True)


def test_warc_segments_deterministic(spark):
    """Same input under different partitionings -> identical segment
    bytes (hash-assigned blobs, url-sorted records, mtime-0 gzip) —
    including DUPLICATE urls with different payloads (recrawl waves),
    which need the (url, record) total order, not a url-only sort."""
    dup = spark.createDataFrame(
        [("https://site0.example.com/p/0", "older capture of page zero",
          "2024-02-01T00:00:00Z")],
        ["url", "html", "warc_ts"],
    )
    pages = _pages(spark).unionByName(dup)
    for gz in (False, True):
        a = {r["blob_id"]: bytes(r["payload"])
             for r in warc_write(pages.repartition(1), 5, gz=gz).collect()}
        b = {r["blob_id"]: bytes(r["payload"])
             for r in warc_write(pages.repartition(16), 5, gz=gz).collect()}
        assert a == b
        assert len(a) == 5


def test_warc_write_binary_and_timestamp_columns(spark):
    """Binary html + real timestamp ts_col: decoded/formatted correctly."""
    pages = _pages(spark).select(
        "url",
        F.encode("html", "utf-8").alias("html"),
        F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
    )
    recs = parse_warc_records(warc_write(pages, n_blobs=2))
    row = recs.where(
        F.col("target_uri") == "https://site0.example.com/p/0").first()
    assert row["payload"].startswith("<html><body>doc 0")
    assert row["warc_date"] == "2024-03-01T00:00:00Z"
    assert row["content_length"] == len(row["payload"].encode("utf-8"))


def test_warc_write_drops_null_records_on_both_paths(spark):
    """A null payload nulls the record expr; both paths drop the row
    explicitly (no crash, no silent asymmetry)."""
    pages = spark.createDataFrame(
        [("https://a.example.com/1", "page one", "2024-01-01T00:00:00Z"),
         ("https://a.example.com/2", None, "2024-01-01T00:00:00Z")],
        ["url", "html", "warc_ts"],
    )
    for gz in (False, True):
        recs = parse_warc_records(warc_write(pages, 1, gz=gz), gz=gz)
        urls = [r["target_uri"] for r in recs.collect()]
        assert urls == ["https://a.example.com/1"]
