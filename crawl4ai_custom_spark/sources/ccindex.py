"""Common Crawl index ingestion: CDXJ / CC-index-API JSON lines -> typed
records -> a WARC byte-range fetch plan.

Reference parity: AsyncUrlSeeder's Common-Crawl discovery
(/root/reference/crawl4ai/async_url_seeder.py:733-744) queries
``index.commoncrawl.org/<collection>-index?...&output=json`` and
``json.loads`` one record per line. At engine scale the same data is the
collection's CDXJ index shards (``cdx-*.gz`` — one ``urlkey timestamp
{json}`` line per capture) or the columnar index; this module parses both
line framings natively (``spark.read.text`` decodes ``.gz`` transparently
by extension, one task per shard), so seeding a 10^10-url frontier from a
CC collection is a plain scan -> parse -> filter plan with no Python in
the loop.

The fetch plan output (url, warc_filename, warc_offset, warc_length) is
the contract the WARC side consumes: each row addresses one gzip member
inside a CC segment, the byte-range form of `sources/warc.py`'s
whole-segment ``parse_warc_records``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the CC index JSON payload: every field arrives as a string (the API and
# CDXJ both quote numbers); casts happen in cc_index_records
_JSON_FIELDS = [
    "urlkey", "timestamp", "url", "status", "mime", "mime-detected",
    "digest", "length", "offset", "filename", "languages", "encoding",
    "redirect",
]
CC_JSON_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in _JSON_FIELDS]
)


def cc_index_records(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse CC-index lines into typed records. Accepts BOTH framings in
    the same input: API ``output=json`` lines (the whole line is a JSON
    object) and CDXJ shard lines (``urlkey timestamp {json}`` — urlkey/
    timestamp live in the space-separated prefix, not the JSON). Garbage
    and blank lines drop (no JSON object -> no row; unparseable JSON ->
    from_json null -> dropped), mirroring parse_warc_records' tolerance.

    All native: instr/substring for the prefix split, one from_json, one
    to_timestamp — no Python, so a 300-shard collection parses as 300
    parallel scan tasks.
    """
    line = F.col(line_col)
    brace = F.instr(line, "{")
    pre = F.split(F.trim(F.substring(line, 1, brace - 1)), r"\s+")
    rec = F.from_json(F.substring(line, brace, F.length(line)),
                      CC_JSON_SCHEMA)
    out = (
        lines.where(brace > 0)
        .select(
            rec.alias("r"),
            F.when(F.size(pre) >= 1, pre.getItem(0)).alias("pk"),
            F.when(F.size(pre) >= 2, pre.getItem(1)).alias("pt"),
        )
        .where(F.col("r").isNotNull())
        .select(
            F.coalesce(F.col("r.urlkey"),
                       F.nullif(F.col("pk"), F.lit(""))).alias("urlkey"),
            F.coalesce(F.col("r.timestamp"),
                       F.nullif(F.col("pt"), F.lit("")))
            .alias("timestamp_raw"),
            F.col("r.url").alias("url"),
            F.col("r.status").cast("int").alias("status"),
            F.col("r.mime").alias("mime"),
            F.col("r.`mime-detected`").alias("mime_detected"),
            F.col("r.digest").alias("digest"),
            F.col("r.length").cast("long").alias("warc_length"),
            F.col("r.offset").cast("long").alias("warc_offset"),
            F.col("r.filename").alias("warc_filename"),
            F.col("r.languages").alias("languages"),
            F.col("r.encoding").alias("encoding"),
            F.col("r.redirect").alias("redirect"),
        )
        .withColumn(
            "capture_ts",
            F.to_timestamp("timestamp_raw", "yyyyMMddHHmmss"),
        )
    )
    return out.where(F.col("url").isNotNull())


def read_warc_ranges(plan: DataFrame, segments_root: str) -> DataFrame:
    """Execute a fetch plan against CC segment files: each row's
    (warc_filename, warc_offset, warc_length) slice is read by seek —
    one gzip member per slice in real CC segments. Returns
    (url, warc_filename, warc_offset, payload binary); pipe into
    `warc.parse_warc_records(..., gz=True)` to get records.

    Scale shape: the plan repartitions on warc_filename so ONE task owns
    each segment and reads its slices in offset order (sequential-ish
    I/O; on object storage this stage is where range GETs happen — the
    local seek/read here is the sandbox stand-in with the same per-task
    access pattern). The segment is never read whole — cost is
    sum(lengths), not sum(file sizes).
    """
    from collections.abc import Iterator

    import pandas as pd

    cols = ["url", "warc_filename", "warc_offset", "warc_length"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                pdf = pdf.sort_values(["warc_filename", "warc_offset"])
                rows = []
                for url, fname, off, ln in zip(
                    pdf["url"], pdf["warc_filename"],
                    pdf["warc_offset"], pdf["warc_length"],
                ):
                    path = os.path.join(segments_root, fname)
                    fh = handles.get(path)
                    if fh is None:
                        fh = handles[path] = open(path, "rb")
                    fh.seek(int(off))
                    rows.append((url, fname, int(off), fh.read(int(ln))))
                yield pd.DataFrame(
                    rows,
                    columns=["url", "warc_filename", "warc_offset",
                             "payload"],
                )
        finally:
            for fh in handles.values():
                fh.close()

    return (
        plan.select(*cols)
        .repartition("warc_filename")
        .mapInPandas(
            fn,
            "url string, warc_filename string, warc_offset long, "
            "payload binary",
        )
    )


def cc_index_fetch_plan(
    records: DataFrame,
    *,
    statuses: tuple[int, ...] = (200,),
    mime_prefixes: tuple[str, ...] = ("text/html",),
    latest_only: bool = True,
) -> DataFrame:
    """Records -> the byte-range fetch plan: keep wanted statuses/mimes,
    optionally collapse to the LATEST capture per urlkey (max_by over one
    groupBy — the same latest-capture semantics as sources/pages.py), and
    emit (urlkey, url, capture_ts, warc_filename, warc_offset,
    warc_length) sorted nowhere — ordering is the seeder's job.

    Scale shape: one filter pushed into the scan + at most ONE shuffle
    (the per-urlkey max_by); no window over the full index.
    """
    mime_ok = F.lit(False)
    for p in mime_prefixes:
        mime_ok = mime_ok | F.col("mime").startswith(p)
    flt = records.where(
        F.col("status").isin(list(statuses)) & mime_ok
        & F.col("warc_filename").isNotNull()
        & F.col("warc_offset").isNotNull()
        & F.col("warc_length").isNotNull()
    )
    cols = ["url", "capture_ts", "warc_filename", "warc_offset",
            "warc_length"]
    if not latest_only:
        return flt.select("urlkey", *cols)
    picked = flt.groupBy("urlkey").agg(
        F.max_by(F.struct(*cols), F.col("timestamp_raw")).alias("best"))
    return picked.select("urlkey", *[F.col(f"best.{c}").alias(c)
                                     for c in cols])
