"""Streaming emission, DFS mode, mega-host salting equivalence."""

import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.operators.frontier import CrawlConfig, FrontierEngine
from crawl4ai_custom_spark.operators.politeness import (
    PolitenessConfig,
    admit,
    empty_host_state,
)
from crawl4ai_custom_spark.streaming.emission import stream_crawl


@pytest.fixture(scope="module")
def pages_df(spark, site_dir):
    return spark.read.parquet(f"{site_dir}/pages.parquet")


def test_stream_crawl_emits_waves_incrementally(spark, pages_df, tmp_path):
    cfg = CrawlConfig(strategy="bfs", max_depth=2, max_pages=40,
                      politeness=PolitenessConfig(wave_seconds=1e9),
                      use_bloom=False, check_robots=False)
    eng = FrontierEngine(spark, pages_df, None, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    waves = []
    for k, df, run in stream_crawl(eng, ["https://mega.example-shop.com/"],
                                   max_total_waves=6):
        waves.append((k, df.count()))
    assert len(waves) >= 2
    assert waves[0][1] >= 1
    total_streamed = sum(n for _, n in waves)
    # streamed union equals the final results table
    assert total_streamed == run.results(spark).count()
    assert run.pages_crawled <= cfg.max_pages


def test_dfs_mode_goes_deep_first(spark, pages_df, tmp_path):
    # tight per-host budget (wave_seconds/base_delay = 2 pops per host per
    # wave) so the batched LIFO prefix still exhibits depth-first descent
    cfg = CrawlConfig(strategy="dfs", max_depth=3, max_pages=12,
                      politeness=PolitenessConfig(base_delay=2.0,
                                                  wave_seconds=4.0),
                      use_bloom=False, check_robots=False)
    eng = FrontierEngine(spark, pages_df, None, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    run = eng.run(["https://mega.example-shop.com/"])
    adm = run.admitted_log(spark).orderBy("wave", "order_in_wave").collect()
    # batched LIFO: within every wave the admitted rows are EXACTLY the
    # stack prefix in pop order (depth DESC, discovery DESC, link_pos ASC)
    from itertools import groupby
    for wave, rows in groupby(adm, key=lambda r: r["wave"]):
        rows = list(rows)
        key = lambda r: (-r["depth"], -r["discovered_wave"], r["link_pos"],
                         r["url_canon"])
        assert rows == sorted(rows, key=key), f"pop order broken in wave {wave}"
        assert [r["order_in_wave"] for r in rows] == list(range(1, len(rows) + 1))
    depths = [r["depth"] for r in adm]
    # LIFO: the crawl descends to depth 3 while depth-1 candidates (the
    # seed's own links, run.stats[0]) are still uncrawled — a BFS would
    # finish every depth-1 page before touching depth 2
    first_d3 = next((i for i, d in enumerate(depths) if d == 3), None)
    assert first_d3 is not None
    n_d1_crawled = sum(1 for d in depths if d == 1)
    assert n_d1_crawled < run.stats[0]["new_links"]
    assert run.pages_crawled == len(depths) <= cfg.max_pages


def test_dfs_batched_admission_shrinks_waves(spark, pages_df, tmp_path):
    """With an unconstrained politeness budget the whole stack is one
    admissible prefix, so the crawl needs ~max_depth waves, not ~max_pages
    (>= 5x fewer than the old one-url-per-wave sequential mode)."""
    cfg = CrawlConfig(strategy="dfs", max_depth=3, max_pages=40,
                      politeness=PolitenessConfig(wave_seconds=1e9),
                      use_bloom=False, check_robots=False)
    eng = FrontierEngine(spark, pages_df, None, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    run = eng.run(["https://mega.example-shop.com/"])
    assert run.pages_crawled > 5
    assert run.waves * 5 <= run.pages_crawled


def test_salted_admission_equals_unsalted(spark):
    # zipf frontier: mega-host with 500 urls, small hosts with 10
    rows = [(f"https://mega.com/p{i:04d}", "mega.com", 1, float(i % 97))
            for i in range(500)]
    for d in range(5):
        rows += [(f"https://small{d}.com/p{i}", f"small{d}.com", 1, float(i))
                 for i in range(10)]
    fr = spark.createDataFrame(
        rows, ["url_canon", "registrable_domain", "depth", "score"]
    )
    cfg_plain = PolitenessConfig(base_delay=2.0, wave_seconds=20.0)  # budget 10
    cfg_salted = PolitenessConfig(base_delay=2.0, wave_seconds=20.0,
                                  salt_partitions=8)
    plain = {r["url_canon"] for r in
             admit(fr, empty_host_state(spark), cfg_plain).collect()}
    salted = {r["url_canon"] for r in
              admit(fr, empty_host_state(spark), cfg_salted).collect()}
    # two-stage salted top-k is EXACT: same admitted set as the plain window
    assert salted == plain
    per_dom = (
        admit(fr, empty_host_state(spark), cfg_salted)
        .groupBy("registrable_domain").count().collect()
    )
    assert all(r["count"] <= 10 for r in per_dom)


def test_sitemap_recursion_and_gzip(spark):
    import gzip

    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.sources.sitemap import (
        decompress_sitemaps,
        sitemap_page_urls,
    )

    idx = ("<sitemapindex><sitemap><loc> https://a.com/s1.xml </loc></sitemap>"
           "<sitemap><loc>https://a.com/s2.xml.gz</loc></sitemap></sitemapindex>")
    s1 = "<urlset><url><loc>https://a.com/p1</loc></url></urlset>"
    s2 = ("<urlset><url><loc>https://a.com/p2</loc></url>"
          "<url><loc>https://a.com/p3</loc></url></urlset>")
    raw = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", bytearray(idx.encode())),
            ("https://a.com/s1.xml", bytearray(s1.encode())),
            ("https://a.com/s2.xml.gz", bytearray(gzip.compress(s2.encode()))),
        ],
        ["url", "payload"],
    )
    sm = decompress_sitemaps(raw)
    out = sitemap_page_urls(sm)
    rows = {(r["sitemap_url"], r["loc"]) for r in out.collect()}
    assert rows == {
        ("https://a.com/s1.xml", "https://a.com/p1"),
        ("https://a.com/s2.xml.gz", "https://a.com/p2"),
        ("https://a.com/s2.xml.gz", "https://a.com/p3"),
    }
    # self-referential index must not loop (cycle guard)
    cyc = spark.createDataFrame(
        [("https://c.com/s.xml",
          "<sitemapindex><sitemap><loc>https://c.com/s.xml</loc></sitemap>"
          "</sitemapindex>")],
        ["url", "xml"],
    )
    assert sitemap_page_urls(
        cyc, roots=cyc.select(F.col("url"))
    ).count() == 0


def test_sitemap_entries_and_revisit_candidates(spark):
    """Entry metadata (lastmod/changefreq/priority) parses field-by-field
    with nulls for omissions; lastmod postdating the stored capture
    nominates exactly the stale url for re-crawl."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.recrawl import (
        sitemap_revisit_candidates,
    )
    from crawl4ai_custom_spark.sources.sitemap import sitemap_page_entries

    xml = (
        "<urlset>"
        "<url><loc>https://a.com/p1</loc><lastmod>2026-02-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.com/p2</loc></url>"
        "<url><loc>https://a.com/p3</loc><lastmod>not-a-date</lastmod></url>"
        "</urlset>"
    )
    sm = spark.createDataFrame([("https://a.com/s.xml", xml)], ["url", "xml"])
    out = {r["loc"]: r for r in sitemap_page_entries(sm).collect()}
    assert out["https://a.com/p1"]["lastmod"] == "2026-02-01"
    assert out["https://a.com/p1"]["lastmod_ts"] == dt.datetime(2026, 2, 1)
    assert out["https://a.com/p1"]["changefreq"] == "daily"
    assert out["https://a.com/p1"]["priority"] == 0.8
    assert out["https://a.com/p2"]["lastmod"] is None
    assert out["https://a.com/p2"]["priority"] is None
    # unparseable lastmod: raw string kept, timestamp honestly null
    assert out["https://a.com/p3"]["lastmod"] == "not-a-date"
    assert out["https://a.com/p3"]["lastmod_ts"] is None

    crawled = spark.createDataFrame(
        [("https://a.com/p1", dt.datetime(2026, 1, 1)),   # stale: lastmod after
         ("https://a.com/p2", dt.datetime(2026, 1, 1)),   # no lastmod: never
         ("https://a.com/p4", dt.datetime(2026, 1, 1))],  # not in sitemap
        ["url", "fetch_time"],
    )
    cand = sitemap_revisit_candidates(sitemap_page_entries(sm), crawled)
    assert [r["url"] for r in cand.collect()] == ["https://a.com/p1"]
    # fresh capture: nothing nominated
    fresh = crawled.withColumn(
        "fetch_time", F.lit(dt.datetime(2026, 3, 1))
    )
    assert sitemap_revisit_candidates(
        sitemap_page_entries(sm), fresh
    ).count() == 0


def test_feed_entries_rss_and_atom(spark):
    """RSS items and Atom entries extract in one pass; RFC-822 pubDate
    (weekday optional, wrong weekday tolerated) and ISO updated both
    parse; dirty dates keep the raw string with a null timestamp."""
    import datetime as dt

    from crawl4ai_custom_spark.sources.feed import feed_entries

    rss = (
        "<rss><channel>"
        "<item><title>one</title><link>https://a.com/1</link>"
        "<pubDate>Mon, 05 Jan 2026 04:00:00 GMT</pubDate></item>"
        # wrong weekday (Jan 6 2026 is a Tuesday... producers get this
        # wrong constantly) — must still parse
        "<item><title>two</title><link>https://a.com/2</link>"
        "<pubDate>Fri, 06 Jan 2026 05:00:00 GMT</pubDate></item>"
        "<item><title>bad</title><link>https://a.com/3</link>"
        "<pubDate>yesterday-ish</pubDate></item>"
        "<item><title>nolink</title></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<entry><title>three</title>"
        '<link href="https://b.com/3"/>'
        "<updated>2026-01-07T06:00:00Z</updated></entry>"
        "</feed>"
    )
    feeds = spark.createDataFrame(
        [("https://a.com/rss.xml", rss), ("https://b.com/atom.xml", atom)],
        ["url", "xml"],
    )
    out = {r["loc"]: r for r in feed_entries(feeds).collect()}
    assert set(out) == {"https://a.com/1", "https://a.com/2",
                        "https://a.com/3", "https://b.com/3"}
    assert out["https://a.com/1"]["published_ts"] == dt.datetime(2026, 1, 5, 4)
    assert out["https://a.com/2"]["published_ts"] == dt.datetime(2026, 1, 6, 5)
    assert out["https://a.com/3"]["published"] == "yesterday-ish"
    assert out["https://a.com/3"]["published_ts"] is None
    assert out["https://b.com/3"]["published_ts"] == dt.datetime(2026, 1, 7, 6)
    assert out["https://b.com/3"]["title"] == "three"


def test_structured_streaming_hourly_matches_batch(spark, tmp_path):
    """readStream + watermark + windowed agg drained with AvailableNow must
    equal the batch aggregation over the same files."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.streaming.structured import (
        read_events_stream,
        run_available_now,
        stream_events_hourly,
    )

    import shutil

    src_dir = str(tmp_path / "events_src")
    import os as _os
    _os.makedirs(src_dir, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                _os.path.join(src_dir, "part-0.parquet"))
    src = src_dir
    stream = read_events_stream(spark, src)
    run_available_now(
        stream_events_hourly(stream), "hourly_stream",
        str(tmp_path / "ckpt1"), output_mode="complete",
    )
    got = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("select * from hourly_stream").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )
    want = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["avg_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 10


def test_structured_streaming_sessionize_state(spark, tmp_path):
    """applyInPandasWithState session counts must match the batch gap rule."""
    from pyspark.sql import functions as F, Window

    from crawl4ai_custom_spark.streaming.structured import (
        read_events_stream,
        run_available_now,
        stream_sessionize,
    )

    import os as _os
    import shutil

    src = str(tmp_path / "events_src")
    _os.makedirs(src, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                _os.path.join(src, "part-0.parquet"))
    stream = read_events_stream(spark, src)
    run_available_now(
        stream_sessionize(stream), "sess_stream",
        str(tmp_path / "ckpt2"), output_mode="update",
    )
    got = {
        r["user_id"]: r["n_sessions"]
        for r in spark.sql("select * from sess_stream").collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.expr("timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', ts)")
    batch = (
        spark.read.parquet(src).withColumn("sec", sec)
        .withColumn("gap", F.col("sec") - F.lag("sec").over(w))
        .withColumn("new", F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0))
        .groupBy("user_id").agg(F.sum("new").alias("n_sessions"))
    )
    want = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert got == want and len(got) > 5


def test_warc_parse_gzip_garbage_and_pages_adapter(spark):
    """WARC parser: multi-member gzip blobs, garbage between records,
    non-response records filtered by the pages adapter."""
    import gzip

    from crawl4ai_custom_spark.sources.warc import (
        parse_warc_records,
        warc_records_as_pages,
    )

    def rec(uri, body, wtype="response"):
        b = body.encode()
        return (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(b)}\r\n\r\n"
        ).encode() + b + b"\r\n\r\n"

    plain = (
        rec("https://a.com/1", "hello <b>world</b>")
        + b"JUNK BYTES BETWEEN RECORDS"
        + rec("https://a.com/meta", "metadata", wtype="warcinfo")
        + rec("https://a.com/2", "body with WARC/1.0 inside and \r\n\r\n too")
    )
    # two gzip members concatenated, like CC's per-record gz framing
    gz = gzip.compress(rec("https://gz.com/1", "gz one")) + gzip.compress(
        rec("https://gz.com/2", "gz two")
    )
    df = spark.createDataFrame(
        [(1, bytearray(plain))], ["blob_id", "payload"]
    )
    out = parse_warc_records(df).collect()
    assert [r["target_uri"] for r in out] == [
        "https://a.com/1", "https://a.com/meta", "https://a.com/2"
    ]
    assert out[2]["payload"] == "body with WARC/1.0 inside and \r\n\r\n too"
    assert out[0]["record_index"] == 0 and out[2]["record_index"] == 2

    gzdf = spark.createDataFrame([(2, bytearray(gz))], ["blob_id", "payload"])
    gzout = parse_warc_records(gzdf, gz=True).collect()
    assert [r["payload"] for r in gzout] == ["gz one", "gz two"]

    pages = warc_records_as_pages(parse_warc_records(df)).collect()
    assert len(pages) == 2  # warcinfo record dropped
    assert {r["url"] for r in pages} == {"https://a.com/1", "https://a.com/2"}
    assert bytes(pages[0]["html"]).decode() in (
        "hello <b>world</b>", "body with WARC/1.0 inside and \r\n\r\n too"
    )


def test_structured_streaming_extraction_matches_batch(spark, site_dir, tmp_path):
    """The streaming ingestion path (readStream -> extract mapInPandas)
    yields byte-identical rows to the batch extraction of the same files."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.extraction import extract_pages
    from crawl4ai_custom_spark.streaming.structured import (
        read_pages_stream,
        run_available_now,
        stream_extract_pages,
    )

    src = spark.read.parquet(
        site_dir + "/pages.parquet"
    ).select("url", "warc_ts", "html").limit(60)
    pdir = str(tmp_path / "pages_stream")
    # two separate files -> two micro-batch inputs
    src.where(F.crc32("url") % 2 == 0).coalesce(1).write.mode(
        "overwrite").parquet(pdir)
    src.where(F.crc32("url") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(pdir)

    stream = stream_extract_pages(read_pages_stream(spark, pdir))
    run_available_now(stream, "stream_extract_out",
                      str(tmp_path / "ckpt"), output_mode="append")
    got = {
        (r["url"], r["text"], r["raw_markdown"])
        for r in spark.sql("select * from stream_extract_out").collect()
    }
    want = {
        (r["url"], r["text"], r["raw_markdown"])
        for r in extract_pages(
            spark.read.parquet(pdir).select("url", "html")
        ).collect()
    }
    assert got == want and len(got) == 60


def test_structured_streaming_quality_packs_match_batch(spark, tmp_path):
    """The Gopher/C4 rule packs are stateless projections, so they run
    unchanged over readStream micro-batches and agree with batch exactly."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.textstats import (
        c4_quality_filter,
        gopher_quality_filter,
    )
    from crawl4ai_custom_spark.streaming.structured import run_available_now

    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("The measured value of run "), F.col("id"),
            F.lit(" is recorded here. Another line with that result "
                  "follows now.\nclick here"),
        ).alias("text"),
    )
    ddir = str(tmp_path / "docs_stream")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite").parquet(ddir)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(ddir)

    stream_in = spark.readStream.schema("doc_id long, text string").parquet(ddir)
    stream = c4_quality_filter(gopher_quality_filter(stream_in))
    run_available_now(stream, "stream_quality_out",
                      str(tmp_path / "qckpt"), output_mode="append")
    got = {tuple(r) for r in spark.sql(
        "select doc_id, gopher_keep, c4_keep, n_lines_kept, stop_hits "
        "from stream_quality_out").collect()}
    want = {tuple(r) for r in c4_quality_filter(
        gopher_quality_filter(spark.read.parquet(ddir))
    ).select("doc_id", "gopher_keep", "c4_keep", "n_lines_kept",
             "stop_hits").collect()}
    assert got == want and len(got) == 120


def test_streaming_ingest_dedup_matches_sequential_batches(spark, tmp_path):
    """The foreachBatch ingest loop (incremental dedup vs the parquet
    signature store) admits exactly the docs a sequential batch loop over
    the same files admits — and the store ends up with one signature per
    admitted doc. Duplicates are arranged within-batch or vs the pre-seeded
    store, so the expected set is trigger-order independent."""
    from crawl4ai_custom_spark.operators.dedup import (
        minhash_signatures,
        shingle_table,
    )
    from crawl4ai_custom_spark.streaming.ingest import (
        SignatureStore,
        ingest_batch,
        read_docs_stream,
        stream_ingest_dedup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely different content about spark dataframes and shuffles"),
        ],
        ["doc_id", "text"],
    )
    base_sigs = minhash_signatures(shingle_table(corpus), 16, 1)

    batch_a = [
        # exact dup of corpus doc 1 -> rejected
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        # novel
        (11, "watermarks bound state for late arriving events in streams"),
        # within-batch dup of 11 -> rejected, 11 kept
        (12, "watermarks bound state for late arriving events in streams"),
    ]
    batch_b = [
        # novel
        (20, "broadcast joins avoid shuffling the large fact table entirely"),
        # exact dup of corpus doc 2 -> rejected
        (21, "completely different content about spark dataframes and shuffles"),
    ]

    ddir = str(tmp_path / "docs_in")
    spark.createDataFrame(batch_a, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite").parquet(ddir)
    spark.createDataFrame(batch_b, ["doc_id", "text"]).coalesce(1).write.mode(
        "append").parquet(ddir)

    # ---- streaming run --------------------------------------------------
    s_store_root = str(tmp_path / "s_store")
    s_out = str(tmp_path / "s_out")
    store = SignatureStore(spark, s_store_root, num_hashes=16, bands=4)
    store.append(base_sigs, epoch=-1)  # pre-seed: the existing corpus
    q = stream_ingest_dedup(
        read_docs_stream(spark, ddir, max_files_per_trigger=1),
        s_store_root, s_out, str(tmp_path / "s_ckpt"),
        num_hashes=16, bands=4, est_threshold=0.9,
    )
    q.awaitTermination()

    got = {r["doc_id"] for r in spark.read.parquet(f"{s_out}/epoch=*").collect()}
    assert got == {11, 20}
    # store = corpus + admitted signatures, nothing else (the streaming
    # sink appended through ITS OWN store instance — refresh this reader's
    # manifest cache to observe those epochs)
    store.refresh()
    assert {r["id"] for r in store.read().collect()} == {1, 2, 11, 20}

    # ---- sequential batch loop over the same files ----------------------
    b_store = SignatureStore(spark, str(tmp_path / "b_store"),
                             num_hashes=16, bands=4)
    b_store.append(base_sigs, epoch=-1)
    b_out = str(tmp_path / "b_out")
    n0 = ingest_batch(spark.createDataFrame(batch_a, ["doc_id", "text"]),
                      b_store, 0, b_out, est_threshold=0.9)
    n1 = ingest_batch(spark.createDataFrame(batch_b, ["doc_id", "text"]),
                      b_store, 1, b_out, est_threshold=0.9)
    assert n0 == 1 and n1 == 1
    batch_got = {r["doc_id"]
                 for r in spark.read.parquet(f"{b_out}/epoch=*").collect()}
    assert batch_got == got
    # replay safety: re-delivering a committed epoch is a no-op
    assert ingest_batch(
        spark.createDataFrame(batch_a, ["doc_id", "text"]), b_store, 0,
        b_out, est_threshold=0.9) == 0
    assert b_store.read().count() == 4


def test_band_index_bucketed_probe_plan(spark, tmp_path):
    """Round-5 scale fix, asserted on the physical plan: the corpus band
    index lives as a table bucketed by band_hash, so the per-batch probe
    join scans the store side with NO Exchange and NO Generate (explode) —
    the 8x10^10-row per-batch re-explode of the signature store is gone.
    Only the (bounded) batch side explodes and shuffles."""
    from crawl4ai_custom_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
        save_band_index_bucketed,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [(i, f"doc{i} alpha{i * 3} beta{i * 5} gamma{i * 7} delta{i * 11} "
             f"epsilon{i * 13} zeta{i * 17}")
         for i in range(200)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(shingle_table(docs), 16, 1)
    bands_df = banded_signatures(sigs, 4, 16)
    # two appends = two epochs; bucketed appends must coexist in one table
    save_band_index_bucketed(
        bands_df.where(F.col("id") < 100), "band_index_test", buckets=4,
        path=str(tmp_path / "band_tbl"))
    save_band_index_bucketed(
        bands_df.where(F.col("id") >= 100), "band_index_test", buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = spark.createDataFrame(
            [(1000 + i, f"doc{i} alpha{i * 3} beta{i * 5} gamma{i * 7} "
                        f"delta{i * 11} epsilon{i * 13} zeta{i * 17}")
             for i in range(10)],
            ["doc_id", "text"],
        )
        new_bands = banded_signatures(
            minhash_signatures(shingle_table(batch), 16, 1), 4, 16)
        probe = new_bands.join(
            spark.table("band_index_test").withColumnRenamed("id", "dup_of"),
            "band_hash")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        smj = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
        # tree rendering prefixes every LEFT-child line with ':' — the
        # right (store) subtree is the remainder
        store_side = "\n".join(
            l for l in lines[smj + 1:] if not l.lstrip().startswith(":"))
        assert "Bucketed: true" in store_side
        assert "Exchange" not in store_side   # bucketed scan: no shuffle
        assert "Generate" not in store_side   # materialized: no explode
        # batch side carries all the work: sig agg + join repartition
        assert plan.count("Exchange") == 2
        # and the probe actually finds the duplicated content
        assert probe.select("dup_of").distinct().count() == 10
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("drop table if exists band_index_test")


def test_incremental_dedup_materialized_band_index_equivalence(spark, tmp_path):
    """incremental_minhash_dedup(corpus_bands=store.read_bands()) returns
    exactly what the derived-banding path returns — materialization is a
    pure plan optimization."""
    from crawl4ai_custom_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        shingle_table,
    )
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore

    corpus = spark.createDataFrame(
        [(i, f"some corpus text number {i} with enough words to shingle well")
         for i in range(50)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(shingle_table(corpus), 16, 1)
    store = SignatureStore(spark, str(tmp_path / "store"),
                           num_hashes=16, bands=4)
    store.append(sigs, epoch=0)

    batch = spark.createDataFrame(
        [(900, "some corpus text number 7 with enough words to shingle well"),
         (901, "entirely novel text about watermark semantics in streams")],
        ["doc_id", "text"],
    )
    kw = dict(num_hashes=16, bands=4, est_threshold=0.9)
    derived = incremental_minhash_dedup(batch, store.read(), **kw)
    probed = incremental_minhash_dedup(
        batch, store.read(), corpus_bands=store.read_bands(), **kw)
    key = lambda r: (r["new_id"], r["dup_of"], r["dup_source"])
    assert sorted(map(key, probed.collect())) == sorted(map(key, derived.collect()))
    assert {r["new_id"] for r in probed.collect()} == {900}


def test_signature_store_manifest_recovery_and_uri_io(spark, tmp_path):
    """The manifest is written through the Hadoop FileSystem API (works for
    file:/hdfs:/s3a: roots) and is recoverable: deleting it rebuilds the
    committed-epoch list from the epoch dirs' _SUCCESS markers."""
    import os

    from crawl4ai_custom_spark.operators.dedup import minhash_signatures, shingle_table
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"text number {i} some words here") for i in range(20)],
        ["doc_id", "text"])
    sigs = minhash_signatures(shingle_table(docs), 16, 1)
    # explicit file: URI root — posix os.* would have mangled this
    root = "file:" + str(tmp_path / "store")
    store = SignatureStore(spark, root, num_hashes=16, bands=4)
    store.append(sigs.where(F.col("id") < 10), epoch=0)
    store.append(sigs.where(F.col("id") >= 10), epoch=1)
    assert store.seen_epoch(0) and store.seen_epoch(1)
    assert store.read().count() == 20
    assert store.read_bands().count() == 20 * 4

    os.remove(str(tmp_path / "store" / "_manifest.json"))
    recovered = SignatureStore(spark, root, num_hashes=16, bands=4)
    assert recovered._epochs() == [0, 1]
    assert recovered.read().count() == 20
    assert recovered.read_bands().count() == 20 * 4

    # parameter invariants are enforced on reopen
    recovered.append(sigs.limit(0), epoch=2)  # re-writes manifest w/ params
    import pytest as _pytest
    with _pytest.raises(ValueError):
        SignatureStore(spark, root, num_hashes=32, bands=4)


def test_ingest_drops_zero_token_docs(spark, tmp_path):
    """Empty/whitespace-only docs carry no shingle evidence: without the
    guard they bypassed the store and were re-admitted every epoch forever
    (r4 advice). Now they are dropped before the minhash path."""
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore, ingest_batch

    store = SignatureStore(spark, str(tmp_path / "store"),
                           num_hashes=16, bands=4)
    out = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, ""), (2, "   \n\t "), (3, "real document text with actual words")],
        ["doc_id", "text"])
    assert ingest_batch(b0, store, 0, out, est_threshold=0.9) == 1
    b1 = spark.createDataFrame([(4, ""), (5, "   ")], ["doc_id", "text"])
    assert ingest_batch(b1, store, 1, out, est_threshold=0.9) == 0
    got = {r["doc_id"] for r in spark.read.parquet(f"{out}/epoch=*").collect()}
    assert got == {3}


def test_stream_ingest_band_table_mode(spark, tmp_path):
    """The streaming loop with band_table (bucketed band index) admits the
    same set as directory mode, and the band index accumulates per epoch."""
    from crawl4ai_custom_spark.streaming.ingest import (
        SignatureStore,
        read_docs_stream,
        stream_ingest_dedup,
    )

    rows_a = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
              (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
              (3, "completely different words about bucketed band index joins")]
    rows_b = [(4, "completely different words about bucketed band index joins"),
              (5, "yet another novel document mentioning adaptive query execution")]
    ddir = str(tmp_path / "in")
    spark.createDataFrame(rows_a, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite").parquet(ddir)
    spark.createDataFrame(rows_b, ["doc_id", "text"]).coalesce(1).write.mode(
        "append").parquet(ddir)
    try:
        q = stream_ingest_dedup(
            read_docs_stream(spark, ddir, max_files_per_trigger=1),
            str(tmp_path / "store"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"), num_hashes=16, bands=4,
            band_table="ingest_band_tbl_test", est_threshold=0.9)
        q.awaitTermination()
        got = {r["doc_id"]
               for r in spark.read.parquet(str(tmp_path / "out") + "/epoch=*").collect()}
        assert got == {1, 3, 5}
        store = SignatureStore(spark, str(tmp_path / "store"),
                               num_hashes=16, bands=4,
                               band_table="ingest_band_tbl_test")
        assert {r["id"] for r in store.read().collect()} == {1, 3, 5}
        assert {r["id"] for r in store.read_bands().collect()} == {1, 3, 5}
    finally:
        spark.sql("drop table if exists ingest_band_tbl_test")


def test_read_bands_derives_for_epochs_missing_band_dirs(spark, tmp_path):
    """A store whose committed epochs predate the materialized band index
    (round-4 layout) must NOT probe an empty/partial index — missing
    epochs get their bands derived from stored signatures."""
    import shutil

    from crawl4ai_custom_spark.operators.dedup import (
        minhash_signatures,
        shingle_table,
    )
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"text number {i} with some words") for i in range(30)],
        ["doc_id", "text"])
    sigs = minhash_signatures(shingle_table(docs), 16, 1)
    root = tmp_path / "store"
    store = SignatureStore(spark, str(root), num_hashes=16, bands=4)
    store.append(sigs.where(F.col("id") < 15), epoch=0)
    store.append(sigs.where(F.col("id") >= 15), epoch=1)
    # simulate the legacy layout: epoch 0's band dir never existed
    shutil.rmtree(str(root / "bands" / "epoch=0"))
    assert {r["id"] for r in store.read_bands().collect()} == set(range(30))
    assert store.read_bands().count() == 30 * 4


def test_wrong_parameter_reopen_after_manifest_loss_raises(spark, tmp_path):
    """Recovery cannot restore num_hashes/bands from _SUCCESS markers, so a
    reopen validates the caller's parameters against the stored signature
    width instead of trusting them."""
    import os

    import pytest as _pytest

    from crawl4ai_custom_spark.operators.dedup import (
        minhash_signatures,
        shingle_table,
    )
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"some text {i} here") for i in range(10)], ["doc_id", "text"])
    root = tmp_path / "store"
    store = SignatureStore(spark, str(root), num_hashes=32, bands=8)
    store.append(minhash_signatures(shingle_table(docs), 32, 1), epoch=0)
    os.remove(str(root / "_manifest.json"))
    with _pytest.raises(ValueError, match="32 hashes"):
        SignatureStore(spark, str(root), num_hashes=16, bands=4)
    # the correct parameters still open fine
    ok = SignatureStore(spark, str(root), num_hashes=32, bands=8)
    assert ok._epochs() == [0]


def test_compact_band_table_drops_retry_duplicates_and_orphans(spark, tmp_path):
    """foreachBatch replays duplicate band rows and crashed epochs leave
    orphans in the bucketed band table; compaction rebuilds it to exactly
    the committed store's distinct rows without changing probe results."""
    from crawl4ai_custom_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
        save_band_index_bucketed,
        shingle_table,
    )
    from crawl4ai_custom_spark.streaming.ingest import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"document {i} body words enough to shingle") for i in range(20)],
        ["doc_id", "text"])
    sigs = minhash_signatures(shingle_table(docs), 16, 1)
    try:
        store = SignatureStore(spark, str(tmp_path / "store"),
                               num_hashes=16, bands=4,
                               band_table="compact_test_tbl")
        store.append(sigs, epoch=0)
        # a replayed epoch appends the same rows again, plus an orphan whose
        # id never reached the signature store (crashed epoch)
        dup_and_orphan = banded_signatures(sigs, 4, 16).unionByName(
            spark.createDataFrame([(999, 12345)], "id long, band_hash long"))
        save_band_index_bucketed(dup_and_orphan, "compact_test_tbl", buckets=8)
        n_dirty = spark.table("compact_test_tbl").count()
        assert n_dirty == 2 * 20 * 4 + 1
        store.compact_band_table()
        clean = spark.table("compact_test_tbl")
        assert clean.count() == 20 * 4
        assert clean.where(F.col("id") == 999).count() == 0
        # still bucketed after the rebuild (bucketing only surfaces in the
        # plan when it replaces a shuffle, so force the SMJ path)
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert "Bucketed: true" in clean.join(
                clean.withColumnRenamed("id", "id2"), "band_hash"
            )._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    finally:
        spark.sql("drop table if exists compact_test_tbl")
