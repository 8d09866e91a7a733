"""Spark-level tests: urlops columns, latest-capture view, extraction stage.

Invariant checked here (BASELINE input_hint): the Spark-extracted ``text``
equals the oracle ``text`` column the generator stored (which was produced by
the same pure kernel) — i.e. extraction through mapInPandas is byte-identical
to single-process extraction, per url.
"""

import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.operators.extraction import extract_pages, links_table
from crawl4ai_custom_spark.operators.urlops import (
    stable_hash60,
    url_depth_col,
    url_extension,
    url_host,
    url_is_valid,
    url_path,
    with_canonical,
)
from crawl4ai_custom_spark.sources.pages import load_latest_pages, load_pages


@pytest.fixture(scope="module")
def latest(spark, site_dir):
    df = load_latest_pages(spark, site_dir).cache()
    df.count()
    return df


def test_latest_pages_one_row_per_url(spark, site_dir):
    raw = load_pages(spark, site_dir)
    latest = load_latest_pages(spark, site_dir)
    assert raw.count() > latest.count()
    assert latest.groupBy("url").count().where("count > 1").count() == 0


def test_latest_pages_picks_max_ts(spark, site_dir):
    raw = load_pages(spark, site_dir)
    dup_url = (
        raw.groupBy("url").count().where("count > 1").select("url").first()["url"]
    )
    expected_ts = raw.where(F.col("url") == dup_url).agg(F.max("warc_ts")).first()[0]
    got = load_latest_pages(spark, site_dir).where(F.col("url") == dup_url).first()
    assert got["warc_ts"] == expected_ts


def test_url_native_expressions(spark):
    df = spark.createDataFrame(
        [
            ("https://www.example.com/a/b/page.html?x=1",),
            ("http://sub.shop.co.uk:8080/file.PDF",),
            ("notaurl",),
            ("ftp://example.com/x",),
        ],
        ["url"],
    )
    rows = df.select(
        "url",
        url_is_valid(F.col("url")).alias("valid"),
        url_host(F.col("url")).alias("host"),
        url_path(F.col("url")).alias("path"),
        url_extension(F.col("url")).alias("ext"),
        url_depth_col(F.col("url")).alias("depth"),
    ).collect()
    r0, r1, r2, r3 = rows
    assert r0["valid"] and r0["host"] == "www.example.com" and r0["ext"] == "html"
    assert r0["path"] == "/a/b/page.html" and r0["depth"] == 3
    assert r1["host"] == "sub.shop.co.uk" and r1["ext"] == "pdf"
    assert not r2["valid"] and not r3["valid"]


def test_with_canonical_adds_domain(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.com/a/?utm_source=x",), ("https://shop1.example1.com/b#f",)],
        ["url"],
    )
    out = {r["url"]: r for r in with_canonical(df).collect()}
    r = out["https://WWW.Example.com/a/?utm_source=x"]
    assert r["url_canon"] == "https://www.example.com/a"
    assert r["registrable_domain"] == "example.com"


def test_stable_hash60_matches_kernel(spark):
    from crawl4ai_custom_spark.kernel.textproc import stable_hash64

    df = spark.createDataFrame([("abc",), ("https://x.com/",)], ["s"])
    rows = df.select("s", stable_hash60(F.col("s")).alias("h")).collect()
    for r in rows:
        assert r["h"] == stable_hash64(r["s"])


def test_extraction_matches_oracle_text_byte_identical(latest):
    ext = extract_pages(latest.select("url", "html"))
    joined = ext.alias("e").join(latest.alias("p"), "url").select(
        "url", F.col("e.text").alias("got"), F.col("p.text").alias("want")
    )
    total = joined.count()
    mismatches = joined.where(F.col("got") != F.col("want")).count()
    assert total > 100
    assert mismatches == 0


def test_extraction_schema_and_links(latest):
    ext = extract_pages(latest.select("url", "html")).cache()
    row = ext.where(F.col("url").contains("item-")).first()
    assert row["success"] and row["raw_markdown"]
    assert row["tables"] and row["tables"][0]["headers"][0] == "Property"
    assert row["n_links_internal"] > 0
    edges = links_table(ext)
    assert edges.where(F.col("is_internal")).count() > 0
    assert edges.where(~F.col("is_internal")).count() > 0
    # every href is canonical: no fragments, no utm params, no mailto
    bad = edges.where(
        F.col("href").contains("#")
        | F.col("href").contains("utm_")
        | F.col("href").startswith("mailto")
    ).count()
    assert bad == 0
    ext.unpersist()


def test_extract_with_meta_skips_repartition_when_already_wide(spark):
    """extract_pages_with_meta must not insert an Exchange when the input
    already carries >= target partitions (a full shuffle of html payloads
    at scale); it must still widen a narrow input."""
    from crawl4ai_custom_spark.operators.extraction import extract_pages_with_meta

    rows = [(f"http://w.com/{i}", b"<p>x</p>", True, 0) for i in range(8)]
    base = spark.createDataFrame(
        rows, "url string, html binary, _do_extract boolean, depth int"
    )

    # createDataFrame spreads rows over defaultParallelism partitions — no
    # Exchange of its own, unlike an explicit .repartition() input
    assert base.rdd.getNumPartitions() >= 4
    out = extract_pages_with_meta(base, min_parallelism=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # input already carries >= target partitions: no Exchange may be inserted
    assert "Exchange" not in plan, plan

    narrow = base.coalesce(1)
    out2 = extract_pages_with_meta(narrow, min_parallelism=4)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan2, plan2
    # and the stage still produces correct rows either way
    assert out.count() == 8 and out2.count() == 8


def test_fields_pushdown_skips_unobserved_kernel_work(latest):
    """The fields pushdown must reach into the kernel (skip fit_html /
    markdown / content-filter work that no requested field observes) while
    leaving every REQUESTED column byte-identical to the full extraction."""
    sample = latest.select("url", "html").limit(40).cache()
    sample.count()

    full = extract_pages(sample)
    links_only = extract_pages(sample, fields=("url", "links"))
    assert links_only.columns == ["url", "links"]
    j = (
        full.select("url", F.col("links").alias("want"))
        .join(links_only.withColumnRenamed("links", "got"), "url")
    )
    assert j.count() == 40
    assert j.where(F.col("got") != F.col("want")).count() == 0

    # a markdown-bearing subset still gets the identical markdown
    md_only = extract_pages(sample, fields=("url", "raw_markdown"))
    j2 = (
        full.select("url", F.col("raw_markdown").alias("want"))
        .join(md_only.withColumnRenamed("raw_markdown", "got"), "url")
    )
    assert j2.where(F.col("got") != F.col("want")).count() == 0

    # asking for the cited variant re-enables the citation pass and the
    # output stays byte-identical to the full extraction's
    cited = extract_pages(sample, fields=("url", "markdown_with_citations"))
    j3 = (
        full.select("url", F.col("markdown_with_citations").alias("want"))
        .join(cited.withColumnRenamed("markdown_with_citations", "got"), "url")
    )
    assert j3.where(F.col("got") != F.col("want")).count() == 0
    sample.unpersist()


def test_extract_config_markdown_off_kernel():
    """Kernel contract for the pushdown: markdown=False empties only the
    markdown outputs; links/text/metadata are unchanged."""
    from crawl4ai_custom_spark.kernel.extract import ExtractConfig, extract_page

    html = (b"<html><head><title>T</title></head><body><h1>Hi</h1>"
            b"<p>Some prose with a <a href='/x'>link</a>.</p></body></html>")
    url = "http://k.com/a"
    full = extract_page(url, html)
    lean = extract_page(
        url, html,
        ExtractConfig(markdown=False, content_filter="none",
                      schema_fit_html=False),
    )
    assert lean["raw_markdown"] == "" and lean["fit_markdown"] == ""
    assert lean["fit_html"] == "" and lean["markdown_with_citations"] == ""
    assert lean["links"] == full["links"]
    assert lean["text"] == full["text"]
    assert lean["metadata"] == full["metadata"]
    assert full["raw_markdown"]  # the full path still produces markdown
