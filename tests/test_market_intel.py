"""Discovery-driven collection pipeline (market_intel/collect.py parity):
three resumable phases over a synthetic catalog + pages table."""

import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.market_intel import (
    MarketIntelConfig,
    MarketIntelPipeline,
)


@pytest.fixture()
def world(spark):
    # catalog pages link out to homepages; homepages carry product info
    rows = []
    for i in range(6):
        cat = f"https://catalog.example/p{i}"
        home = f"https://prod{i}.example/"
        rows.append((cat, (
            f'<html><body><a href="/internal">in</a>'
            f'<a href="{home}">site</a></body></html>'
        ).encode()))
        rows.append((home, (
            f"<html><head><title>Prod {i} Site</title>"
            f'<meta name="description" content="does thing {i}"></head>'
            f"<body><h1>Product {i}</h1></body></html>"
        ).encode()))
    pages = spark.createDataFrame(rows, ["url", "html"])

    def catalog_fn(seeds):
        # deterministic fake catalog: each seed yields 3 candidates
        return seeds.select(
            "seed",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
        ).select(
            "seed",
            F.concat(F.lit("P"), F.col("i")).alias("name"),
            F.concat(F.lit("https://catalog.example/p"),
                     F.when(F.col("seed") == "crm", F.col("i"))
                     .otherwise(F.col("i") + 3)).alias("catalog_url"),
            F.concat(F.lit("id-"), F.col("i")).alias("catalog_id"),
        )

    return pages, catalog_fn


def test_market_intel_end_to_end(spark, world, tmp_path):
    pages, catalog_fn = world
    pipe = MarketIntelPipeline(spark, pages, str(tmp_path / "mi"), catalog_fn)
    out = pipe.run(["crm", "helpdesk"]).orderBy("catalog_url").collect()
    assert len(out) == 6
    r0 = out[0]
    assert r0["homepage_url"] == "https://prod0.example/"
    assert r0["product"]["name"] == "Product 0"
    assert r0["product"]["description"] == "does thing 0"
    assert all(r["product"]["title"].endswith("Site") for r in out)


def test_market_intel_resume_skips_phases(spark, world, tmp_path):
    pages, catalog_fn = world
    state = str(tmp_path / "mi")
    pipe = MarketIntelPipeline(spark, pages, state, catalog_fn)
    pipe.discover(["crm"])
    # second pipeline over the same state: discover must NOT call the
    # catalog again (the reference skips processed seeds on resume)
    calls = []

    def exploding_catalog(seeds):
        calls.append(1)
        raise AssertionError("catalog re-queried on resume")

    pipe2 = MarketIntelPipeline(spark, pages, state, exploding_catalog)
    products = pipe2.discover(["crm"])
    assert not calls and products.count() == 3
    res = pipe2.run(["crm"])
    assert res.count() == 3


def test_market_intel_unresolved_are_flagged(spark, world, tmp_path):
    pages, catalog_fn = world
    # a catalog url with no fetched page -> resolved=false, kept in state
    def fn(seeds):
        return catalog_fn(seeds).unionByName(seeds.select(
            "seed", F.lit("Ghost").alias("name"),
            F.lit("https://catalog.example/missing").alias("catalog_url"),
            F.lit("id-x").alias("catalog_id"),
        ))

    pipe = MarketIntelPipeline(spark, pages, str(tmp_path / "mi"), fn)
    pipe.discover(["crm"])
    hp = pipe.resolve_homepages()
    flags = {r["catalog_url"]: r["resolved"] for r in hp.collect()}
    assert flags["https://catalog.example/missing"] is False
    assert sum(flags.values()) == 3
