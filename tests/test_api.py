"""Reference-shaped facade: run / run_many / deep_crawl."""

import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.api import CrawlResult, WebCrawler


@pytest.fixture(scope="module")
def crawler(spark, site_dir):
    import os

    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(site_dir, "robots.parquet"))
    return WebCrawler(spark, pages, robots)


def _any_url(crawler):
    return crawler.pages.select("url").first()["url"]


def test_run_single_page(crawler):
    url = _any_url(crawler)
    res = crawler.run(url)
    assert isinstance(res, CrawlResult)
    assert res.success and res.status_code == 200
    assert res.markdown.raw_markdown and res.cleaned_html
    assert isinstance(res.links, list) and isinstance(res.metadata, dict)


def test_run_miss_is_404(crawler):
    res = crawler.run("https://nowhere.example.invalid/none")
    assert not res.success and res.status_code == 404


def test_run_many_dataframe_and_stream(crawler):
    urls = [r["url"] for r in crawler.pages.select("url").limit(8).collect()]
    urls.append("https://nowhere.example.invalid/none")
    df = crawler.run_many(urls)
    assert df.count() == 8  # misses excluded from the DataFrame form
    got = list(crawler.run_many(urls, stream=True))
    assert len(got) == 9
    assert sum(1 for r in got if r.status_code == 404) == 1
    assert all(r.markdown.raw_markdown for r in got if r.success)


def test_deep_crawl_facade(crawler, spark, tmp_path):
    from crawl4ai_custom_spark.operators.frontier import CrawlConfig
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    run = crawler.deep_crawl(
        [_any_url(crawler)],
        CrawlConfig(max_depth=1, max_pages=20,
                    politeness=PolitenessConfig(wave_seconds=1e9)),
        checkpoint_dir=str(tmp_path / "ckpt"), out_dir=str(tmp_path / "out"),
    )
    assert run.pages_crawled >= 1 and run.waves >= 1
    assert run.results(spark).count() == run.pages_crawled


def test_api_digest_statistical(spark, site_dir, tmp_path):
    import pyspark.sql.functions as F

    from crawl4ai_custom_spark.api import WebCrawler
    from crawl4ai_custom_spark.operators.frontier import CrawlConfig
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    wc = WebCrawler(spark, pages)
    cfg = CrawlConfig(strategy="bfs", max_depth=1, max_pages=20,
                      politeness=PolitenessConfig(wave_seconds=1e9),
                      use_bloom=False, check_robots=False)
    res = wc.digest(["https://mega.example-shop.com/"], "widget sensor",
                    cfg=cfg, checkpoint_dir=str(tmp_path / "c1"),
                    out_dir=str(tmp_path / "o1"), max_total_waves=2)
    assert res.pages > 0 and 0.0 <= res.confidence <= 1.0

    # embedding strategy requires the model seam explicitly
    import pytest

    with pytest.raises(ValueError):
        wc.digest(["https://x.com/"], "q", strategy="embedding")
    with pytest.raises(ValueError):
        wc.digest(["https://x.com/"], "q", strategy="nope")
