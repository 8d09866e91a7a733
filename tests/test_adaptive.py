"""Adaptive crawl: term stats, confidence components, crawl-until-confident."""

import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.operators.adaptive import (
    confidence,
    coverage_score,
    rank_links_adaptive,
    saturation_score,
    term_stats,
)
from crawl4ai_custom_spark.operators.adaptive_session import adaptive_crawl
from crawl4ai_custom_spark.operators.frontier import CrawlConfig, FrontierEngine
from crawl4ai_custom_spark.operators.politeness import PolitenessConfig


def test_term_stats(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark shuffle"), (2, "spark join"), (3, "")],
        ["doc_id", "text"],
    )
    st = {r["term"]: r for r in term_stats(docs).collect()}
    assert st["spark"]["tf"] == 3 and st["spark"]["df"] == 2
    assert st["shuffle"]["df"] == 1


def test_confidence_components(spark):
    docs = spark.createDataFrame(
        [(1, "widget spin fast"), (2, "widget shine slow")], ["doc_id", "text"]
    )
    st = term_stats(docs)
    cov = coverage_score(st, ["widget", "absent"], 2)
    assert 0.0 < cov < 1.0
    assert saturation_score([100, 10]) == 0.9
    assert saturation_score([]) == 0.0
    assert confidence(1.0, 1.0, 1.0) == 1.0


def test_rank_links_adaptive(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/widget-guide", "widget tutorial", "a.com"),
            ("https://b.com/unrelated", "cats", "b.com"),
        ],
        ["href", "text", "registrable_domain"],
    )
    stats = term_stats(
        spark.createDataFrame([(1, "widget widget existing")], ["doc_id", "text"])
    )
    ranked = rank_links_adaptive(links, stats, ["widget"]).collect()
    assert ranked[0]["href"] == "https://a.com/widget-guide"
    assert ranked[0]["adaptive_score"] > ranked[1]["adaptive_score"]


@pytest.mark.slow
def test_adaptive_crawl_stops(spark, site_dir, tmp_path):
    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, max_pages=60,
                      politeness=PolitenessConfig(wave_seconds=1e9),
                      use_bloom=False, check_robots=False)
    eng = FrontierEngine(spark, pages, None, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    res = adaptive_crawl(
        eng, ["https://mega.example-shop.com/"], "widget sensor valve",
        confidence_threshold=0.5, max_total_waves=4,
    )
    assert res.waves >= 1 and res.pages > 0
    assert 0.0 <= res.confidence <= 1.0
    assert res.stopped_reason in ("confident", "max_waves", "frontier_exhausted")
    assert len(res.new_terms_history) >= 1
