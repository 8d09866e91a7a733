"""Reference-shaped entry surface: arun / arun_many / deep-crawl analogues.

A user of the reference drives three entry points (SURVEY.md §3):
`AsyncWebCrawler.arun(url)`, `arun_many(urls)`, and deep crawl via
`CrawlerRunConfig(deep_crawl_strategy=...)`. This facade maps each onto the
engine's dataflow equivalents so switching is mechanical:

  WebCrawler.run(url)        -> CrawlResult        (arun: one page)
  WebCrawler.run_many(urls)  -> DataFrame | iter   (arun_many; stream=True
                                yields CrawlResults as partitions finish —
                                toLocalIterator, the reference's emission
                                granularity)
  WebCrawler.deep_crawl(seeds, cfg) -> CrawlRun    (BFS/best-first/DFS)

"Fetching" is the engine's semantics everywhere: a join against the
latest-capture pages table (BASELINE.json input_hint) — there is no network
here; the pages table IS the web. Result field names mirror the reference's
CrawlResult/MarkdownGenerationResult (models.py): success, status_code,
html, cleaned_html, markdown.raw_markdown, links, media, metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernel.extract import ExtractConfig
from .operators.extraction import extract_pages
from .operators.frontier import CrawlConfig, CrawlRun, FrontierEngine
from .operators.robots import robots_gate
from .operators.urlops import canonicalize_abs_udf
from .sources.pages import latest_pages


@dataclass
class MarkdownResultView:
    raw_markdown: str = ""
    markdown_with_citations: str = ""
    references_markdown: str = ""
    fit_markdown: str = ""
    fit_html: str = ""


@dataclass
class CrawlResult:
    """Row view named like the reference's CrawlResult (models.py)."""
    url: str
    success: bool = False
    status_code: int | None = None
    cleaned_html: str = ""
    markdown: MarkdownResultView = field(default_factory=MarkdownResultView)
    text: str = ""
    links: list[dict[str, Any]] = field(default_factory=list)
    media: list[dict[str, Any]] = field(default_factory=list)
    tables: list[dict[str, Any]] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


def _to_result(row) -> CrawlResult:
    d = row.asDict(recursive=True)
    return CrawlResult(
        url=d["url"],
        success=bool(d.get("success")),
        status_code=d.get("status_code", 200 if d.get("success") else None),
        cleaned_html=d.get("cleaned_html") or "",
        markdown=MarkdownResultView(
            raw_markdown=d.get("raw_markdown") or "",
            markdown_with_citations=d.get("markdown_with_citations") or "",
            references_markdown=d.get("references_markdown") or "",
            fit_markdown=d.get("fit_markdown") or "",
            fit_html=d.get("fit_html") or "",
        ),
        text=d.get("text") or "",
        links=d.get("links") or [],
        media=d.get("images") or [],
        tables=d.get("tables") or [],
        metadata=d.get("metadata") or {},
    )


class WebCrawler:
    """The engine's `AsyncWebCrawler` analogue over a pages table."""

    def __init__(self, spark: SparkSession, pages: DataFrame,
                 robots: DataFrame | None = None,
                 extract: ExtractConfig | None = None):
        self.spark = spark
        self.pages = latest_pages(pages)
        self.robots = robots
        self.extract = extract or ExtractConfig()

    # -- arun ---------------------------------------------------------------
    def run(self, url: str) -> CrawlResult:
        rows = list(self.run_many([url], stream=True))
        return rows[0] if rows else CrawlResult(url=url, success=False)

    # -- arun_many ----------------------------------------------------------
    def run_many(self, urls: list[str] | DataFrame, *, stream: bool = False,
                 check_robots: bool = False):
        """DataFrame of extracted results (default), or — stream=True — an
        iterator of CrawlResult objects yielded as partitions complete
        (toLocalIterator ≈ the reference's stream=True emission)."""
        if isinstance(urls, DataFrame):
            want = urls.select(F.col("url"))
        else:
            from .session import local_df

            want = local_df(self.spark, [(u,) for u in urls], "url string")
        want = want.select(
            canonicalize_abs_udf(F.col("url")).alias("url_canon")
        ).where(F.col("url_canon").isNotNull()).dropDuplicates(["url_canon"])
        if check_robots and self.robots is not None:
            want = robots_gate(want, self.robots)
        fetched = want.join(
            self.pages.select(F.col("url").alias("url_canon"), "html"),
            "url_canon", "left",
        )
        ok = fetched.where(F.col("html").isNotNull())
        out = extract_pages(
            ok.select(F.col("url_canon").alias("url"), "html"), self.extract
        )
        misses = fetched.where(F.col("html").isNull()).select(
            F.col("url_canon").alias("url")
        )
        if not stream:
            return out
        def gen() -> Iterator[CrawlResult]:
            for row in out.toLocalIterator():
                r = _to_result(row)
                r.status_code = 200
                yield r
            for row in misses.toLocalIterator():
                yield CrawlResult(url=row["url"], success=False,
                                  status_code=404)
        return gen()

    # -- deep crawl ---------------------------------------------------------
    def deep_crawl(self, seeds: list[str], cfg: CrawlConfig | None = None,
                   checkpoint_dir: str | None = None,
                   out_dir: str | None = None, resume: bool = False
                   ) -> CrawlRun:
        engine = FrontierEngine(
            self.spark, self.pages, self.robots, cfg or CrawlConfig(),
            checkpoint_dir=checkpoint_dir, out_dir=out_dir,
        )
        return engine.run(seeds, resume=resume)

    def digest(self, seeds: list[str], query: str, *,
               strategy: str = "statistical",
               cfg: CrawlConfig | None = None,
               query_embeddings=None, embed_results=None,
               checkpoint_dir: str | None = None,
               out_dir: str | None = None, **kwargs):
        """AdaptiveCrawler.digest parity (adaptive_crawler.py:1271-1400):
        crawl until confident, with the reference's two strategies —
        "statistical" (term coverage/consistency/saturation blend) or
        "embedding" (semantic-space coverage over PRECOMPUTED embeddings:
        pass query_embeddings (query_id, embedding) and an embed_results
        callable, the text->vector model seam)."""
        from .operators.adaptive_session import (
            adaptive_crawl,
            embedding_adaptive_crawl,
        )

        engine = FrontierEngine(
            self.spark, self.pages, self.robots, cfg or CrawlConfig(),
            checkpoint_dir=checkpoint_dir, out_dir=out_dir,
        )
        if strategy == "embedding":
            if query_embeddings is None or embed_results is None:
                raise ValueError(
                    "strategy='embedding' needs query_embeddings and "
                    "embed_results (the embedding-model seam)"
                )
            return embedding_adaptive_crawl(
                engine, seeds, query_embeddings, embed_results, **kwargs
            )
        if strategy != "statistical":
            raise ValueError(f"unknown adaptive strategy: {strategy!r}")
        return adaptive_crawl(engine, seeds, query, **kwargs)
