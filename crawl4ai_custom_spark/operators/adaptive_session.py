"""Adaptive crawl session: crawl-until-confident driver loop.

Reference parity: AdaptiveCrawler.digest
(/root/reference/crawl4ai/adaptive_crawler.py:1308, stop logic :529-548) —
crawl waves, update term statistics, compute confidence =
0.4*coverage + 0.3*consistency + 0.3*saturation, rank next links by
relevance/novelty/authority, stop when confident / saturated / budget.

Spark re-expression: wraps FrontierEngine's wave loop (via streaming
emission) with per-wave term-stat aggregation over the crawled text; the
confidence blend and the stop decision run on the driver (tiny numbers);
the heavy parts (term stats, ranking) are dataflow (operators/adaptive.py).
State (term stats, new-term history) snapshots beside the crawl checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..operators.adaptive import (
    confidence,
    coverage_score,
    saturation_score,
    term_stats,
)
from ..operators.frontier import FrontierEngine
from ..streaming.emission import stream_crawl


@dataclass
class AdaptiveResult:
    confidence: float
    coverage: float
    consistency: float
    saturation: float
    waves: int
    pages: int
    stopped_reason: str
    new_terms_history: list[int] = field(default_factory=list)


def adaptive_crawl(
    engine: FrontierEngine,
    seeds,
    query: str,
    *,
    confidence_threshold: float = 0.75,
    max_total_waves: int = 16,
) -> AdaptiveResult:
    """Run waves until confidence >= threshold (or frontier/budget exhausts).

    Consistency here uses the cheap proxy the reference's blend tolerates at
    wave granularity: the fraction of crawled pages containing >=1 query
    term (pairwise Jaccard / MinHash is available in operators/adaptive.py
    for offline analysis but is overkill per wave)."""
    spark = engine.spark
    query_terms = [t.lower() for t in query.split() if t]
    seen_terms: set[str] = set()
    history: list[int] = []
    stats_df: DataFrame | None = None
    pages = 0
    waves = 0
    hit_pages = 0
    conf = cov = cons = sat = 0.0
    reason = "frontier_exhausted"

    for wave, results, run in stream_crawl(engine, seeds, max_total_waves):
        waves = wave + 1
        ok = results.where(F.col("status_code") == 200).select(
            F.col("url").alias("doc_id"), F.col("text")
        )
        n_ok = ok.count()
        pages += n_ok
        if n_ok == 0:
            continue
        wave_stats = term_stats(ok, id_col="doc_id", text_col="text")
        stats_df = (
            wave_stats
            if stats_df is None
            else stats_df.unionByName(wave_stats)
            .groupBy("term")
            .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        )
        new_terms = {
            r["term"]
            for r in wave_stats.select("term").collect()
        } - seen_terms
        seen_terms |= new_terms
        history.append(len(new_terms))

        lowq = [t for t in query_terms]
        hit_pages += ok.where(
            F.concat(F.lit(" "), F.lower("text"), F.lit(" ")).rlike(
                "|".join(f" {t} " for t in lowq) if lowq else "$^"
            )
        ).count()

        cov = coverage_score(stats_df, query_terms, max(1, pages))
        cons = hit_pages / max(1, pages)
        sat = saturation_score(history)
        conf = confidence(cov, cons, sat)
        if conf >= confidence_threshold:
            reason = "confident"
            break
    else:
        reason = "max_waves"
    if conf < confidence_threshold and reason == "frontier_exhausted" and waves:
        reason = "frontier_exhausted"
    return AdaptiveResult(
        confidence=round(conf, 4),
        coverage=round(cov, 4),
        consistency=round(cons, 4),
        saturation=round(sat, 4),
        waves=waves,
        pages=pages,
        stopped_reason=reason,
        new_terms_history=history,
    )
