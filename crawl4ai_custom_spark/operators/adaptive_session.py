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
    import os

    spark = engine.spark
    query_terms = [t.lower() for t in query.split() if t]
    history: list[int] = []
    pages = 0
    waves = 0
    hit_pages = 0
    conf = cov = cons = sat = 0.0
    reason = "frontier_exhausted"

    # All vocabulary state lives in parquet, never on the driver: at 100 TB
    # the term vocabulary is tens of millions of rows — a driver set would
    # OOM and an un-materialized union chain would explode the plan. The
    # seen-terms table is append-only (each wave appends only its genuinely
    # new terms, found by anti-join); cumulative stats ping-pong between two
    # materialized views so each wave's plan starts from a parquet scan.
    state_dir = os.path.join(engine.checkpoint_dir, "_state", "adaptive")
    seen_terms_path = os.path.join(state_dir, "seen_terms")
    stats_paths = [os.path.join(state_dir, f"stats_{i}") for i in (0, 1)]
    stats_df: DataFrame | None = None

    for wave, results, run in stream_crawl(engine, seeds, max_total_waves):
        waves = wave + 1
        ok = results.where(F.col("status_code") == 200).select(
            F.col("url").alias("doc_id"), F.col("text")
        )
        # one pass for both wave tallies: page count + query-hit count
        hit_pred = (
            F.concat(F.lit(" "), F.lower("text"), F.lit(" ")).rlike(
                "|".join(f" {t} " for t in query_terms) if query_terms else "$^"
            )
        )
        tallies = ok.agg(
            F.count(F.lit(1)).alias("n_ok"),
            F.sum(hit_pred.cast("int")).alias("n_hit"),
        ).collect()[0]
        n_ok = int(tallies["n_ok"] or 0)
        pages += n_ok
        if n_ok == 0:
            continue
        hit_pages += int(tallies["n_hit"] or 0)

        wave_stats = term_stats(ok, id_col="doc_id", text_col="text")
        # new-term count is a SCALAR from an anti-join against the persisted
        # vocabulary — never a collect() of the terms themselves
        wave_terms = wave_stats.select("term")
        if os.path.isdir(seen_terms_path):
            seen = spark.read.parquet(seen_terms_path)
            fresh = wave_terms.join(seen, "term", "left_anti")
        else:
            fresh = wave_terms
        n_new = fresh.count()
        fresh.write.mode("append").parquet(seen_terms_path)
        history.append(n_new)

        merged = (
            wave_stats
            if stats_df is None
            else stats_df.unionByName(wave_stats)
            .groupBy("term")
            .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        )
        out = stats_paths[waves % 2]
        merged.write.mode("overwrite").parquet(out)
        stats_df = spark.read.parquet(out)

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
