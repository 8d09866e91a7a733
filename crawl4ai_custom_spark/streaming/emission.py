"""Streaming emission: consume crawl results wave-by-wave as they commit.

The reference's ``stream=True`` yields CrawlResults as tasks finish
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:200-253,
async_dispatcher.py:529-619) — incremental emission of a batch computation,
NOT event-time processing (SURVEY.md §2.11). The Spark equivalent:

- ``stream_crawl``  — run the engine one wave at a time (max_waves=k+1,
  resume) and yield each wave's results DataFrame as it commits: a pull
  generator with exactly the reference's emission granularity.
- ``follow_results`` — tail an out_dir produced by a crawl running in
  ANOTHER process, yielding each newly committed wave (foreachBatch-style
  consumption of the snapshot log — how a downstream pipeline subscribes).
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..operators.frontier import CrawlRun, FrontierEngine


def stream_crawl(
    engine: FrontierEngine, seeds, max_total_waves: int = 64
) -> Iterator[tuple[int, DataFrame, CrawlRun]]:
    """Yields (wave, results_df, run_so_far) after each committed wave."""
    base_cfg = engine.cfg
    emitted = 0
    for k in range(max_total_waves):
        engine.cfg = type(base_cfg)(**{**base_cfg.__dict__, "max_waves": k + 1})
        run = engine.run(seeds, resume=(k > 0))
        if run.waves == 0:
            break
        wave_dir = os.path.join(run.results_dir, f"wave={k:05d}", "results.parquet")
        if not os.path.exists(wave_dir):
            break
        yield k, engine.spark.read.parquet(wave_dir), run
        emitted += 1
    engine.cfg = base_cfg


def follow_results(
    spark: SparkSession,
    out_dir: str,
    poll_seconds: float = 1.0,
    idle_timeout: float = 60.0,
) -> Iterator[tuple[int, DataFrame]]:
    """Tail another process's crawl output; yields committed waves in order.
    A wave counts as committed when its results.parquet/_SUCCESS exists."""
    seen = 0
    idle = 0.0
    while idle < idle_timeout:
        path = os.path.join(out_dir, f"wave={seen:05d}", "results.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            yield seen, spark.read.parquet(path)
            seen += 1
            idle = 0.0
        else:
            time.sleep(poll_seconds)
            idle += poll_seconds
