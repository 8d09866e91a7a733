"""Wave checkpointing: exact resume from the latest complete snapshot.

Reference parity: CrawlState.save/load pickle checkpoints
(/root/reference/crawl4ai/adaptive_crawler.py:53-111) -> here an
Iceberg-style snapshot directory per wave:

    <root>/wave=<k>/{frontier,host_state,bloom,stats}.parquet
    <root>/wave=<k>/_MANIFEST.json        (written LAST -> commit marker)

The seen set is NOT a table here: it is the union of immutable delta files
(seed frontier + each wave's new_links parquet), listed in the manifest
meta as ``seen_deltas`` — append-only, so per-wave state IO stays O(Δ).

A snapshot is only visible once its manifest exists, giving the same
atomic-commit semantics Iceberg snapshots provide (on a real deployment this
module swaps for ``MERGE INTO`` + snapshot tags; the layout keeps state
tables identical). Resume = read the highest complete wave; an interrupted
wave k+1 simply re-runs from wave k's state, and the wave loop is a pure
function of that state, so the resumed crawl is identical (tested in
tests/test_frontier.py::test_resume_from_checkpoint).

Lineage: stats.parquet carries per-(wave, executor-partition, registrable
domain) fetch/extract metrics — rows fetched, extraction successes, html
bytes, extract milliseconds — the reference's CrawlerTaskResult /
TraversalStats equivalents (models.py:22-37,100-108), queryable across waves
via ``CrawlRun.lineage(spark)``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "host_state", "bloom", "stats")


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:05d}")

    def write(self, wave: int, tables: dict[str, DataFrame],
              meta: dict | None = None) -> None:
        d = self._wave_dir(wave)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
        counts: dict[str, int] = {}
        import os as _os
        import time as _time
        from concurrent.futures import ThreadPoolExecutor
        debug = _os.environ.get("C4A_CKPT_DEBUG")

        # the snapshot tables are independent jobs — submit them from
        # threads so Spark's scheduler overlaps them (FIFO pools share the
        # cluster fine; each job is small). This halves the per-wave commit
        # latency vs sequential writes. The manifest is still written LAST,
        # only after every table landed, so atomicity is unchanged.
        def _write(item):
            name, df = item
            path = os.path.join(d, name + ".parquet")
            _t0 = _time.time()
            df.write.mode("overwrite").parquet(path)
            if debug:
                print(f"[ckpt] wave={wave} {name}: {_time.time()-_t0:.1f}s", flush=True)
            return name

        todo = [(n, df) for n, df in tables.items() if df is not None]
        with ThreadPoolExecutor(max_workers=max(1, len(todo))) as pool:
            for name in pool.map(_write, todo):
                counts[name] = -1
        manifest = {"wave": wave, "tables": sorted(counts), "meta": meta or {}}
        tmp = os.path.join(d, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))  # atomic commit

    def complete_waves(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in os.listdir(self.root):
            if name.startswith("wave=") and os.path.exists(
                os.path.join(self.root, name, "_MANIFEST.json")
            ):
                out.append(int(name.split("=")[1]))
        return sorted(out)

    def latest_wave(self) -> int | None:
        waves = self.complete_waves()
        return waves[-1] if waves else None

    def read(self, wave: int) -> dict[str, DataFrame]:
        d = self._wave_dir(wave)
        with open(os.path.join(d, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        out: dict[str, DataFrame] = {}
        for name in manifest["tables"]:
            out[name] = self.spark.read.parquet(os.path.join(d, name + ".parquet"))
        out["_meta"] = manifest.get("meta", {})  # type: ignore[assignment]
        return out
