"""Streaming corpus ingest with incremental dedup — the continuous form of
``operators/dedup.incremental_minhash_dedup``.

A production corpus doesn't arrive as one batch: crawl snapshots land as a
stream of document files. This module runs the incremental dedup loop as a
Structured Streaming ``foreachBatch`` sink over a parquet **signature
store** (the same (id, sig array<long>) table the batch operator consumes):

  per micro-batch:
    1. flag batch docs that near-duplicate the store or earlier rows of the
       same batch (LSH bands; signature-agreement similarity),
    2. append the surviving (novel + one keeper per within-batch group)
       docs to the corpus output,
    3. append ONLY the survivors' signatures to the store — the store is
       the dedup state, and it is exactly-once because foreachBatch retries
       are idempotent per epoch (epoch-keyed subdirectories, manifest-last).

State size: num_hashes longs per corpus doc (~256 B at 32 hashes), append
only — no rewrite of existing store files, so a 10^10-doc store stays an
O(Δ) write per batch. The heavy state (shingles) is never stored at all;
that is the point of the signature-agreement design (see the batch
operator's docstring).

Scale notes: everything inside ``_ingest_batch`` is the batch operator's
plan (LSH band joins, broadcast-free, linear in batch size); the only
driver-side work is manifest bookkeeping. Ordering between micro-batches is
the file-source's trigger order — dedup keeps the FIRST occurrence, so the
admitted set depends on arrival order exactly as a real ingest pipeline's
would.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIG_SCHEMA = "id long, sig array<long>"
DOCS_DDL = "doc_id long, text string"


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(DOCS_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


class SignatureStore:
    """Parquet-backed append-only signature store with an epoch manifest.

    Layout: ``<root>/epoch=<n>/`` parquet per committed batch plus
    ``<root>/_manifest.json`` listing committed epochs (manifest written
    LAST, so a retried epoch overwrites its own directory and re-commits —
    idempotent under foreachBatch's at-least-once replay)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _epochs(self) -> list[int]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["epochs"]

    def read(self) -> DataFrame:
        dirs = [os.path.join(self.root, f"epoch={e}") for e in self._epochs()]
        if not dirs:
            return self.spark.createDataFrame([], SIG_SCHEMA)
        return self.spark.read.schema(SIG_SCHEMA).parquet(*dirs)

    def append(self, sigs: DataFrame, epoch: int) -> None:
        epochs = self._epochs()
        path = os.path.join(self.root, f"epoch={epoch}")
        sigs.write.mode("overwrite").parquet(path)  # retry-safe overwrite
        if epoch not in epochs:
            epochs.append(epoch)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epochs": sorted(epochs)}, f)
        os.replace(tmp, self._manifest_path)

    def seen_epoch(self, epoch: int) -> bool:
        return epoch in self._epochs()


def ingest_batch(
    batch: DataFrame,
    store: SignatureStore,
    epoch: int,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 1,
    est_threshold: float = 0.9,
) -> int:
    """One epoch of the ingest loop; returns the number of admitted docs.

    Replay-safe: a re-delivered epoch that already committed is skipped
    outright (the manifest is the source of truth)."""
    from ..operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        shingle_table,
    )

    if store.seen_epoch(epoch):
        return 0
    # ONE shingle pass per epoch: the batch signatures drive the dedup AND
    # become the store append for the survivors (sigs are id-keyed, so the
    # admitted subset is a join, not a recompute); owned here so the cache
    # is released when the epoch commits instead of accreting per batch
    batch_sigs = minhash_signatures(
        shingle_table(batch, id_col, text_col, k), num_hashes, seed
    ).persist()
    try:
        flagged = incremental_minhash_dedup(
            batch, store.read(), id_col=id_col, text_col=text_col, k=k,
            num_hashes=num_hashes, bands=bands, seed=seed,
            est_threshold=est_threshold, new_sigs=batch_sigs,
        ).select(F.col("new_id").alias(id_col)).distinct()
        admitted = batch.join(flagged, id_col, "left_anti").persist()
        try:
            n = admitted.count()
            admitted.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"epoch={epoch}")
            )
            store.append(
                batch_sigs.join(
                    admitted.select(F.col(id_col).alias("id")), "id", "semi"
                ),
                epoch,
            )
        finally:
            admitted.unpersist()
    finally:
        batch_sigs.unpersist()
    return n


def stream_ingest_dedup(
    docs_stream: DataFrame,
    store_root: str,
    out_dir: str,
    checkpoint_dir: str,
    **dedup_kwargs,
):
    """Wire ``ingest_batch`` as a foreachBatch sink; returns the started
    StreamingQuery (caller decides the trigger; tests use availableNow)."""
    spark = docs_stream.sparkSession
    store = SignatureStore(spark, store_root)

    def _sink(batch_df: DataFrame, epoch: int) -> None:
        ingest_batch(batch_df, store, epoch, out_dir, **dedup_kwargs)

    return (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
