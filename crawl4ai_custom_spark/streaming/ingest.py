"""Streaming corpus ingest with incremental dedup — the continuous form of
``operators/dedup.incremental_minhash_dedup``.

A production corpus doesn't arrive as one batch: crawl snapshots land as a
stream of document files. This module runs the incremental dedup loop as a
Structured Streaming ``foreachBatch`` sink over a parquet **signature
store** (the same (id, sig array<long>) table the batch operator consumes)
plus its **materialized band index**:

  per micro-batch:
    1. flag batch docs that near-duplicate the store or earlier rows of the
       same batch (LSH bands; signature-agreement similarity) — the corpus
       side of the band join probes the STORED band index, it is never
       re-derived from signatures (see Scale notes),
    2. append the surviving (novel + one keeper per within-batch group)
       docs to the corpus output,
    3. append ONLY the survivors' signatures AND their band rows to the
       store — the store is the dedup state, and it is exactly-once
       because foreachBatch retries are idempotent per epoch (epoch-keyed
       subdirectories, manifest-last).

State size: num_hashes longs per corpus doc (~256 B at 32 hashes) plus
``bands`` longs of band index (~32 B at 4 bands), both append only — no
rewrite of existing store files, so a 10^10-doc store stays an O(Δ) write
per batch.  The heavy state (shingles) is never stored at all; that is the
point of the signature-agreement design (see the batch operator's
docstring).

Scale notes: everything inside ``ingest_batch`` is the batch operator's
plan (LSH band joins, broadcast-free, linear in batch size); the only
driver-side work is manifest bookkeeping, routed through the Hadoop
FileSystem API (``kernel/hfs``) so the store root can be any
Spark-reachable URI (hdfs://, s3a://, file:) — not just local posix.
Before round 5 the corpus band index was re-derived per batch by exploding
the ENTIRE signature store (8×10^10 rows through a shuffle per micro-batch
at a 10^10-doc store) — the materialized index turns that into a plain
scan of (id, band_hash), and with ``band_table`` set, into an
exchange-free bucketed probe (plan-asserted in
tests/test_streaming_and_modes.py).  Ordering between micro-batches is the
file-source's trigger order — dedup keeps the FIRST occurrence, so the
admitted set depends on arrival order exactly as a real ingest pipeline's
would.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import hfs

SIG_SCHEMA = "id long, sig array<long>"
BAND_SCHEMA = "id long, band_hash long"
DOCS_DDL = "doc_id long, text string"


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(DOCS_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


class SignatureStore:
    """Parquet-backed append-only signature store + band index, with an
    epoch manifest.

    Layout::

        <root>/epoch=<n>/        signatures of epoch n   (id, sig)
        <root>/bands/epoch=<n>/  band index of epoch n   (id, band_hash)
        <root>/_manifest.json    committed epochs + (num_hashes, bands)

    The manifest is written LAST, so a retried epoch overwrites its own
    directories and re-commits — idempotent under foreachBatch's
    at-least-once replay. All metadata I/O goes through the Hadoop
    FileSystem API so ``root`` can be hdfs://, s3a:// or local. If the
    manifest is lost (non-atomic delete+rename window — see
    ``kernel/hfs``), it is rebuilt from the epoch directories' `_SUCCESS`
    markers: a signature dir with `_SUCCESS` was fully written (bands are
    written BEFORE signatures), so recovery treats it as committed.

    ``num_hashes``/``bands`` are store invariants (signatures hashed with
    different parameters cannot be compared), fixed at creation and
    validated against the manifest on reopen.

    ``band_table``: optional name of a Spark table **bucketed by
    band_hash** to hold the band index instead of per-epoch directories —
    the production layout (Iceberg: ``bucket(N, band_hash)``) that lets
    the per-batch probe join scan the store side with NO exchange.
    Replayed epochs may duplicate band rows there; that is benign (see
    ``dedup.save_band_index_bucketed``).
    """

    def __init__(self, spark: SparkSession, root: str,
                 num_hashes: int = 16, bands: int = 4,
                 band_table: str | None = None,
                 band_buckets: int = 8) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.num_hashes = num_hashes
        self.bands = bands
        self.band_table = band_table
        self.band_buckets = band_buckets
        self._cached_manifest: dict | None = None
        hfs.mkdirs(spark, self.root)
        m = self._manifest()
        if m.get("epochs"):
            if "num_hashes" in m:
                if m["num_hashes"] != num_hashes or m.get("bands") != bands:
                    raise ValueError(
                        f"store at {root} was built with num_hashes="
                        f"{m.get('num_hashes')}, bands={m.get('bands')}; "
                        f"got {num_hashes}/{bands}")
            else:
                # recovered manifest carries no parameters — validate against
                # the DATA instead of trusting the caller (a wrong-parameter
                # reopen would band/compare sig prefixes silently)
                row = self.read().select(F.size("sig").alias("n")).first()
                if row is not None and row["n"] != num_hashes:
                    raise ValueError(
                        f"store at {root}: stored signatures have "
                        f"{row['n']} hashes; got num_hashes={num_hashes}")

    @property
    def _manifest_path(self) -> str:
        return f"{self.root}/_manifest.json"

    def _manifest(self) -> dict:
        """Parsed manifest, cached on the instance (single-writer store:
        the owning ingest loop is the only mutator, so the cache is only
        invalidated by our own append). A recovered manifest is written
        back immediately so recovery cost is paid once, not per call."""
        if self._cached_manifest is not None:
            return self._cached_manifest
        if hfs.exists(self.spark, self._manifest_path):
            m = json.loads(hfs.read_text(self.spark, self._manifest_path))
        else:
            m = self._recover()
            if m["epochs"]:
                hfs.write_text(self.spark, self._manifest_path,
                               json.dumps(m))
        self._cached_manifest = m
        return m

    def _recover(self) -> dict:
        """Rebuild the manifest from `_SUCCESS` markers (manifest lost or
        first open). Bands are written before signatures, so a signature
        dir with `_SUCCESS` implies its band rows exist too. Parameters
        cannot be recovered — __init__ validates them against the stored
        signature width instead."""
        epochs = []
        for name in hfs.list_names(self.spark, self.root):
            if name.startswith("epoch=") and hfs.exists(
                    self.spark, f"{self.root}/{name}/_SUCCESS"):
                epochs.append(int(name.split("=", 1)[1]))
        return {"epochs": sorted(epochs)}

    def _epochs(self) -> list[int]:
        return self._manifest()["epochs"]

    def read(self) -> DataFrame:
        dirs = [f"{self.root}/epoch={e}" for e in self._epochs()]
        if not dirs:
            return self.spark.createDataFrame([], SIG_SCHEMA)
        return self.spark.read.schema(SIG_SCHEMA).parquet(*dirs)

    def read_bands(self) -> DataFrame:
        """The materialized (id, band_hash) index over committed epochs —
        the corpus side of the incremental probe, as a plain scan (or an
        exchange-free bucketed-table scan with ``band_table``).

        NEVER silently partial: a committed epoch with no materialized
        band data (store predating the index, or a layout switch) gets its
        bands DERIVED from its stored signatures instead — an empty/short
        index would admit every near-duplicate of those epochs forever."""
        from ..operators.dedup import banded_signatures

        if self.band_table is not None:
            if self.spark.catalog.tableExists(self.band_table):
                return self.spark.table(self.band_table)
            # layout mismatch / legacy store: derive, loudly correct
            return banded_signatures(self.read(), self.bands,
                                     self.num_hashes)
        have = [e for e in self._epochs()
                if hfs.exists(self.spark, f"{self.root}/bands/epoch={e}")]
        missing = [e for e in self._epochs() if e not in have]
        parts: list[DataFrame] = []
        if have:
            parts.append(self.spark.read.schema(BAND_SCHEMA).parquet(
                *[f"{self.root}/bands/epoch={e}" for e in have]))
        if missing:
            sigs = self.spark.read.schema(SIG_SCHEMA).parquet(
                *[f"{self.root}/epoch={e}" for e in missing])
            parts.append(banded_signatures(sigs, self.bands, self.num_hashes))
        if not parts:
            return self.spark.createDataFrame([], BAND_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def append(self, sigs: DataFrame, epoch: int) -> None:
        """Commit one epoch: band index first, signatures second, manifest
        last. Retry-safe: directory writes are per-epoch overwrites; the
        bucketed band table tolerates duplicate/orphan rows by design
        (compact with ``compact_band_table`` if retries accumulate)."""
        from ..operators.dedup import banded_signatures, save_band_index_bucketed

        bands_df = banded_signatures(sigs, self.bands, self.num_hashes)
        if self.band_table is not None:
            save_band_index_bucketed(
                bands_df, self.band_table, buckets=self.band_buckets,
                path=f"{self.root}/band_table")
        else:
            bands_df.write.mode("overwrite").parquet(
                f"{self.root}/bands/epoch={epoch}")
        sigs.write.mode("overwrite").parquet(f"{self.root}/epoch={epoch}")
        m = self._manifest()
        epochs = list(m["epochs"])
        if epoch not in epochs:
            epochs.append(epoch)
        new_m = {"epochs": sorted(epochs), "num_hashes": self.num_hashes,
                 "bands": self.bands}
        hfs.write_text(self.spark, self._manifest_path, json.dumps(new_m))
        self._cached_manifest = new_m

    def compact_band_table(self) -> None:
        """Maintenance for ``band_table`` mode: foreachBatch replays append
        duplicate band rows (benign for correctness, but they accrete scan
        cost over the store's lifetime). Rebuilds the table as the distinct
        rows whose ids exist in the committed signature store — dropping
        retry duplicates AND crashed-epoch orphans in one pass."""
        if self.band_table is None or not self.spark.catalog.tableExists(
                self.band_table):
            return
        from ..operators.dedup import save_band_index_bucketed

        tmp = f"{self.root}/band_table_compact"
        canonical = f"{self.root}/band_table"
        (self.spark.table(self.band_table).distinct()
         .join(self.read().select("id"), "id", "semi")
         .write.mode("overwrite").parquet(tmp))
        self.spark.sql(f"drop table if exists {self.band_table}")
        # dropping an EXTERNAL table keeps its data files — clear the
        # canonical location before recreating there, or the rebuilt table
        # would union the stale files back in
        hfs.delete(self.spark, canonical)
        save_band_index_bucketed(
            self.spark.read.schema(BAND_SCHEMA).parquet(tmp),
            self.band_table, buckets=self.band_buckets, path=canonical)

    def refresh(self) -> None:
        """Drop the cached manifest. The cache assumes a SINGLE WRITER (the
        owning ingest loop); a separate reader instance observing another
        process's appends calls this (or reopens) to see new epochs."""
        self._cached_manifest = None

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
    seed: int = 1,
    est_threshold: float = 0.9,
) -> int:
    """One epoch of the ingest loop; returns the number of admitted docs.

    Replay-safe: a re-delivered epoch that already committed is skipped
    outright (the manifest is the source of truth). minhash parameters
    (num_hashes/bands) are the STORE's — they are invariants of the
    signature state, not per-call knobs.

    Zero-token docs (empty/whitespace-only text) are dropped before the
    minhash path: they produce no shingles hence no signature, so they
    could never be flagged OR remembered — without the guard, identical
    empty docs would be re-admitted every epoch forever (r4 advice)."""
    from ..operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        shingle_table,
    )

    if store.seen_epoch(epoch):
        return 0
    # any non-whitespace char = at least one token (F.trim strips only
    # ASCII spaces, which would let "\n\t" docs through)
    batch = batch.where(F.col(text_col).rlike(r"\S"))
    # ONE shingle pass per epoch: the batch signatures drive the dedup AND
    # become the store append for the survivors (sigs are id-keyed, so the
    # admitted subset is a join, not a recompute); owned here so the cache
    # is released when the epoch commits instead of accreting per batch
    batch_sigs = minhash_signatures(
        shingle_table(batch, id_col, text_col, k), store.num_hashes, seed
    ).persist()
    try:
        flagged = incremental_minhash_dedup(
            batch, store.read(), id_col=id_col, text_col=text_col, k=k,
            num_hashes=store.num_hashes, bands=store.bands, seed=seed,
            est_threshold=est_threshold, new_sigs=batch_sigs,
            corpus_bands=store.read_bands(),
        ).select(F.col("new_id").alias(id_col)).distinct()
        admitted = batch.join(flagged, id_col, "left_anti").persist()
        try:
            n = admitted.count()
            admitted.write.mode("overwrite").parquet(
                f"{out_dir}/epoch={epoch}")
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
    num_hashes: int = 16,
    bands: int = 4,
    band_table: str | None = None,
    band_buckets: int = 8,
    **dedup_kwargs,
):
    """Wire ``ingest_batch`` as a foreachBatch sink; returns the started
    StreamingQuery (caller decides the trigger; tests use availableNow)."""
    spark = docs_stream.sparkSession
    store = SignatureStore(spark, store_root, num_hashes=num_hashes,
                           bands=bands, band_table=band_table,
                           band_buckets=band_buckets)

    def _sink(batch_df: DataFrame, epoch: int) -> None:
        ingest_batch(batch_df, store, epoch, out_dir, **dedup_kwargs)

    return (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
