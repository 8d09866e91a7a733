"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard training-data hygiene step (13-gram overlap in GPT-3/PaLM
lineage): any document containing an n-gram that also appears in a benchmark
document is contaminated and must be dropped or scrubbed.

Scale shape (100 TB corpus vs small benchmark set):
- benchmark n-grams: shingle -> distinct hash — a SMALL table (benchmarks are
  thousands of docs), broadcast to every executor;
- corpus side: shingle explode is linear; the semi-join against the broadcast
  set never shuffles the corpus; the per-doc overlap count is one groupBy on
  doc id (the only shuffle, keyed evenly).

Reuses the oracle-shared shingle machinery from `dedup.shingle_table`
(stable 60-bit md5 hashing), so DuckDB verifies exact counts
(`q_decontam` gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def benchmark_ngram_set(bench: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 13) -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: (shingle_hash)."""
    return shingle_table(bench, id_col, text_col, k=n).select(
        "shingle_hash"
    ).distinct()


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, min_overlap: int = 1,
                  broadcast_bench: bool = True) -> DataFrame:
    """docs + (n_contaminated_grams, contaminated) columns.

    `contaminated` = shares >= min_overlap distinct n-grams with the
    benchmark set. Keep `broadcast_bench=True` whenever the benchmark side is
    driver-estimable small (the normal case); set False only for
    benchmark-vs-benchmark style joins of two large corpora.
    """
    bench_grams = benchmark_ngram_set(bench, id_col, text_col, n)
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = shingle_table(docs, id_col, text_col, k=n)
    overlap = (
        doc_grams.join(bench_grams, "shingle_hash", "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.join(overlap, docs[id_col] == overlap["id"], "left")
        .drop("id")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)),
        )
        .withColumn(
            "contaminated", F.col("n_contaminated_grams") >= min_overlap
        )
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination: flag corpus documents whose vector
    is too close (cosine >= threshold) to ANY benchmark document — catches
    the paraphrased/reformatted leakage that n-gram overlap misses (the
    modern complement to :func:`decontaminate`; both run in real corpus
    hygiene, n-grams for verbatim leaks, embeddings for near-verbatim).

    Returns (id, max_bench_cosine, n_bench_hits, semantically_contaminated).

    Scale shape mirrors the n-gram pass: the benchmark side is SMALL by
    construction — it broadcasts into a projection over the corpus; the
    per-doc max/count is one groupBy on the (uniform) doc id, the only
    corpus shuffle. At 10^10 docs x 10^4 bench vectors the cross product
    is mn vector ops distributed over corpus partitions; past broadcast
    size, pre-bucket both sides with similarity.hyperplane_bucket and
    join on the bucket instead."""
    from .similarity import cosine

    c = corpus_emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    b = bench_emb.select(F.col(vec_col).cast("array<double>").alias("_bv"))
    scored = c.crossJoin(F.broadcast(b)).select(
        "id", cosine(F.col("_cv"), F.col("_bv")).alias("_cos")
    )
    return (
        scored.groupBy("id")
        .agg(
            F.round(F.max("_cos") + 1e-9, 6).alias("max_bench_cosine"),
            F.sum((F.col("_cos") >= threshold).cast("int"))
            .alias("n_bench_hits"),
        )
        .withColumn(
            "semantically_contaminated", F.col("n_bench_hits") > 0
        )
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
    bloom_partitions: int = 16,
    capacity_per_partition: int = 2_000_000,
    fp_rate: float = 0.01,
    state_dir: str | None = None,
) -> DataFrame:
    """EXACTLY :func:`decontaminate`'s output via the seen-set bloom
    pattern — the scale path when the benchmark gram set is too big to
    broadcast (a full eval-suite union is 10^8-10^9 distinct 13-grams;
    at 8 bytes/hash that is multi-GB per executor as a broadcast, but
    ~1.2 MB/partition as bloom blobs).

    Shape: bench grams fold into a partitioned bloom ONCE (grouped
    pandas, P blobs); the corpus gram stream prefilters against the
    blobs (cogrouped — blobs never ride the shuffle per row), and only
    the `maybe` survivors (true hits + fp_rate noise) pay the exact
    verify equi-join. False negatives are impossible (bloom invariant),
    false positives die in the verify join — output is bit-identical to
    the broadcast path, which is the equivalence test's assertion."""
    from .seen import PartitionedBloom

    bench_grams = benchmark_ngram_set(bench, id_col, text_col, n)
    bloom = PartitionedBloom(
        docs.sparkSession, num_partitions=bloom_partitions,
        capacity_per_partition=capacity_per_partition, fp_rate=fp_rate,
        state_dir=state_dir,
    )
    bloom.add(bench_grams, hash_col="shingle_hash")
    doc_grams = shingle_table(docs, id_col, text_col, k=n)
    flagged = bloom.prefilter(doc_grams, hash_col="shingle_hash")
    maybe = flagged.where(F.col("bloom_maybe_seen")).drop("bloom_maybe_seen")
    overlap = (
        maybe.join(bench_grams, "shingle_hash", "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.join(overlap, docs[id_col] == overlap["id"], "left")
        .drop("id")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)),
        )
        .withColumn(
            "contaminated", F.col("n_contaminated_grams") >= min_overlap
        )
    )
