"""Embedding-based adaptive crawling: semantic-space coverage as dataflow.

Reference parity: EmbeddingStrategy
(/root/reference/crawl4ai/adaptive_crawler.py:617-1270) — map the query's
semantic neighborhood with query variations (train/validation split),
measure coverage gaps as min cosine distance from each variation to the
crawled knowledge base, rank candidate links by how much they close those
gaps (minus a redundancy penalty), stop when the confidence learning curve
converges AND held-out validation queries are irreducibly covered.

The model *call* (text -> embedding) is out of scope by design (SURVEY §2);
every distance/coverage computation here runs on PRECOMPUTED embedding
columns (array<double>), exactly like operators/similarity.py:

  * coverage_gaps         query×KB min-distance — KB streams through a
                          partial max-sim aggregation (queries broadcast;
                          the KB is never shuffled)
  * rank_links_by_gaps    links×gaps improvement sum (gaps are ~10 rows,
                          broadcast) + links×KB overlap penalty
  * kb_confidence         mean best-cosine per train query (or τ hit-rate)
  * kb_dedup_filter       admit new docs whose max similarity to the
                          existing KB is < 0.95 (the reference checks new
                          docs against the batch-START KB only, so this is
                          embarrassingly parallel — no sequential loop)
  * validation_score      mean (1 - min distance) of held-out queries
  * should_stop /         driver-side scalar logic on the confidence
    quality_confidence    history (tiny), mirroring :1135-1211

All dot products are native zip_with/aggregate expressions — zero Python
UDFs anywhere on this path; at 100 TB the only wide operation is the
links×KB overlap join, which reuses the bucketed/broadcast strategies of
operators/similarity.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine


@dataclass
class EmbeddingAdaptiveConfig:
    """Defaults mirror AdaptiveConfig (adaptive_crawler.py:182-221)."""

    coverage_radius: float = 0.2
    overlap_threshold: float = 0.85
    kb_similarity_threshold: float = 0.95
    min_relative_improvement: float = 0.1
    validation_min_score: float = 0.3
    min_confidence_threshold: float = 0.1
    quality_min_confidence: float = 0.7
    quality_max_confidence: float = 0.95
    quality_scale_factor: float = 0.833
    coverage_tau: float | None = None
    # links×KB / docs×KB joins go IVF-bucketed past this KB row count
    kb_broadcast_rows: int = 100_000


def coverage_gaps(
    queries: DataFrame,
    kb: DataFrame,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    kb_vec: str = "embedding",
) -> DataFrame:
    """(query_id, gap): gap = 1 - max cosine(query, any KB doc); a query
    with an empty KB has gap 1.0 (adaptive_crawler.py:823-851).

    Plan shape: the handful of query variations is broadcast against the KB
    scan; the per-(kb-row × query) similarity folds through a partial max
    aggregation, so the KB — the big side — is never shuffled."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv"))
    d = kb.select(F.col(kb_vec).alias("dv"))
    best = (
        d.crossJoin(F.broadcast(q))
        .groupBy("query_id")
        .agg(F.max(cosine(F.col("qv"), F.col("dv"))).alias("best_sim"))
    )
    # left join keeps every query even when the KB is empty -> gap 1.0
    return (
        q.select("query_id")
        .join(best, "query_id", "left")
        .select(
            "query_id",
            (F.lit(1.0) - F.coalesce(F.col("best_sim"), F.lit(0.0)))
            .cast("double").alias("gap"),
        )
    )


def kb_confidence(
    queries: DataFrame,
    kb: DataFrame,
    tau: float | None = None,
    query_vec: str = "embedding",
    kb_vec: str = "embedding",
) -> float:
    """Mean best-cosine per query (or fraction >= tau when given) —
    the coverage learning score (adaptive_crawler.py:967-994)."""
    gaps = coverage_gaps(queries, kb, query_vec=query_vec, kb_vec=kb_vec)
    best = gaps.select((F.lit(1.0) - F.col("gap")).alias("best"))
    if tau is not None:
        row = best.agg(F.avg((F.col("best") >= tau).cast("double"))).first()
    else:
        row = best.agg(F.avg("best")).first()
    return float(row[0] or 0.0)


# Past this KB row count the links×KB / new-docs×KB max-similarity joins
# switch from the exact nested-loop scan to an IVF-bucketed candidate join:
# the KB stops being broadcast-sized long before 10^10-URL scale, and an
# all-pairs pass over it per wave would dominate the crawl.
KB_BROADCAST_ROWS = 100_000


def _max_sim_to_kb(
    vectors: DataFrame,
    kb_vecs: DataFrame,
    broadcast_rows: int = KB_BROADCAST_ROWS,
    kb_rows: int | None = None,
    n_centroids: int = 32,
    nprobe: int = 8,
) -> DataFrame:
    """(id, max_sim): max cosine of each input vector to any KB vector.

    ``vectors`` is (id, v); ``kb_vecs`` is (dv). Small KBs take the exact
    cross-join + partial-max path (the KB streams, nothing shuffles). Past
    ``broadcast_rows`` the KB is IVF-bucketed (similarity.ivf_assign): KB
    rows live in their nearest-centroid bucket, each input probes its
    ``nprobe`` nearest buckets, and the join is a bucket equi-join — the
    candidate set shrinks ~n_centroids/nprobe-fold and the plan is a real
    hash/sort-merge join instead of a nested loop. Approximate by
    construction (an out-of-probe KB row can hide a higher sim); nprobe
    tunes the recall/cost trade."""
    if kb_rows is None:
        kb_rows = kb_vecs.count()
    if kb_rows <= broadcast_rows:
        return (
            vectors.crossJoin(kb_vecs)
            .groupBy("id")
            .agg(F.max(cosine(F.col("v"), F.col("dv"))).alias("max_sim"))
        )
    from .similarity import data_centroids, ivf_assign

    kb_ids = kb_vecs.withColumn("kb_id", F.monotonically_increasing_id())
    cents = data_centroids(kb_ids, n_centroids, "kb_id", "dv")
    kb_b = ivf_assign(kb_ids, cents, "kb_id", "dv", nprobe=1).select(
        "dv", "bucket"
    )
    v_b = ivf_assign(vectors, cents, "id", "v", nprobe=nprobe).select(
        "id", "v", "bucket"
    )
    return (
        v_b.join(kb_b, "bucket")
        .groupBy("id")
        .agg(F.max(cosine(F.col("v"), F.col("dv"))).alias("max_sim"))
    )


def rank_links_by_gaps(
    links: DataFrame,
    gaps: DataFrame,
    kb: DataFrame,
    cfg: EmbeddingAdaptiveConfig | None = None,
    link_id: str = "url",
    link_vec: str = "embedding",
    kb_vec: str = "embedding",
    contextual_col: str | None = None,
) -> DataFrame:
    """(link_id, score): links ranked by gap-filling efficiency
    (adaptive_crawler.py:853-965).

    score = gap_reduction * (1 - overlap_penalty), where
      gap_reduction   = sum over gaps with gap > radius of
                        2*(gap - dist(link, gap_query)) when the link is
                        closer, averaged over gaps needing help
      overlap_penalty = 2 * max(0, max_sim_to_KB - overlap_threshold)
    and, when ``contextual_col`` is given, the reference's 0.8/0.2 blend.

    ``gaps`` must carry the query embedding: (query_id, gap, embedding).
    """
    cfg = cfg or EmbeddingAdaptiveConfig()
    l = links.select(F.col(link_id).alias("link_id"),
                     F.col(link_vec).alias("lv"),
                     *([F.col(contextual_col).alias("ctx")]
                       if contextual_col else []))
    g = gaps.select("query_id", "gap", F.col("embedding").alias("qv"))

    needing = g.where(F.col("gap") > cfg.coverage_radius)
    # per (link, needy gap): scaled improvement when the link is closer
    dist = F.lit(1.0) - cosine(F.col("lv"), F.col("qv"))
    per_gap = (
        l.crossJoin(F.broadcast(needing))
        .select(
            "link_id",
            F.when(dist < F.col("gap"), (F.col("gap") - dist) * 2.0)
            .otherwise(F.lit(0.0)).alias("improvement"),
        )
        .groupBy("link_id")
        .agg(F.sum("improvement").alias("total_improvement"))
    )
    n_needing = needing.count()

    if n_needing > 0:
        reduction = l.select("link_id").join(per_gap, "link_id", "left").select(
            "link_id",
            (F.coalesce("total_improvement", F.lit(0.0)) / n_needing)
            .alias("gap_reduction"),
        )
    else:
        reduction = l.select("link_id", F.lit(0.0).alias("gap_reduction"))

    # redundancy: max similarity of the link to anything already in the KB —
    # exact scan while the KB is small, IVF-bucketed equi-join once it grows
    overlap = _max_sim_to_kb(
        l.select(F.col("link_id").alias("id"), F.col("lv").alias("v")),
        kb.select(F.col(kb_vec).alias("dv")),
        broadcast_rows=cfg.kb_broadcast_rows,
    ).select(F.col("id").alias("link_id"), "max_sim")
    penalty = F.when(
        F.col("max_sim") > cfg.overlap_threshold,
        (F.col("max_sim") - cfg.overlap_threshold) * 2.0,
    ).otherwise(F.lit(0.0))

    scored = (
        reduction.join(overlap, "link_id", "left")
        .select(
            "link_id",
            (F.col("gap_reduction")
             * (F.lit(1.0) - F.coalesce(penalty, F.lit(0.0))))
            .alias("score"),
        )
    )
    if contextual_col:
        scored = (
            scored.join(l.select("link_id", "ctx"), "link_id")
            .select(
                "link_id",
                F.when(F.col("ctx").isNotNull() & (F.col("ctx") != 0.0),
                       F.col("score") * 0.8 + F.col("ctx") * 0.2)
                .otherwise(F.col("score")).alias("score"),
            )
        )
    return scored.select("link_id", F.col("score").cast("double").alias("score"))


def kb_dedup_filter(
    new_docs: DataFrame,
    kb: DataFrame,
    threshold: float = 0.95,
    doc_id: str = "doc_id",
    doc_vec: str = "embedding",
    kb_vec: str = "embedding",
    broadcast_rows: int = KB_BROADCAST_ROWS,
) -> DataFrame:
    """New docs whose max cosine to the EXISTING KB is < threshold
    (adaptive_crawler.py:1243-1262: the loop similarity-checks every new
    embedding against the batch-start KB, never against other new docs —
    so the filter is a plain parallel aggregation, no sequential state)."""
    n = new_docs.select(F.col(doc_id).alias("id"), F.col(doc_vec).alias("nv"))
    sims = _max_sim_to_kb(
        n.select("id", F.col("nv").alias("v")),
        kb.select(F.col(kb_vec).alias("dv")),
        broadcast_rows=broadcast_rows,
    )
    keep = (
        n.join(sims, "id", "left")
        .where(F.coalesce("max_sim", F.lit(-1.0)) < threshold)
        .select(F.col("id").alias(doc_id))
    )
    return new_docs.join(keep, doc_id, "left_semi")


def validation_score(
    val_queries: DataFrame,
    kb: DataFrame,
    query_vec: str = "embedding",
    kb_vec: str = "embedding",
) -> float:
    """Held-out coverage: mean over validation queries of (1 - min cosine
    distance to KB) (adaptive_crawler.py:1100-1133). 0.0 on an empty KB."""
    if kb.isEmpty():
        return 0.0
    gaps = coverage_gaps(val_queries, kb, query_vec=query_vec, kb_vec=kb_vec)
    row = gaps.agg(F.avg(F.lit(1.0) - F.col("gap"))).first()
    return float(row[0] or 0.0)


@dataclass
class EmbeddingStopState:
    """Driver-side scalars only — the heavy math stays in the cluster."""

    confidence_history: list[float] = field(default_factory=list)
    stopped_reason: str = ""
    validation_passed: bool = False


def should_stop(
    state: EmbeddingStopState,
    confidence: float,
    pages_crawled: int,
    frontier_empty: bool,
    max_pages: int,
    validate,
    cfg: EmbeddingAdaptiveConfig | None = None,
) -> bool:
    """Learning-curve convergence + validation-query irreducibility stop
    (adaptive_crawler.py:1135-1182). ``validate`` is a thunk returning the
    held-out validation score — only called at convergence."""
    cfg = cfg or EmbeddingAdaptiveConfig()
    if confidence < cfg.min_confidence_threshold and pages_crawled > 0:
        state.stopped_reason = "below_minimum_relevance_threshold"
        return True
    if pages_crawled >= max_pages or frontier_empty:
        state.stopped_reason = "budget_or_frontier_exhausted"
        return True
    state.confidence_history.append(confidence)
    if len(state.confidence_history) < 2:
        return False
    h = state.confidence_history
    avg_improvement = sum(abs(b - a) for a, b in zip(h[:-1], h[1:])) / (len(h) - 1)
    if avg_improvement < cfg.min_relative_improvement * confidence:
        val = float(validate())
        if val > cfg.validation_min_score:
            state.stopped_reason = "converged_validated"
            state.validation_passed = True
            return True
        state.stopped_reason = "low_validation"  # converged but keep going
    return False


def quality_confidence(
    learning_score: float,
    validation_sc: float,
    validation_passed: bool,
    cfg: EmbeddingAdaptiveConfig | None = None,
) -> float:
    """Display confidence mapping (adaptive_crawler.py:1184-1211)."""
    cfg = cfg or EmbeddingAdaptiveConfig()
    if validation_passed and validation_sc > cfg.validation_min_score:
        if learning_score < 0.4:
            return cfg.quality_min_confidence
        if learning_score > 0.7:
            return cfg.quality_max_confidence
        return cfg.quality_min_confidence + (learning_score - 0.4) * cfg.quality_scale_factor
    return learning_score * 0.8
