"""NN-Descent k-NN graph construction + graph-based ANN beam search.

The k-NN graph is the backbone data structure of scale similarity work —
SemDeDup-style clustering, graph ANN serving, manifold statistics — and
building it brute-force is O(n^2) in the corpus. NN-Descent (Dong,
Moses & Li, WWW 2011) converges to a near-exact graph from a cheap
initialization by iterating one purely LOCAL rule: *a neighbor of my
neighbor is probably my neighbor*. Every step is a self-join + top-k —
exactly the dataflow shape Spark executes well — so the algorithm
distributes with no driver-side state beyond the round loop.

Operators over ``embeddings(vec_id, embedding array<float>)``:

  knn_graph_init      initial directed k-NN graph from the corpus's own
                      sign-LSH buckets (``similarity.lsh_topk`` with the
                      corpus as its own query set) — deterministic,
                      data-derived, oracle-reproducible.
  nn_descent_round    one NN-Descent iteration: symmetrize the graph,
                      local-join neighbors-of-neighbors through each
                      shared node, exact-cosine score, re-select top-k.
  nn_descent          init + fixed rounds, each round materialized
                      (the ``pagerank`` convention for iterative ops).
  graph_ann_search    greedy beam search over a built k-NN graph:
                      shared entry points, fixed expansion rounds, exact
                      cosine on every candidate — ANN queries that never
                      touch a corpus-sized join.

Scale shape (the reason this exists): with fixed k the per-round
local-join candidate count is sum_v |U(v)|^2 ~= n*(2k)^2 — LINEAR in the
corpus, versus the n^2 brute-force graph build; re-selection is a
per-node top-k over ~k+candidates rows (window keyed by node — never a
corpus-wide window). Beam search touches beam*degree rows per query per
round. This module is full-batch NN-Descent (no sampling): the published
algorithm's rho-sampling and "new/old" incremental flags only thin the
SAME local join and can be layered on; correctness is identical.

Determinism (oracle contract): no RNG anywhere. Init hyperplanes are the
smallest-id corpus vectors (``similarity.data_hyperplanes``); cosine is
the same left-fold dot product in both engines; every top-k orders by
(cosine DESC, id ASC) — the existing ANN gates' convention.

Reference parity: crawl4ai's cosine-similarity extraction and adaptive
embedding strategies (``/root/reference/crawl4ai/utils.py`` cosine
helpers, ``adaptive_crawler.py`` embedding coverage) compute per-page
all-pairs similarity in-process; a 10^8-vector corpus needs the k-NN
graph built once and queried cheaply, which is this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm, cosine, data_hyperplanes, lsh_topk  # noqa: F401


def knn_graph_init(
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Initial directed k-NN graph (id, nbr, cosine): every corpus vector
    queries the corpus's own sign-LSH buckets (Hamming<=1 multiprobe for
    connectivity). Recall of this seed graph is whatever the buckets give
    — NN-Descent rounds are what repair it."""
    g = lsh_topk(corpus, corpus, k=k, n_planes=n_planes,
                 id_col=id_col, vec_col=vec_col, multiprobe=True)
    return g.select(
        F.col("query_id").alias("id"),
        F.col("neighbor_id").alias("nbr"),
        "cosine",
    )


def _vectors(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # vnorm once per row: every scoring join divides by it instead of
    # re-folding the norm aggregate per candidate pair (identical
    # arithmetic — dot/(n1*n2) is cosine()'s own evaluation order)
    return corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("vnorm", _norm(F.col("vec")))


def nn_descent_round(
    graph: DataFrame,
    vectors: DataFrame,
    k: int = 5,
) -> DataFrame:
    """One NN-Descent iteration over ``graph(id, nbr)`` with
    ``vectors(vid, vec)``: U = graph symmetrized; candidates = all (v, w)
    adjacent to a shared node in U (the local join) plus the current
    edges; exact cosine on candidates; keep each node's top-k.

    The local join is the whole algorithm: for node u with combined
    in+out neighborhood U(u), every pair (v, w) in U(u) x U(u) becomes a
    candidate edge — if u is close to both, v and w are likely close.
    Monotone by construction (current edges always compete), so rounds
    never worsen the graph."""
    if "vnorm" not in vectors.columns:  # callers passing bare (vid, vec)
        vectors = vectors.withColumn("vnorm", _norm(F.col("vec")))
    # no distinct on the symmetrized view: a duplicated (id, nbr) row (an
    # edge present in both directions) only duplicates candidate pairs the
    # local join already produces, and cand's own distinct dedups them —
    # the early distinct paid a full exchange to shave at most a 2x row
    # blowup of an already-tiny intermediate
    und = graph.select("id", "nbr").union(
        graph.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"))
    )
    a = und.select(F.col("id").alias("via"), F.col("nbr").alias("id"))
    b = und.select(F.col("id").alias("via"), F.col("nbr").alias("nbr"))
    cand = (
        a.join(b, "via")
        .where(F.col("id") != F.col("nbr"))
        .select("id", "nbr")
        .union(graph.select("id", "nbr"))
        .distinct()
    )
    scored = (
        cand.join(vectors.withColumnRenamed("vid", "id"), "id")
        .join(
            vectors.select(F.col("vid").alias("nbr"),
                           F.col("vec").alias("nvec"),
                           F.col("vnorm").alias("nnorm")),
            "nbr",
        )
        .select("id", "nbr",
                (_dot(F.col("vec"), F.col("nvec"))
                 / (F.col("vnorm") * F.col("nnorm"))).cast("double")
                .alias("cosine"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nbr"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "nbr", "cosine")
    )


def nn_descent(
    corpus: DataFrame,
    k: int = 5,
    rounds: int = 2,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-NN graph by NN-Descent: LSH-seeded init + ``rounds`` fixed local
    joins. Returns (id, nbr, cosine, rank) — rank 1..k per node.

    ``checkpoint_dir``: when set, each round materializes to parquet (the
    iterative-operator convention — durable, resumable, the right call
    for a long 10^8-vector build); unset, rounds localCheckpoint instead.
    Truncation is NOT optional here: a round references the prior graph
    ~5x (symmetrize 2x + local join 2x + carry), so lazy lineage grows
    5^rounds — measured 14.5 s -> ~3 s at 2 rounds / 200 vectors."""
    vectors = _vectors(corpus, id_col, vec_col)
    # keep the seed's cosine so rounds=0 returns the ranked LSH seed
    # graph instead of failing to resolve the column
    g = knn_graph_init(corpus, k, n_planes, id_col, vec_col) \
        .select("id", "nbr", "cosine")
    for r in range(rounds):
        g = nn_descent_round(g, vectors, k).select("id", "nbr", "cosine")
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/nnd_round_{r}"
            g.write.mode("overwrite").parquet(path)
            g = vectors.sparkSession.read.parquet(path)
        else:
            g = g.localCheckpoint(eager=True)
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nbr"))
    return g.withColumn("rank", F.row_number().over(w)).select(
        "id", "nbr", F.col("cosine").cast("double").alias("cosine"), "rank")


def graph_entry_points(corpus: DataFrame, n_entry: int = 4,
                       id_col: str = "vec_id") -> DataFrame:
    """Shared search entry points: the ``n_entry`` smallest corpus ids
    (the ``data_hyperplanes``/``data_centroids`` determinism convention)."""
    return (corpus.select(F.col(id_col).alias("node"))
            .orderBy(F.asc("node")).limit(n_entry))


def graph_ann_search(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 8,
    rounds: int = 2,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    entry_points: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k over a built k-NN ``graph(id, nbr)``: every query starts
    at the shared entry points; each round expands the current beam's
    graph neighbors, scores them exactly against the query, and keeps the
    ``beam`` best (cosine DESC, node ASC) — greedy best-first search in
    fixed synchronized rounds (NSW-style descent without the sequential
    visit loop; a visited-set would only prune re-scores, not change the
    result, because re-scored nodes re-rank identically). After the last
    expansion the beam's top-k become (query_id, neighbor_id, cosine,
    rank).

    Cost per round: |queries| * beam * avg-degree candidate rows — never
    a corpus-sized join; the corpus participates only through the
    (broadcastable at |Q|*beam scale) beam-node vector lookups.

    Entry coverage matters: a clustered corpus's k-NN graph is near-
    disconnected BETWEEN clusters (every node's top-k stays in-cluster),
    and greedy descent cannot cross a gap the graph doesn't bridge — so
    ``n_entry`` must span the corpus's clusters (measured on the 8-cluster
    test fixture: 4 entries -> recall 0.53, 8 entries covering every
    cluster -> >=0.9). At scale, pass ``entry_points`` — a (node)
    DataFrame, e.g. one member per IVF centroid
    (``similarity.data_centroids`` / ``ivf_assign``) — instead of relying
    on id order; the same repair HNSW's upper layers / NSW's long links
    provide. When given, ``n_entry`` is ignored."""
    vectors = _vectors(corpus, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    if entry_points is None:
        entry_points = graph_entry_points(corpus, n_entry, id_col)
    state = q.crossJoin(entry_points.select("node"))
    for _ in range(rounds):
        expanded = state.select("query_id", "node").union(
            state.join(graph.select(F.col("id").alias("node"),
                                    F.col("nbr")), "node")
            .select("query_id", F.col("nbr").alias("node"))
        ).distinct()
        scored = (
            expanded.join(q, "query_id")
            .join(vectors.withColumnRenamed("vid", "node"), "node")
            .where(F.col("query_id") != F.col("node"))
            .select("query_id", "node",
                    (_dot(F.col("qv"), F.col("vec"))
                     / (F.col("qnorm") * F.col("vnorm"))).cast("double")
                    .alias("cosine"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("node"))
        state = (scored.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= beam)
                 .select("query_id", "node")
                 # each round references state twice (carry + expand):
                 # truncate so lineage stays linear in rounds
                 .localCheckpoint(eager=True))
    final = (
        state.join(q, "query_id")
        .join(vectors.withColumnRenamed("vid", "node"), "node")
        .select("query_id", F.col("node").alias("neighbor_id"),
                (_dot(F.col("qv"), F.col("vec"))
                 / (F.col("qnorm") * F.col("vnorm"))).cast("double")
                .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        final.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("cosine").cast("double").alias("cosine"), "rank")
    )
