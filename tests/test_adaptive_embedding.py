"""EmbeddingStrategy adaptive crawl: coverage gaps, gap-filling link rank,
KB dedup, convergence + validation stop (adaptive_crawler.py:617-1270)."""

import math

import pytest

import pyspark.sql.functions as F

from crawl4ai_custom_spark.operators.adaptive_embedding import (
    EmbeddingAdaptiveConfig,
    EmbeddingStopState,
    coverage_gaps,
    kb_confidence,
    kb_dedup_filter,
    quality_confidence,
    rank_links_by_gaps,
    should_stop,
    validation_score,
)


def _vecs(spark, rows, id_col="query_id"):
    return spark.createDataFrame(rows, [id_col, "embedding"])


@pytest.fixture(scope="module")
def space(spark):
    # axis-aligned unit vectors: exact cosines by construction
    e = lambda i: [1.0 if j == i else 0.0 for j in range(4)]
    queries = _vecs(spark, [(0, e(0)), (1, e(1)), (2, e(2))])
    kb = _vecs(spark, [(10, e(0)), (11, [0.6, 0.8, 0.0, 0.0])], id_col="doc_id")
    return queries, kb


def test_coverage_gaps_exact(spark, space):
    queries, kb = space
    gaps = {r["query_id"]: r["gap"] for r in coverage_gaps(queries, kb).collect()}
    assert gaps[0] == pytest.approx(0.0)        # covered exactly by doc 10
    assert gaps[1] == pytest.approx(0.2)        # best = 0.8 from doc 11
    assert gaps[2] == pytest.approx(1.0)        # orthogonal to everything


def test_coverage_gaps_empty_kb(spark, space):
    queries, _ = space
    empty = spark.createDataFrame([], "doc_id long, embedding array<double>")
    gaps = coverage_gaps(queries, empty).collect()
    assert all(r["gap"] == pytest.approx(1.0) for r in gaps)


def test_kb_confidence_mean_and_tau(spark, space):
    queries, kb = space
    # best sims: 1.0, 0.8, 0.0 -> mean 0.6; hit-rate at tau 0.75 -> 2/3
    assert kb_confidence(queries, kb) == pytest.approx(0.6)
    assert kb_confidence(queries, kb, tau=0.75) == pytest.approx(2 / 3)


def test_rank_links_prefers_gap_fillers(spark, space):
    queries, kb = space
    e = lambda i: [1.0 if j == i else 0.0 for j in range(4)]
    links = _vecs(spark, [
        ("fills_gap2", e(2)),      # exactly covers the open gap
        ("redundant", e(0)),       # duplicates KB doc 10 -> overlap penalty
        ("unrelated", e(3)),       # helps nothing
    ], id_col="url")
    gaps = coverage_gaps(queries, kb).join(queries, "query_id")
    scores = {r["link_id"]: r["score"]
              for r in rank_links_by_gaps(links, gaps, kb).collect()}
    assert scores["fills_gap2"] > scores["unrelated"]
    assert scores["fills_gap2"] > scores["redundant"]
    # the exact reference arithmetic for the winner: only gap2 (1.0) is
    # needy beyond also gap1 (0.2 == radius, excluded); improvement
    # = (1.0 - 0.0)*2 over 1 needy gap; no overlap (orthogonal to KB)
    assert scores["fills_gap2"] == pytest.approx(2.0)


def test_kb_dedup_filter(spark):
    e = lambda i: [1.0 if j == i else 0.0 for j in range(3)]
    kb = _vecs(spark, [(1, e(0))], id_col="doc_id")
    new = _vecs(spark, [
        (2, e(0)),                       # exact dup -> dropped
        (3, [0.97, 0.2431, 0.0]),        # sim ~0.97 -> dropped
        (4, e(1)),                       # novel -> kept
    ], id_col="doc_id")
    kept = sorted(r["doc_id"] for r in kb_dedup_filter(new, kb).collect())
    assert kept == [4]


def test_validation_and_stop_loop(spark):
    """Mirror of the reference digest loop: converge -> validate -> stop."""
    e = lambda i: [1.0 if j == i else 0.0 for j in range(3)]
    val_q = _vecs(spark, [(8, e(0)), (9, e(1))])
    kb_good = _vecs(spark, [(1, e(0)), (2, e(1))], id_col="doc_id")
    kb_bad = _vecs(spark, [(1, e(2))], id_col="doc_id")
    assert validation_score(val_q, kb_good) == pytest.approx(1.0)
    assert validation_score(val_q, kb_bad) == pytest.approx(0.0)

    cfg = EmbeddingAdaptiveConfig()
    st = EmbeddingStopState()
    # wave 1: improving fast -> no stop
    assert not should_stop(st, 0.5, 10, False, 1000, lambda: 1.0, cfg)
    # wave 2: tiny improvement -> converged; validation strong -> stop
    assert should_stop(st, 0.505, 20, False, 1000, lambda: 0.9, cfg)
    assert st.stopped_reason == "converged_validated"
    assert st.validation_passed

    # converged but validation WEAK -> keep crawling
    st2 = EmbeddingStopState()
    assert not should_stop(st2, 0.5, 10, False, 1000, lambda: 0.0, cfg)
    assert not should_stop(st2, 0.505, 20, False, 1000, lambda: 0.0, cfg)
    assert st2.stopped_reason == "low_validation"

    # irrelevance early-exit
    st3 = EmbeddingStopState()
    assert should_stop(st3, 0.05, 5, False, 1000, lambda: 0.0, cfg)
    assert st3.stopped_reason == "below_minimum_relevance_threshold"


def test_quality_confidence_mapping():
    cfg = EmbeddingAdaptiveConfig()
    # not validated: conservative 0.8x
    assert quality_confidence(0.5, 0.0, False, cfg) == pytest.approx(0.4)
    # validated: clamped mapping
    assert quality_confidence(0.3, 0.9, True, cfg) == pytest.approx(0.7)
    assert quality_confidence(0.8, 0.9, True, cfg) == pytest.approx(0.95)
    mid = quality_confidence(0.55, 0.9, True, cfg)
    assert 0.7 < mid < 0.95
    assert mid == pytest.approx(0.7 + 0.15 * 0.833)


@pytest.mark.slow
def test_embedding_adaptive_digest(spark, site_dir, tmp_path):
    """Digest loop over a real crawl with a deterministic fake embedder."""
    from crawl4ai_custom_spark.operators.adaptive_session import (
        embedding_adaptive_crawl,
    )
    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig, FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, max_pages=60,
                      politeness=PolitenessConfig(wave_seconds=1e9),
                      use_bloom=False, check_robots=False)
    eng = FrontierEngine(spark, pages, None, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))

    dims = 8
    queries = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(dims)]) for i in range(6)],
        ["query_id", "embedding"],
    )

    def embed_results(results):
        # deterministic fake embedder: hash-bucketed unit vector per url
        return results.select(
            F.col("url").alias("doc_id"),
            F.array(*[
                F.when(F.pmod(F.xxhash64("url"), dims) == j, 1.0)
                .otherwise(0.0) for j in range(dims)
            ]).alias("embedding"),
        )

    res = embedding_adaptive_crawl(
        eng, ["https://mega.example-shop.com/"], queries, embed_results,
        max_total_waves=3,
    )
    assert res.waves >= 1 and res.pages > 0
    assert res.kb_docs >= 1
    assert 0.0 <= res.confidence <= 1.0
    assert 0.0 <= res.quality <= 1.0
    assert res.stopped_reason
    assert len(res.confidence_history) >= 1
    # the fake embedder emits only `dims` distinct vectors; the 0.95 dedup
    # filter screens every wave's batch against the accumulated KB, so the
    # KB must stay far below the page count (intra-batch duplicates are
    # allowed — the reference checks new docs against the batch-START KB
    # only, adaptive_crawler.py:1243-1262)
    assert res.kb_docs < res.pages


def test_max_sim_ivf_path_matches_broadcast_on_clustered_kb(spark):
    """The IVF-bucketed KB join (the growth path past KB_BROADCAST_ROWS)
    must agree with the exact nested-loop path on a well-clustered KB, and
    its plan must be a real equi-join, not a nested loop."""
    import numpy as np

    from crawl4ai_custom_spark.operators.adaptive_embedding import _max_sim_to_kb

    rng = np.random.default_rng(7)
    # KB: 3 tight clusters around orthogonal axes (64 rows)
    kb_rows = []
    for i in range(64):
        axis = i % 3
        v = rng.normal(0, 0.015, 4)
        v[axis] += 1.0
        kb_rows.append((v / np.linalg.norm(v)).tolist())
    kb = spark.createDataFrame([(r,) for r in kb_rows], "dv array<double>")
    # probes: near each axis plus one far direction
    probes = [
        (0, [1.0, 0.02, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.03, 0.0]),
        (2, [0.01, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(probes, "id int, v array<double>")

    exact = _max_sim_to_kb(vecs, kb, broadcast_rows=10_000)
    ivf = _max_sim_to_kb(
        vecs, kb, broadcast_rows=0, n_centroids=12, nprobe=6
    )
    got_e = {r["id"]: r["max_sim"] for r in exact.collect()}
    got_i = {r["id"]: r["max_sim"] for r in ivf.collect()}
    assert set(got_e) == set(got_i)
    for k in got_e:
        assert got_i[k] == pytest.approx(got_e[k], abs=1e-9)

    plan_ivf = ivf._jdf.queryExecution().executedPlan().toString()
    plan_exact = exact._jdf.queryExecution().executedPlan().toString()
    assert (
        "BroadcastNestedLoopJoin" in plan_exact
        or "CartesianProduct" in plan_exact
    )
    # the KB side joins on `bucket` — a hash/sort-merge equi-join
    assert (
        "SortMergeJoin" in plan_ivf
        or "ShuffledHashJoin" in plan_ivf
        or "BroadcastHashJoin" in plan_ivf
    ), plan_ivf


def test_kb_dedup_filter_ivf_equivalence(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    kb_rows = []
    for i in range(60):
        axis = i % 2
        v = rng.normal(0, 0.01, 3)
        v[axis] += 1.0
        kb_rows.append((v / np.linalg.norm(v)).tolist())
    kb = spark.createDataFrame([(r,) for r in kb_rows], "embedding array<double>")
    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.001, 0.0]),   # duplicate of cluster 0
            (2, [0.0, 0.0, 1.0]),     # genuinely new
        ],
        "doc_id int, embedding array<double>",
    )
    a = kb_dedup_filter(docs, kb, threshold=0.95)
    b = kb_dedup_filter(docs, kb, threshold=0.95, broadcast_rows=0)
    assert sorted(r["doc_id"] for r in a.collect()) == [2]
    assert sorted(r["doc_id"] for r in b.collect()) == [2]
