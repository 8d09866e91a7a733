"""Recall@k of the bucketed/quantized ANN paths vs the brute-force oracle.

The ANN operators are oracled for exactness GIVEN their buckets; this
script measures what the bucketing itself costs in recall as n grows, so
the defaults (n_planes, nprobe, m/n_codes) are evidence-backed before a
100x scale-up. Run on an idle box:

    python scripts/ann_recall.py            # sf0.01 + sf0.1

Prints one JSON line per (sf, method); paste into BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 10
N_QUERIES = 40


def recall_of(approx, brute) -> float:
    hits = approx.select("query_id", "neighbor_id").intersect(
        brute.select("query_id", "neighbor_id")).count()
    return hits / brute.count()


def clustered_vectors(spark, n: int = 2000, dim: int = 64,
                      n_clusters: int = 16, noise: float = 0.35):
    """Deterministic clustered corpus — the geometry real text embeddings
    have (topical clusters), which the isotropic testdata vectors lack.
    center[c][d] and noise[i][d] from md5 streams; point = center + noise."""
    import hashlib

    import numpy as np
    import pandas as pd

    def h(*parts) -> float:
        raw = hashlib.md5(":".join(map(str, parts)).encode()).hexdigest()
        return int(raw[:8], 16) / 0xFFFFFFFF * 2.0 - 1.0

    centers = np.array(
        [[h("c", c, d) for d in range(dim)] for c in range(n_clusters)])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + noise * np.array([h("n", i, d) for d in range(dim)])
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        schema="vec_id long, embedding array<double>")


def planted_dup_corpus(emb, frac_dup_mod: int = 10, eps: float = 0.02):
    """Corpus + near-identical copies of every ``frac_dup_mod``-th vector
    (id + 10^6): ground-truth near-dup pairs for the bucketed dedup path."""
    base = emb.select("vec_id", "embedding")
    dup = base.where(F.col("vec_id") % frac_dup_mod == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.lit(eps) * F.sin(F.col("vec_id") + i),
        ).alias("embedding"),
    )
    return base.unionByName(dup)


def measure_topk(emb, queries, label, out):
    from crawl4ai_custom_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )

    n = emb.count()
    brute = brute_force_topk(emb, queries, k=K).persist()
    brute.count()
    for method, fn in [
        ("lsh(n_planes=3)", lambda: lsh_topk(emb, queries, k=K, n_planes=3)),
        ("lsh(n_planes=6)", lambda: lsh_topk(emb, queries, k=K, n_planes=6)),
        ("ivf(8,nprobe=2)",
         lambda: ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=2)),
        ("ivf(8,nprobe=4)",
         lambda: ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=4)),
        ("ivf(8,nprobe=6)",
         lambda: ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=6)),
        ("pq(m=16,n_codes=64)",
         lambda: pq_topk(emb, queries, k=K, m=16, n_codes=64)),
        ("ivfpq(m=16,n_codes=64,nprobe=4)",
         lambda: ivfpq_topk(emb, queries, k=K, m=16, n_codes=64,
                            n_centroids=8, nprobe=4)),
    ]:
        r = recall_of(fn(), brute)
        out.append({"corpus": label, "n": n, "k": K, "method": method,
                    "recall": round(r, 4)})
        print(json.dumps(out[-1]))

    # graph path: NN-Descent graph quality + beam-search query recall.
    # Entry points must span the corpus's clusters (operator docstring);
    # 16 smallest ids cover the 16 round-robin fixture clusters.
    from crawl4ai_custom_spark.operators.nndescent import (
        graph_ann_search, nn_descent)

    bknn = brute_force_topk(emb, emb, k=K).persist()
    n_bknn = bknn.count()
    for rounds in (1, 2):
        graph = nn_descent(emb, k=K, rounds=rounds, n_planes=4).persist()
        graph.count()
        ghits = graph.select("id", "nbr").intersect(
            bknn.selectExpr("query_id as id", "neighbor_id as nbr")).count()
        out.append({"corpus": label, "n": n, "k": K,
                    "method": f"nn_descent_graph(rounds={rounds})",
                    "recall": round(ghits / n_bknn, 4)})
        print(json.dumps(out[-1]))
        r = recall_of(graph_ann_search(
            graph, emb, queries, k=K, beam=2 * K, rounds=3, n_entry=16),
            brute)
        out.append({"corpus": label, "n": n, "k": K,
                    "method": f"graph_ann(rounds={rounds},beam={2*K})",
                    "recall": round(r, 4)})
        print(json.dumps(out[-1]))
        graph.unpersist()
    bknn.unpersist()
    brute.unpersist()


def main() -> None:
    from crawl4ai_custom_spark.operators.dedup import embedding_cosine_dedup
    from crawl4ai_custom_spark.operators.similarity import (
        data_hyperplanes,
        hyperplane_bucket,
    )
    from crawl4ai_custom_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[8]", shuffle_partitions=8)
    out: list[dict] = []

    # isotropic corpus (the testdata embeddings): the ANN worst case —
    # no cluster structure to exploit, recall ~= probed fraction
    iso = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    measure_topk(iso, iso.where(F.col("vec_id") < N_QUERIES),
                 "isotropic(testdata sf0.1)", out)

    # clustered corpus: the geometry production embeddings actually have
    clu = clustered_vectors(spark).persist()
    clu.count()
    measure_topk(clu, clu.where(F.col("vec_id") < N_QUERIES),
                 "clustered(16 topics)", out)

    # bucketed near-dup pair recall on planted near-identical copies
    for label, base in (("isotropic", iso), ("clustered", clu)):
        corpus = planted_dup_corpus(base).persist()
        planes = data_hyperplanes(corpus, 6)
        bucketed = embedding_cosine_dedup(
            hyperplane_bucket(corpus, planes), threshold=0.95,
            bucket_col=F.col("bucket"))
        exact = embedding_cosine_dedup(corpus, threshold=0.95,
                                       all_pairs=True)
        npairs = exact.count()
        hits = bucketed.select("id_a", "id_b").intersect(
            exact.select("id_a", "id_b")).count()
        out.append({"corpus": label, "method": "neardup_bucketed(t=0.95)",
                    "pairs_exact": npairs,
                    "pair_recall": round(hits / max(npairs, 1), 4)})
        print(json.dumps(out[-1]))
        multi = embedding_cosine_dedup(
            hyperplane_bucket(corpus, planes), threshold=0.95,
            bucket_col=F.col("bucket"), multiprobe_planes=6)
        mhits = multi.select("id_a", "id_b").intersect(
            exact.select("id_a", "id_b")).count()
        out.append({"corpus": label,
                    "method": "neardup_bucketed_multiprobe(t=0.95)",
                    "pairs_exact": npairs,
                    "pair_recall": round(mhits / max(npairs, 1), 4)})
        print(json.dumps(out[-1]))
        corpus.unpersist()
    clu.unpersist()


if __name__ == "__main__":
    main()
