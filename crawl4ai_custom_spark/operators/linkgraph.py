"""Link-graph analytics: host graph construction + PageRank.

The reference scores domains with a static heuristic
(DomainAuthorityScorer, deep_crawling/scorers.py); at corpus scale the
principled version of "domain authority" is PageRank over the host graph —
the classic web-scale iterative dataflow. Implemented the way the engine
runs all its iterative ops (frontier waves, cluster_pairs): each power
iteration is one join + one groupBy, with optional parquet materialization
per round so the plan never grows with iteration count.

Semantics (simplified PageRank, the common formulation):
  rank_0(v)   = 1/N
  rank_i+1(v) = (1-d)/N + d * sum over in-edges (u,v) of rank_i(u)/deg(u)
Dangling-node mass is dropped (not redistributed) — both the operator and
the DuckDB oracle (`q_pagerank`) implement exactly this, so results match
to fixed rounding.

Scale shape: edges shuffle once per iteration keyed by src then dst — the
standard PageRank-on-MapReduce pattern; ranks and degrees are (node, value)
tables that co-partition with the join keys. No driver-side state beyond
the node count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_edges(links: DataFrame, src_url: str = "url",
               dst_url: str = "href") -> DataFrame:
    """(page url, link href) -> distinct (src_host, dst_host) edges,
    self-loops dropped — the host-graph input to pagerank."""
    host = lambda c: F.lower(F.regexp_extract(F.col(c), r"https?://([^/:]+)", 1))  # noqa: E731
    return (
        links.select(host(src_url).alias("src"), host(dst_url).alias("dst"))
        .where((F.col("src") != "") & (F.col("dst") != "")
               & (F.col("src") != F.col("dst")))
        .distinct()
    )


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             checkpoint_dir: str | None = None) -> DataFrame:
    """(src, dst) edges -> (node, rank) after `iterations` power steps.

    Pass checkpoint_dir to materialize ranks each round (mandatory for
    double-digit iteration counts: truncates lineage like cluster_pairs)."""
    import os

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0)))
            .alias("rank"),
        )
        if checkpoint_dir is not None:
            out = os.path.join(checkpoint_dir, f"ranks_{it % 2}")
            ranks.write.mode("overwrite").parquet(out)
            ranks = spark.read.parquet(out)
    return ranks


def pagerank_authority(ranks: DataFrame, top_n: int = 1000,
                       floor: float = 0.1) -> dict[str, float]:
    """Top-N hosts by rank -> {host: weight in [floor, 1]}, max-normalized —
    plugs straight into `CrawlConfig.domain_authority` /
    `scorers.domain_authority_score`, replacing the reference's hand-tuned
    static map with measured link authority.

    Bounded collect (top_n rows after a distributed top-k) — the production
    shape: a small broadcastable authority map refreshed per crawl epoch."""
    top = ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(top_n).collect()
    if not top:
        return {}
    mx = max(r["rank"] for r in top) or 1.0
    return {r["node"]: max(floor, r["rank"] / mx) for r in top}


def anchor_text_stats(links: DataFrame, href_col: str = "href",
                      text_col: str = "text", top_n: int = 3) -> DataFrame:
    """Per-target anchor-text aggregation — the classic incoming-link
    relevance signal (how the web describes a page): for every link target,
    the number of incoming links, distinct anchor texts, and the top-N
    anchors by count (count desc, text asc), joined as one string.

    Shape: two keyed groupBys + one window over the (already aggregated)
    per-(href, text) counts — never over raw links.
    """
    per = (
        links.select(F.col(href_col).alias("href"),
                     F.trim(F.col(text_col)).alias("anchor"))
        .where(F.col("anchor") != "")
        .groupBy("href", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("href").orderBy(F.desc("n"), F.asc("anchor"))
    top = (
        per.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_n)
        .groupBy("href")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "anchor"))),
                    lambda s: s["anchor"],
                ),
                "|",
            ).alias("top_anchors")
        )
    )
    totals = per.groupBy("href").agg(
        F.sum("n").alias("n_incoming"),
        F.count(F.lit(1)).alias("n_unique_anchors"),
    )
    return totals.join(top, "href")


def host_outdegree_stats(links: DataFrame, src_url: str = "url",
                         dst_url: str = "href") -> DataFrame:
    """Per-source-host outlink profile: total outlinks, distinct target
    hosts, external fraction — the classic link-farm/spam signal (a host
    spraying links at thousands of distinct external hosts is not a
    content site). One groupBy on the source host."""
    host = lambda c: F.lower(F.regexp_extract(F.col(c), r"https?://([^/:]+)", 1))  # noqa: E731
    e = links.select(host(src_url).alias("src_host"),
                     host(dst_url).alias("dst_host"))
    e = e.where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return e.groupBy("src_host").agg(
        F.count(F.lit(1)).alias("n_outlinks"),
        F.countDistinct("dst_host").alias("n_distinct_hosts"),
        F.round(
            F.avg((F.col("dst_host") != F.col("src_host")).cast("double"))
            + 1e-9, 6,
        ).alias("external_frac"),
    )
