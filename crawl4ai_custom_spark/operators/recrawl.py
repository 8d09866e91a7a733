"""Incremental re-crawl: diff two crawl captures and schedule revisits.

crawl4ai crawls one URL list per run (arun_many); a production crawl is a
LOOP over captures of the same web — each epoch must know what appeared,
changed, or vanished since the last one, and spend its politeness budget on
the URLs most likely to have changed. Both steps as pure dataflow:

  crawl_diff       full-outer join of two captures on url_canon, change
                   class from content-fingerprint comparison:
                   'new' | 'changed' | 'unchanged' | 'gone'
  revisit_priority change-frequency estimator: observed change ratio over
                   the last k epochs, Laplace-smoothed, blended with page
                   score — the classic freshness-driven scheduling signal
                   (Cho & Garcia-Molina, "Effective Page Refresh Policies";
                   public literature).

Scale shape: one co-partitioned equi-join per diff (both sides keyed by
url_canon — bucketed capture tables make it shuffle-free, same layout as
the seen set); revisit_priority is a groupBy over the change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capture_fingerprint(pages: DataFrame, url_col: str = "url",
                        content_col: str = "html") -> DataFrame:
    """(url, fingerprint) for one capture — md5 over raw bytes/text."""
    c = F.col(content_col)
    fp = F.md5(F.when(c.isNull(), F.lit("")).otherwise(c.cast("string")))
    return pages.select(F.col(url_col).alias("url"), fp.alias("fingerprint"))


def crawl_diff(old: DataFrame, new: DataFrame, url_col: str = "url",
               fp_col: str = "fingerprint") -> DataFrame:
    """Two (url, fingerprint) captures -> (url, change) with change in
    {'new','changed','unchanged','gone'}."""
    o = old.select(F.col(url_col).alias("url"),
                   F.col(fp_col).alias("fp_old"))
    n = new.select(F.col(url_col).alias("url"),
                   F.col(fp_col).alias("fp_new"))
    j = o.join(n, "url", "full_outer")
    change = (
        F.when(F.col("fp_old").isNull(), F.lit("new"))
        .when(F.col("fp_new").isNull(), F.lit("gone"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", change.alias("change"))


def revisit_priority(change_log: DataFrame, url_col: str = "url",
                     change_col: str = "change",
                     score_col: str | None = None,
                     alpha: float = 1.0, beta: float = 2.0,
                     blend: float = 0.7) -> DataFrame:
    """Change log rows (url, change[, score]) over k epochs ->
    (url, n_obs, n_changed, change_rate, revisit_score).

    change_rate = (n_changed + alpha) / (n_obs + alpha + beta) — Laplace /
    Beta(alpha, beta) smoothing so single-epoch URLs don't saturate.
    revisit_score = blend * change_rate + (1-blend) * avg(score) when a page
    score column is present, else change_rate. 'gone' rows are excluded from
    the observation count (they leave the frontier instead)."""
    obs = change_log.where(F.col(change_col) != "gone")
    aggs = [
        F.count(F.lit(1)).alias("n_obs"),
        F.sum((F.col(change_col) == "changed").cast("int")).alias("n_changed"),
    ]
    if score_col is not None:
        aggs.append(F.avg(score_col).alias("avg_score"))
    g = obs.groupBy(F.col(url_col).alias("url")).agg(*aggs)
    rate = (F.col("n_changed") + F.lit(alpha)) / (
        F.col("n_obs") + F.lit(alpha + beta)
    )
    g = g.withColumn("change_rate", rate)
    if score_col is not None:
        g = g.withColumn(
            "revisit_score",
            F.lit(blend) * F.col("change_rate")
            + F.lit(1.0 - blend) * F.coalesce("avg_score", F.lit(0.0)),
        ).drop("avg_score")
    else:
        g = g.withColumn("revisit_score", F.col("change_rate"))
    return g


def sitemap_revisit_candidates(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    fetched_col: str = "fetch_time",
) -> DataFrame:
    """URLs whose sitemap <lastmod> postdates our stored capture — the
    sitemap-protocol push signal for re-crawl scheduling, complementing
    :func:`revisit_priority`'s observed-change-rate pull signal.

    entries: ``sources.sitemap.sitemap_page_entries`` output (needs loc,
    lastmod_ts; entries without a parseable lastmod never nominate).
    crawled: one row per stored url with its capture time.
    Returns (url, fetched, lastmod_ts) for stale captures — feed into
    ``FrontierEngine.requeue`` (canonicalize first; sitemap locs are raw).

    Shape: lastmod entries aggregate per loc (sitemaps are tiny next to
    the capture store) then ONE equi-join against the crawled table keyed
    by url — bucketed captures make it shuffle-free on the big side."""
    e = (
        entries.where(F.col("lastmod_ts").isNotNull())
        .groupBy(F.col("loc").alias(url_col))
        .agg(F.max("lastmod_ts").alias("lastmod_ts"))
    )
    return (
        crawled.select(F.col(url_col), F.col(fetched_col).alias("fetched"))
        .join(e, url_col)
        .where(F.col("lastmod_ts") > F.col("fetched"))
        .select(url_col, "fetched", "lastmod_ts")
    )


def sitemap_coverage(sitemap_urls: DataFrame, crawled: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Crawl-coverage audit per host: of the URLs a site DECLARES (its
    sitemaps), how many did the crawl actually reach, and how much of the
    crawl was orphan pages the sitemap never mentioned? The two numbers
    drive opposite knobs — low coverage means the politeness budget or
    depth limit starved the host; a high orphan fraction means link
    discovery is finding content the site forgot to declare (or a trap).

    Returns one row per host:
      n_sitemap, n_crawled, n_both,
      coverage     = n_both / n_sitemap   (0.0 when the host declares none)
      orphan_frac  = (n_crawled - n_both) / n_crawled  (0.0 when uncrawled)

    Scale shape: two distinct projections + ONE full-outer equi-join on
    the url (both sides keyed identically — bucketed capture tables make
    it shuffle-free), then a single host rollup with map-side partials."""
    from .urlops import url_host

    s = sitemap_urls.select(F.col(url_col).alias("u")).distinct() \
        .withColumn("_in_sitemap", F.lit(1))
    c = crawled.select(F.col(url_col).alias("u")).distinct() \
        .withColumn("_in_crawl", F.lit(1))
    joined = s.join(c, "u", "full")
    return (
        joined.groupBy(url_host(F.col("u")).alias("host"))
        .agg(
            F.sum(F.coalesce("_in_sitemap", F.lit(0))).alias("n_sitemap"),
            F.sum(F.coalesce("_in_crawl", F.lit(0))).alias("n_crawled"),
            F.sum(F.coalesce("_in_sitemap", F.lit(0))
                  * F.coalesce("_in_crawl", F.lit(0))).alias("n_both"),
        )
        .withColumn(
            "coverage",
            F.when(F.col("n_sitemap") > 0,
                   F.round(F.col("n_both") / F.col("n_sitemap") + 1e-9, 6))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "orphan_frac",
            F.when(F.col("n_crawled") > 0,
                   F.round((F.col("n_crawled") - F.col("n_both"))
                           / F.col("n_crawled") + 1e-9, 6))
            .otherwise(F.lit(0.0)),
        )
    )
