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

Round 5 completes the freshness family with the two published scheduling
results the naive ratio misses:

  change_rate_poisson  the Cho & Garcia-Molina 2003 ("Estimating Frequency
                       of Change") Poisson-rate estimator over a visit
                       log — the naive X/n ratio UNDERCOUNTS because any
                       number of changes between two visits is observed as
                       one; λ̂ = -ln((n-X+0.5)/(n+0.5)) / Ī corrects it.
  refresh_allocation   optimal division of a global refresh budget across
                       pages given λ̂ — under the memoryless-refresh
                       staleness model E[stale] = λ/(λ+f) the optimum is
                       closed-form water-filling f = max(0, √λ·t − λ),
                       which reproduces Cho & G-M 2000's famous
                       non-proportional result: the hottest pages get
                       ABANDONED (f = 0), not crawled hardest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capture_timeline(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """CDX-style capture-timeline digest dedup (the Common Crawl / web-
    archive convention: a URL's capture history is stored once per
    CONTENT VERSION, not once per fetch). Per url, captures are ordered
    by (ts, digest) and runs of identical consecutive digests collapse to
    one version row:

      (url, version, digest, valid_from, last_seen, n_captures)

    ``version`` is 1-based in timeline order; ``valid_from`` is the first
    capture of the run, ``last_seen`` the last, ``n_captures`` the run
    length. Re-fetches that found the page unchanged cost storage in the
    raw capture log but carry no information — at 10^10 urls x monthly
    captures the collapsed timeline is the table every freshness operator
    should read (``change_rate_poisson``'s visit log, ``revisit_priority``,
    diffing), typically 5-20x smaller.

    Scale shape: two windows + one groupBy, all partitioned by url — the
    per-url capture count is bounded (crawl cadence), the url dimension
    distributes. Null digests participate as empty-string (a fetch error
    is itself an observable version). Reference parity: crawl4ai caches
    single captures (`async_database.py` url cache); the timeline is that
    cache's history axis at archive scale."""
    d = F.coalesce(F.col(digest_col).cast("string"), F.lit(""))
    rows = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("cap_ts"),
        d.alias("digest"),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("cap_ts").asc(), F.col("digest").asc())
    prev = F.lag("digest").over(w)
    marked = rows.withColumn(
        "is_change",
        F.when(prev.isNull() | (F.col("digest") != prev), F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "version",
        F.sum("is_change").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # within one (url, version) group every digest is identical by
    # construction (version increments exactly when the digest changes),
    # so first() is order-independent here
    return marked.groupBy("url", "version").agg(
        F.first("digest").alias("digest"),
        F.min("cap_ts").alias("valid_from"),
        F.max("cap_ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_captures"),
    )


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


def change_rate_poisson(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
    as_of: float | None = None,
) -> DataFrame:
    """Poisson change-rate estimator over a visit log (Cho &
    Garcia-Molina 2003, "Estimating Frequency of Change"; reference
    parity: the adaptive re-crawl loop of adaptive_crawler.py, lifted to
    a principled per-URL rate).

    Input rows: one per (url, visit) with ``ts`` in epoch SECONDS
    (double) and the content ``fingerprint`` observed at that visit.
    The naive ratio X/n (changed intervals over intervals) is biased low
    — k changes inside one interval are observed as one — so the
    estimator is

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / mean_interval

    (the paper's bias-corrected MLE with the +0.5 continuity guard that
    keeps X = n finite). X = 0 yields exactly 0.0 — a never-changing
    page, never due.

    Returns one row per url:
      n_visits, n_changes, last_ts,
      mean_interval_s  (null for single-visit urls),
      lambda_hat       (changes/second; null when n_visits < 2 or all
                        visits share one timestamp),
      next_due_ts      (last_ts + 1/lambda_hat; null when rate is 0/null),
      stale_prob       (only when ``as_of`` given: P[changed by as_of] =
                        1 - exp(-lambda_hat * (as_of - last_ts))).

    Scale shape: ONE partial-agg groupBy(url) collecting the per-URL
    visit history (bounded by the epoch count — tens of structs, never
    corpus-scale), then pure array-fold projections: no window over the
    visit stream, no second shuffle."""
    hist = visits.groupBy(F.col(url_col).alias("url")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).cast("double").alias("ts"),
                         F.col(fp_col).cast("string").alias("fp"))
            )
        ).alias("v")
    )
    n_visits = F.size("v")
    n = (n_visits - F.lit(1)).cast("double")
    prev = F.slice("v", F.lit(1), n_visits - 1)
    curr = F.slice("v", F.lit(2), n_visits - 1)
    n_changes = F.aggregate(
        F.zip_with(prev, curr,
                   lambda a, b: (a["fp"] != b["fp"]).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    last_ts = F.element_at("v", -1)["ts"]
    span = last_ts - F.element_at("v", 1)["ts"]
    mean_interval = F.when((n > 0) & (span > 0), span / n)
    lam = -F.log((n - n_changes + F.lit(0.5)) / (n + F.lit(0.5))) \
        / mean_interval
    out = hist.select(
        "url",
        n_visits.alias("n_visits"),
        n_changes.alias("n_changes"),
        last_ts.alias("last_ts"),
        mean_interval.alias("mean_interval_s"),
        lam.alias("lambda_hat"),
        F.when(lam > 0, last_ts + F.lit(1.0) / lam).alias("next_due_ts"),
    )
    if as_of is not None:
        out = out.withColumn(
            "stale_prob",
            F.when(
                F.col("lambda_hat").isNotNull(),
                # floored at 0: a visit newer than as_of (epoch-boundary
                # cutoffs, clock skew) makes the exponent positive and the
                # raw expression negative — not a probability
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.exp(
                        -F.col("lambda_hat") * (F.lit(float(as_of))
                                                - F.col("last_ts"))
                    ),
                ),
            ),
        )
    return out


def refresh_allocation(
    rates: DataFrame,
    budget: float,
    lam_col: str = "lambda_hat",
    decimals: int = 9,
) -> DataFrame:
    """Optimal refresh-frequency allocation under a global budget — the
    freshness water-filling that makes Cho & Garcia-Molina 2000's point
    ("it is NOT optimal to refresh proportionally to change rate")
    executable at corpus scale.

    Model: memoryless refresh at rate f against Poisson changes at rate
    lambda gives steady-state staleness E[stale] = lambda/(lambda+f).
    Minimizing sum staleness subject to sum(f) = budget has the KKT
    closed form

        f_i = max(0, sqrt(lambda_i) * t - lambda_i)

    with a single global water level t: pages activate iff
    sqrt(lambda_i) < t, so the HOTTEST pages get f = 0 (abandoned — you
    can never keep them fresh, spend elsewhere) and cold pages get the
    most headroom relative to their rate.

    The water level comes from the sorted prefix condition
    t_k = (budget + sum_{<=k} c*lambda) / sum_{<=k} c*sqrt(lambda) over
    lambda-buckets; exactly one prefix satisfies
    sqrt(lambda_k) < t_k <= sqrt(lambda_{k+1}).

    Scale shape (the token_budget_select pattern): lambda quantizes to
    ``decimals`` — a scan projection — then ONE partial-agg groupBy over
    the corpus builds the bucket table; the cumulative window + water
    solve run over that TINY table (distinct rounded rates, never docs);
    the one-row water level broadcasts back. rows with lambda null/<=0
    keep f_opt = 0 (never-changing pages need no refresh).

    Returns the input plus ``lam_q`` (the quantized rate the solve used),
    ``f_opt`` (refreshes/second) and ``stale_frac`` = lam/(lam+f)."""
    lam_q = F.when(
        F.col(lam_col).isNotNull() & (F.col(lam_col) > 0),
        F.round(F.col(lam_col), decimals),
    ).otherwise(F.lit(0.0))
    r = rates.withColumn("lam_q", lam_q)
    buckets = (
        r.where(F.col("lam_q") > 0)
        .groupBy("lam_q").agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = Window.orderBy("lam_q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    nxt = Window.orderBy("lam_q")
    b = buckets.select(
        "lam_q",
        F.sum(F.col("cnt") * F.col("lam_q")).over(cum).alias("cum_lam"),
        F.sum(F.col("cnt") * F.sqrt("lam_q")).over(cum).alias("cum_rt"),
        F.lead("lam_q").over(nxt).alias("nxt"),
    ).withColumn("t", (F.lit(float(budget)) + F.col("cum_lam"))
                 / F.col("cum_rt"))
    level = (
        b.where(
            (F.col("t") > F.sqrt("lam_q"))
            & (F.col("nxt").isNull() | (F.col("t") <= F.sqrt("nxt")))
        )
        .agg(F.min("t").alias("_t"))
    )
    out = r.crossJoin(F.broadcast(level))
    f_opt = F.when(
        F.col("lam_q") > 0,
        F.greatest(
            F.lit(0.0),
            F.sqrt("lam_q") * F.coalesce("_t", F.lit(0.0)) - F.col("lam_q"),
        ),
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("f_opt", f_opt)
        .withColumn(
            "stale_frac",
            F.when(F.col("lam_q") > 0,
                   F.col("lam_q") / (F.col("lam_q") + F.col("f_opt")))
            .otherwise(F.lit(0.0)),
        )
        .drop("_t")
    )


def ucb_host_allocation(history: DataFrame, k: int,
                        host_col: str = "host",
                        pulls_col: str = "n_fetches",
                        reward_col: str = "reward_sum",
                        c: float = 1.0) -> DataFrame:
    """UCB1 bandit selection of the next wave's hosts (Auer, Cesa-Bianchi
    & Fischer 2002, public paper) — the explore/exploit answer to "which
    hosts deserve frontier budget": hosts that historically yield (new
    links, changed pages — whatever the caller books as reward per fetch)
    get exploited, rarely-fetched hosts keep an exploration bonus that
    grows with total experience,

        ucb = reward_sum / n  +  c * sqrt(2 * ln(N) / n)

    with N = total fetches across all hosts. Never-fetched hosts (n = 0
    or null) rank FIRST (infinite bonus), ordered by host for
    determinism — the optimistic-initialization rule that makes UCB1
    sample every arm once.

    Shape: one one-row total agg broadcast back, a scan projection for
    the scores, then a global top-k that Spark executes as
    TakeOrderedAndProject (per-partition top-k + driver merge of k rows —
    no full sort at 10^8 hosts). Returns the k chosen rows:
    (host, n_fetches, mean_reward, ucb_score, explored)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n = F.coalesce(F.col(pulls_col).cast("double"), F.lit(0.0))
    tot = history.agg(
        F.sum(n).alias("_N")).select(
        F.greatest(F.col("_N"), F.lit(1.0)).alias("_N"))
    mean = F.col(reward_col).cast("double") / n
    bonus = F.lit(float(c)) * F.sqrt(2.0 * F.log(F.col("_N")) / n)
    scored = (
        history.crossJoin(F.broadcast(tot))
        .select(
            F.col(host_col).alias("host"),
            n.cast("bigint").alias("n_fetches"),
            F.when(n > 0, mean).alias("mean_reward"),
            F.when(n > 0, mean + bonus).alias("ucb_score"),
            (n > 0).alias("explored"),
        )
    )
    return (
        scored
        .orderBy(F.col("explored").asc(),          # unexplored first
                 # nulls LAST within the explored group: an explored host
                 # with a NULL reward (malformed history row) must not
                 # outrank genuinely-scored hosts; the unexplored group is
                 # already segregated by the explored key, so it does not
                 # need nulls-first here
                 F.col("ucb_score").desc_nulls_last(),
                 F.col("host").asc())
        .limit(k)
    )


def good_turing_saturation(
        observations: DataFrame, key_col: str,
        group_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Good-Turing frontier-saturation estimate: per group (host,
    template family, wave...), the probability that the NEXT observation
    is a never-seen key is estimated by the singleton fraction

        unseen_mass = f1 / N        (Good 1953; Gale & Sampson 1995)

    with f1 = keys seen exactly once and N = total observations.
    coverage = 1 - unseen_mass is the Turing estimate of how much of the
    host's key distribution the crawl has already captured — the
    principled "stop crawling this host" signal the adaptive crawler's
    saturation confidence approximates with consistency heuristics, and
    the per-host complement to the corpus-wide Heaps'-law fit
    (textstats.heaps_fit answers "how fast is GLOBAL vocabulary still
    growing", this answers "is THIS host's key space exhausted").

    Shape: two partial-agg groupBys — (group, key) counts, then the
    group fold — both map-side combinable, no windows, no state beyond
    the aggregates. Returns (group..., n_obs, n_distinct, f1,
    unseen_mass, coverage)."""
    gcols = list(group_cols)
    per_key = observations.groupBy(
        *gcols, F.col(key_col).alias("_k")
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_key.groupBy(*gcols).agg(
        F.sum("_c").alias("n_obs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("_c") == 1).cast("bigint")).alias("f1"),
    )
    um = F.col("f1").cast("double") / F.col("n_obs")
    return agg.select(
        *gcols, "n_obs", "n_distinct", "f1",
        um.alias("unseen_mass"),
        (1.0 - um).alias("coverage"),
    )
