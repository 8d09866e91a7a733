"""Frontier engine tests: BFS oracle equivalence, politeness budgets, robots
gating, best-first batching, determinism, checkpoint resume.
"""

import duckdb
import pyspark.sql.functions as F
import pytest

from crawl4ai_custom_spark.operators.frontier import CrawlConfig, FrontierEngine
from crawl4ai_custom_spark.operators.politeness import PolitenessConfig
from tests.oracle_crawler import oracle_bfs

SEEDS = [
    "https://mega.example-shop.com/",
    "https://shop1.example1.com/",
    "https://mega.example-shop.com/missing/seed-404",  # guaranteed fetch-miss
]


def _rows(site_dir, name):
    return duckdb.sql(f"select * from '{site_dir}/{name}.parquet'").df().to_dict("records")


@pytest.fixture(scope="module")
def pages_df(spark, site_dir):
    return spark.read.parquet(f"{site_dir}/pages.parquet")


@pytest.fixture(scope="module")
def robots_df(spark, site_dir):
    return spark.read.parquet(f"{site_dir}/robots.parquet")


@pytest.fixture(scope="module")
def bfs_run(spark, site_dir, pages_df, robots_df, tmp_path_factory):
    cfg = CrawlConfig(
        strategy="bfs", max_depth=3, max_pages=500,
        politeness=PolitenessConfig(wave_seconds=1e9),  # generous budget
        use_bloom=True, bloom_partitions=4, bloom_min_seen=0,
    )
    eng = FrontierEngine(
        spark, pages_df, robots_df, cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_bfs")),
        out_dir=str(tmp_path_factory.mktemp("out_bfs")),
    )
    return eng.run(SEEDS), cfg


def test_bfs_matches_oracle(bfs_run, spark, site_dir):
    run, cfg = bfs_run
    oracle = oracle_bfs(
        SEEDS, _rows(site_dir, "pages"), _rows(site_dir, "robots"),
        max_depth=cfg.max_depth, max_pages=cfg.max_pages,
    )
    admitted = run.admitted_log(spark)
    got_waves = [
        {r["url_canon"] for r in admitted.where(F.col("wave") == w).collect()}
        for w in range(run.waves)
    ]
    got_waves = [w for w in got_waves if w]
    assert len(got_waves) == len(oracle["waves"]), (
        [len(w) for w in got_waves], [len(w) for w in oracle["waves"]]
    )
    for i, (g, o) in enumerate(zip(got_waves, oracle["waves"])):
        assert g == o, f"wave {i}: extra={sorted(g - o)[:5]} missing={sorted(o - g)[:5]}"
    assert run.pages_crawled == oracle["crawled"]


def test_bfs_lineage_per_partition_metrics(bfs_run, spark):
    """North rule: per-partition lineage + fetch/extract metrics — the wave
    snapshot's stats table rolls up to the per-wave admitted counts."""
    run, _ = bfs_run
    lin = run.lineage(spark)
    assert {"wave", "exec_partition", "registrable_domain", "fetched",
            "extracted_ok", "html_bytes", "extract_ms"} <= set(lin.columns)
    per_wave = {
        r["wave"]: (r["fetched"], r["ok"]) for r in lin.groupBy("wave").agg(
            F.sum("fetched").alias("fetched"), F.sum("extracted_ok").alias("ok")
        ).collect()
    }
    for s in run.stats:
        assert per_wave[s["wave"]] == (s["admitted"], s["fetched_ok"])
    # extraction work really is spread across executor partitions
    big_wave = max(run.stats, key=lambda s: s["admitted"])["wave"]
    n_parts = lin.where(F.col("wave") == big_wave).select(
        "exec_partition").distinct().count()
    assert n_parts > 1


def test_bfs_robots_blocked_never_crawled(bfs_run, spark):
    run, _ = bfs_run
    admitted = run.admitted_log(spark)
    assert admitted.where(F.col("url_canon").contains("/private/")).count() == 0


def test_bfs_depth_bounded_and_miss_handling(bfs_run, spark):
    run, cfg = bfs_run
    res = run.results(spark)
    assert res.agg(F.max("depth")).first()[0] <= cfg.max_depth
    # fetch-miss urls are admitted but 404 and produce no links
    misses = res.where(F.col("status_code") == 404)
    assert misses.count() > 0
    assert misses.where(F.size("links") > 0).count() == 0


def test_politeness_budget_respected(spark, pages_df, robots_df, tmp_path):
    pol = PolitenessConfig(base_delay=2.0, wave_seconds=6.0)  # budget = 3/domain
    cfg = CrawlConfig(strategy="bfs", max_depth=2, max_pages=60, politeness=pol,
                      use_bloom=False)
    eng = FrontierEngine(spark, pages_df, robots_df, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    run = eng.run(SEEDS)
    counts = (
        run.admitted_log(spark)
        .groupBy("wave", "registrable_domain")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert counts <= 3
    assert run.pages_crawled <= cfg.max_pages


def test_best_first_batches_and_budget(spark, pages_df, robots_df, tmp_path):
    cfg = CrawlConfig(
        strategy="best_first", batch_size=10, max_depth=3, max_pages=40,
        keywords=("tools", "widget"), politeness=PolitenessConfig(wave_seconds=1e9),
        use_bloom=False,
    )
    eng = FrontierEngine(spark, pages_df, robots_df, cfg,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         out_dir=str(tmp_path / "out"))
    run = eng.run(SEEDS)
    per_wave = run.admitted_log(spark).groupBy("wave").count().collect()
    assert all(r["count"] <= cfg.batch_size for r in per_wave)
    assert run.pages_crawled <= cfg.max_pages
    # scores recorded and ordering column present
    adm = run.admitted_log(spark)
    assert adm.where(F.col("order_in_wave").isNull()).count() == 0


def test_resume_from_checkpoint_equals_uninterrupted(spark, pages_df, robots_df, tmp_path):
    pol = PolitenessConfig(wave_seconds=1e9)
    # interrupted: kill at the wave-2 boundary, then resume
    cfg_a = CrawlConfig(strategy="bfs", max_depth=3, max_pages=60, politeness=pol,
                        use_bloom=False, max_waves=2)
    eng_a = FrontierEngine(spark, pages_df, robots_df, cfg_a,
                           checkpoint_dir=str(tmp_path / "ckpt"),
                           out_dir=str(tmp_path / "out"))
    eng_a.run(SEEDS)
    cfg_b = CrawlConfig(strategy="bfs", max_depth=3, max_pages=60, politeness=pol,
                        use_bloom=False)
    eng_b = FrontierEngine(spark, pages_df, robots_df, cfg_b,
                           checkpoint_dir=str(tmp_path / "ckpt"),
                           out_dir=str(tmp_path / "out"))
    run_b = eng_b.run(SEEDS, resume=True)
    # uninterrupted control
    cfg_c = CrawlConfig(strategy="bfs", max_depth=3, max_pages=60, politeness=pol,
                        use_bloom=False)
    eng_c = FrontierEngine(spark, pages_df, robots_df, cfg_c,
                           checkpoint_dir=str(tmp_path / "ckpt_c"),
                           out_dir=str(tmp_path / "out_c"))
    run_c = eng_c.run(SEEDS)
    got = {r["url_canon"] for r in run_b.admitted_log(spark).collect()}
    want = {r["url_canon"] for r in run_c.admitted_log(spark).collect()}
    assert got == want
    assert run_b.pages_crawled == run_c.pages_crawled


def test_bfs_deterministic(spark, pages_df, robots_df, tmp_path):
    runs = []
    for tag in ("r1", "r2"):
        cfg = CrawlConfig(strategy="bfs", max_depth=2, max_pages=50,
                          politeness=PolitenessConfig(wave_seconds=1e9),
                          use_bloom=True, bloom_partitions=4,
                          bloom_min_seen=0)
        eng = FrontierEngine(spark, pages_df, robots_df, cfg,
                             checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
                             out_dir=str(tmp_path / f"out_{tag}"))
        run = eng.run(SEEDS)
        runs.append(
            sorted(
                (r["wave"], r["url_canon"], r["order_in_wave"])
                for r in run.admitted_log(spark).collect()
            )
        )
    assert runs[0] == runs[1]


def test_link_preview_scoring_prioritizes_matching_heads(spark, tmp_path):
    """Three-tier link scoring (reference link_preview.py): with
    link_preview_scoring on, a link whose target <head> matches the query
    outranks one that doesn't — even though plain tiebreak order (url ASC)
    would admit the other first."""
    import datetime as dt

    def page(url, title, links=()):
        body = "".join(f'<a href="{l}">go</a>' for l in links)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>hello world text here</p>{body}</body></html>"
        ).encode()
        return (url, dt.datetime(2025, 1, 1), html, "", "en")

    pages = spark.createDataFrame(
        [
            page("https://s.com/", "Home", ["/zmatch", "/aplain"]),
            page("https://s.com/zmatch", "quantum flux capacitors"),
            page("https://s.com/aplain", "plain page"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    base = dict(
        strategy="best_first", batch_size=1, max_depth=2, max_pages=10,
        keywords=("quantum", "flux"), check_robots=False, use_bloom=False,
        politeness=PolitenessConfig(wave_seconds=1e9),
    )
    orders = {}
    for flag in (False, True):
        cfg = CrawlConfig(**base, link_preview_scoring=flag)
        eng = FrontierEngine(
            spark, pages, None, cfg,
            checkpoint_dir=str(tmp_path / f"c{flag}"),
            out_dir=str(tmp_path / f"o{flag}"),
        )
        run = eng.run(["https://s.com/"])
        adm = run.admitted_log(spark).orderBy("wave", "order_in_wave").collect()
        orders[flag] = [r["url_canon"] for r in adm]
    on, off = orders[True], orders[False]
    assert on.index("https://s.com/zmatch") < on.index("https://s.com/aplain")
    assert off.index("https://s.com/aplain") < off.index("https://s.com/zmatch")


def test_seen_delta_compaction_preserves_crawl(spark, pages_df, robots_df, tmp_path):
    """Forcing seen-delta compaction every 2 waves yields the identical
    crawl (admitted sets + pages) as the uncompacted layout."""
    runs = {}
    for tag, every in (("default", 64), ("compact", 2)):
        cfg = CrawlConfig(strategy="bfs", max_depth=3, max_pages=200,
                          politeness=PolitenessConfig(wave_seconds=1e9),
                          use_bloom=False, seen_compact_every=every)
        eng = FrontierEngine(spark, pages_df, robots_df, cfg,
                             checkpoint_dir=str(tmp_path / f"c_{tag}"),
                             out_dir=str(tmp_path / f"o_{tag}"))
        run = eng.run(SEEDS)
        runs[tag] = (
            {(r["wave"], r["url_canon"]) for r in run.admitted_log(spark).collect()},
            run.pages_crawled,
        )
    assert runs["default"] == runs["compact"]


def test_respect_crawl_delay_caps_wave_budget(spark, tmp_path):
    """With respect_crawl_delay, a robots-declared Crawl-delay 3 at
    wave_seconds 6 caps the host to 2 admissions per wave (base delay 2
    would have allowed 3); the crawl still completes over more waves."""
    import datetime as dt

    def page(url, links=()):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        html = f"<html><body><p>w w w</p>{body}</body></html>".encode()
        return (url, dt.datetime(2025, 1, 1), html, "", "en", 200)

    kids = [f"/k{i}" for i in range(6)]
    pages = spark.createDataFrame(
        [page("https://s.com/", kids)] + [page(f"https://s.com{k}") for k in kids],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string, status_code int",
    )
    robots = spark.createDataFrame(
        [("s.com", "user-agent: *\ncrawl-delay: 3",
          dt.datetime(2026, 8, 18))],
        "domain string, rules string, fetch_time timestamp",
    )
    for flag, cap in ((True, 2), (False, 3)):
        cfg = CrawlConfig(
            strategy="bfs", max_depth=2, max_pages=100, use_bloom=False,
            respect_crawl_delay=flag,
            politeness=PolitenessConfig(base_delay=2.0, wave_seconds=6.0),
        )
        eng = FrontierEngine(spark, pages, robots, cfg,
                             checkpoint_dir=str(tmp_path / f"c{flag}"),
                             out_dir=str(tmp_path / f"o{flag}"))
        run = eng.run(["https://s.com/"])
        per_wave = (
            run.admitted_log(spark).groupBy("wave").count()
            .agg(F.max("count")).first()[0]
        )
        assert per_wave <= cap, (flag, per_wave)
        assert run.pages_crawled == 7  # delay slows waves, never loses pages


def test_transient_status_retries_with_backoff(spark, tmp_path):
    """429/503 fetches re-enter the frontier with retry_count+1 until
    max_retries (dispatcher parity); 404s never retry; the failing domain's
    delay backs off."""
    import datetime as dt

    def page(url, status, links=()):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        html = f"<html><body><p>w w w</p>{body}</body></html>".encode()
        return (url, dt.datetime(2025, 1, 1), html, "", "en", status)

    pages = spark.createDataFrame(
        [
            page("https://s.com/", 200, ["/ok", "/flaky", "/gone"]),
            page("https://s.com/ok", 200),
            page("https://s.com/flaky", 503),
        ],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string, status_code int",
    )
    cfg = CrawlConfig(
        strategy="bfs", max_depth=2, max_pages=100, check_robots=False,
        use_bloom=False,
        politeness=PolitenessConfig(wave_seconds=1e9, max_retries=2),
    )
    eng = FrontierEngine(spark, pages, None, cfg,
                         checkpoint_dir=str(tmp_path / "c"),
                         out_dir=str(tmp_path / "o"))
    run = eng.run(["https://s.com/"])
    adm = run.admitted_log(spark)
    flaky = adm.where(F.col("url_canon") == "https://s.com/flaky")
    # initial attempt + 2 retries, each in a distinct wave
    assert flaky.count() == 3
    assert flaky.select("wave").distinct().count() == 3
    assert (flaky.agg(F.max("retry_count")).first()[0]
            == cfg.politeness.max_retries)
    # 404 (missing /gone) is permanent: one attempt only
    assert adm.where(F.col("url_canon") == "https://s.com/gone").count() == 1
    # results carry the transient status, never extracted
    res = run.results(spark)
    assert res.where((F.col("url") == "https://s.com/flaky")
                     & (F.col("status_code") == 503)).count() == 3
    assert res.where((F.col("url") == "https://s.com/flaky")
                     & F.col("success")).count() == 0


def test_context_and_authority_change_link_ranking(spark):
    """Item parity with utils.py:3216-3373 + DomainAuthorityScorer wiring:
    (a) parent-page term overlap lifts a matching link above an otherwise
    identical one; (b) cfg.domain_authority reorders the composite."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import CrawlConfig, FrontierEngine

    pages = spark.createDataFrame(
        [("https://x.com/", b"<html></html>", "x")],
        ["url", "html", "lang"],
    ).withColumn("warc_ts", F.current_timestamp())

    def links_df(with_ctx):
        cols = {
            "parent_url": "https://x.com/", "parent_depth": 0, "link_pos": 0,
        }
        rows = [
            ("https://x.com/a.html", "quantum widgets guide", ""),
            ("https://x.com/b.html", "unrelated anchor words", ""),
        ]
        data = [
            (cols["parent_url"], cols["parent_depth"], cols["link_pos"],
             href, text, title, "x.com", True)
            for href, text, title in rows
        ]
        df = spark.createDataFrame(
            data,
            ["parent_url", "parent_depth", "link_pos", "href", "text",
             "title", "registrable_domain", "is_internal"],
        )
        if with_ctx:
            df = df.withColumn(
                "parent_terms",
                F.array(F.lit("quantum"), F.lit("widgets"), F.lit("physics")),
            ).withColumn("parent_host", F.lit("docs.x.com"))
        return df

    eng = FrontierEngine(spark, pages, cfg=CrawlConfig())
    plain = {r["href"]: r["score"]
             for r in eng._score_links(links_df(False)).collect()}
    ctx = {r["href"]: r["score"]
           for r in eng._score_links(links_df(True)).collect()}
    # without context the two links tie; with it the overlapping one wins
    assert plain["https://x.com/a.html"] == plain["https://x.com/b.html"]
    assert ctx["https://x.com/a.html"] > ctx["https://x.com/b.html"]

    # domain authority reorders two equal links on different domains
    data = [
        ("https://x.com/", 0, 0, "https://low.com/p.html", "same words here",
         "", "low.com", False),
        ("https://x.com/", 0, 0, "https://high.com/p.html", "same words here",
         "", "high.com", False),
    ]
    df = spark.createDataFrame(
        data,
        ["parent_url", "parent_depth", "link_pos", "href", "text", "title",
         "registrable_domain", "is_internal"],
    )
    eng2 = FrontierEngine(
        spark, pages,
        cfg=CrawlConfig(domain_authority=(("high.com", 1.0), ("low.com", 0.0))),
    )
    auth = {r["registrable_domain"]: r["score"]
            for r in eng2._score_links(df).collect()}
    assert auth["high.com"] > auth["low.com"]


def test_crawlrun_queue_stats(spark, site_dir, tmp_path):
    import os

    from crawl4ai_custom_spark.operators.frontier import CrawlConfig, FrontierEngine
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    eng = FrontierEngine(
        spark,
        spark.read.parquet(os.path.join(site_dir, "pages.parquet")),
        spark.read.parquet(os.path.join(site_dir, "robots.parquet")),
        CrawlConfig(max_depth=2, max_pages=60,
                    politeness=PolitenessConfig(wave_seconds=1e9)),
        checkpoint_dir=str(tmp_path / "c"), out_dir=str(tmp_path / "o"),
    )
    seeds = [r["url"] for r in
             spark.read.parquet(os.path.join(site_dir, "seeds.parquet")).collect()]
    run = eng.run(seeds)
    qs = {r["wave"]: r for r in run.queue_stats(spark).collect()}
    assert set(qs) == set(range(run.waves))
    # BFS with no budget pressure: everything admits the wave after discovery
    assert all(r["max_wait_waves"] == 0 for r in qs.values())
    assert sum(r["admitted"] for r in qs.values()) == run.pages_crawled


def test_trap_guard_blocks_exploding_family(spark, tmp_path):
    """cfg.trap_guard_min_urls: an exploding calendar family (60 urls, one
    (host,template) key) is mined from the discovery delta and never
    enters the frontier; the bounded article family crawls normally; with
    the guard off every url is crawled."""
    import datetime as dt

    hub = "https://t.example.com/"
    cal = [f"https://t.example.com/cal?d=2024-01-{i}" for i in range(60)]
    art = [f"https://t.example.com/article-{i}" for i in range(10)]
    links = "".join(f'<a href="{u}">x</a>' for u in cal + art)
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(hub, ts, f"<html><body>{links}</body></html>".encode(),
             "hub", "en")]
    for u in cal + art:
        rows.append((u, ts, b"<html><body>leaf page</body></html>",
                     "leaf", "en"))
    pages = spark.createDataFrame(
        rows, ["url", "warc_ts", "html", "text", "lang"])

    def crawl(guard, tag="", compact_every=64):
        cfg = CrawlConfig(
            strategy="bfs", max_depth=2, max_pages=500, check_robots=False,
            politeness=PolitenessConfig(wave_seconds=1e9),
            use_bloom=False, seen_compact_every=compact_every,
            trap_guard_min_urls=30 if guard else None,
        )
        eng = FrontierEngine(
            spark, pages, None, cfg,
            checkpoint_dir=str(tmp_path / f"ck_{guard}{tag}"),
            out_dir=str(tmp_path / f"out_{guard}{tag}"),
        )
        run = eng.run([hub])
        return {r["url_canon"] for r in run.admitted_log(spark).collect()}

    guarded = crawl(True)
    assert sum("cal?d=" in u for u in guarded) == 0
    assert sum("article-" in u for u in guarded) == 10
    unguarded = crawl(False)
    assert sum("cal?d=" in u for u in unguarded) == 60
    assert sum("article-" in u for u in unguarded) == 10
    # trap-delta compaction every wave must not change the result
    assert crawl(True, tag="_c", compact_every=1) == guarded


def test_trap_counts_incremental_equals_batch(spark):
    """Summing per-delta trap_counts over disjoint url batches reproduces
    crawl_traps over the whole set exactly."""
    from crawl4ai_custom_spark.operators.urlops import (
        crawl_traps,
        trap_counts,
        traps_from_counts,
    )

    urls = spark.createDataFrame(
        [(f"https://x.com/cal?d={i}",) for i in range(40)]
        + [(f"https://x.com/post-{i % 5}",) for i in range(20)],
        ["url"],
    ).distinct()
    half_a = urls.limit(30)
    half_b = urls.subtract(half_a)
    merged = traps_from_counts(
        trap_counts(half_a).unionByName(trap_counts(half_b)),
        min_urls=30, min_share=0.5)
    whole = crawl_traps(urls, min_urls=30, min_share=0.5)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_crawlrun_host_cardinality_sketch(spark, site_dir, tmp_path):
    """sketch_cardinality=True writes per-wave HLL host sketches; merged
    estimate tracks the exact distinct-host count over seeds + discovery
    deltas (few hosts -> linear-counting regime, near-exact)."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    eng = FrontierEngine(
        spark,
        spark.read.parquet(os.path.join(site_dir, "pages.parquet")),
        spark.read.parquet(os.path.join(site_dir, "robots.parquet")),
        CrawlConfig(max_depth=2, max_pages=60,
                    politeness=PolitenessConfig(wave_seconds=1e9),
                    sketch_cardinality=True),
        checkpoint_dir=str(tmp_path / "c"), out_dir=str(tmp_path / "o"),
    )
    seeds = [r["url"] for r in spark.read.parquet(
        os.path.join(site_dir, "seeds.parquet")).collect()]
    run = eng.run(seeds)
    sk = glob.glob(str(tmp_path / "o" / "wave=*" / "hll_hosts.parquet"))
    assert sk, "per-wave sketches missing"
    est = run.host_cardinality(spark).collect()[0]["estimate"]
    deltas = [os.path.join(str(tmp_path / "c"), "_state", "seeds_all")] + [
        os.path.join(os.path.dirname(p), "new_links.parquet") for p in sk]
    exact = (
        spark.read.parquet(*deltas)
        .agg(F.countDistinct("registrable_domain")).collect()[0][0]
    )
    assert exact > 0
    assert abs(est - exact) / exact < 0.05

    # a crawl without sketching has nothing to estimate from
    eng2 = FrontierEngine(
        spark,
        spark.read.parquet(os.path.join(site_dir, "pages.parquet")),
        spark.read.parquet(os.path.join(site_dir, "robots.parquet")),
        CrawlConfig(max_depth=1, max_pages=5,
                    politeness=PolitenessConfig(wave_seconds=1e9)),
        checkpoint_dir=str(tmp_path / "c2"), out_dir=str(tmp_path / "o2"),
    )
    run2 = eng2.run(seeds[:1])
    with pytest.raises(ValueError):
        run2.host_cardinality(spark)


def test_crawlrun_payload_moments_profile(spark, site_dir, tmp_path):
    """sketch_cardinality=True also writes per-wave payload moments;
    the merged profile matches exact whole-crawl stats (n/min/max
    integer-exact, mean/std to float tolerance) and the CF p95 estimate
    lands inside the observed range. host_cardinality defaults to the
    run's own sketch_p."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    eng = FrontierEngine(
        spark,
        spark.read.parquet(os.path.join(site_dir, "pages.parquet")),
        spark.read.parquet(os.path.join(site_dir, "robots.parquet")),
        CrawlConfig(max_depth=2, max_pages=60,
                    politeness=PolitenessConfig(wave_seconds=1e9),
                    sketch_cardinality=True, sketch_p=10),
        checkpoint_dir=str(tmp_path / "c"), out_dir=str(tmp_path / "o"),
    )
    seeds = [r["url"] for r in spark.read.parquet(
        os.path.join(site_dir, "seeds.parquet")).collect()]
    run = eng.run(seeds)
    assert run.sketch_p == 10
    sk = glob.glob(str(tmp_path / "o" / "wave=*" / "moments_payload.parquet"))
    assert sk, "per-wave payload moments missing"

    prof = run.payload_profile(spark, quantile=0.95).collect()[0]
    exact = (
        run.results(spark).where(F.col("status_code") == 200)
        .select((F.length(F.coalesce("raw_markdown", F.lit("")))
                 / 1000.0).alias("kb"))
        .agg(F.count("kb").alias("n"), F.avg("kb").alias("mean"),
             F.min("kb").alias("mn"), F.max("kb").alias("mx"))
        .collect()[0]
    )
    assert prof["n"] == exact["n"] and exact["n"] > 0
    assert prof["mn"] == exact["mn"] and prof["mx"] == exact["mx"]
    assert abs(prof["mean"] - exact["mean"]) < 1e-9
    assert exact["mn"] <= prof["kb_q_est"] <= exact["mx"]

    # host_cardinality picks up the run's sketch_p automatically (mixing
    # register widths would silently corrupt the estimate)
    est = run.host_cardinality(spark).collect()[0]["estimate"]
    assert est > 0

    # a run without sketching refuses to fabricate a profile
    eng2 = FrontierEngine(
        spark,
        spark.read.parquet(os.path.join(site_dir, "pages.parquet")),
        spark.read.parquet(os.path.join(site_dir, "robots.parquet")),
        CrawlConfig(max_depth=1, max_pages=5,
                    politeness=PolitenessConfig(wave_seconds=1e9)),
        checkpoint_dir=str(tmp_path / "c2"), out_dir=str(tmp_path / "o2"),
    )
    run2 = eng2.run(seeds[:1])
    with pytest.raises(ValueError):
        run2.payload_profile(spark)


def test_fairness_stats_per_wave(spark, pages_df, robots_df, tmp_path):
    """fairness_stats=True adds host_gini / hosts_in_wave to every wave
    with admissions: gini in [0,1), hosts positive, and a single-host
    wave reads 0 (perfectly 'even' by definition)."""
    cfg = CrawlConfig(
        strategy="bfs", max_depth=2, max_pages=60,
        politeness=PolitenessConfig(wave_seconds=1e9),
        fairness_stats=True,
    )
    eng = FrontierEngine(
        spark, pages_df, robots_df, cfg,
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
    )
    run = eng.run(SEEDS)
    waves = [s for s in run.stats if s["admitted"] > 0]
    assert waves, "no admitting waves?"
    for s in waves:
        assert "host_gini" in s and "hosts_in_wave" in s
        assert s["hosts_in_wave"] >= 1
        if s["hosts_in_wave"] == 1:
            assert s["host_gini"] == 0.0
        else:
            assert 0.0 <= s["host_gini"] < 1.0
