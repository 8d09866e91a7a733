"""Cuckoo filter kernel + PartitionedCuckoo operator tests."""

from __future__ import annotations

import numpy as np

from crawl4ai_custom_spark.kernel.cuckoo import CuckooFilter


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)


def test_cuckoo_membership_and_fp_rate():
    cf = CuckooFilter(capacity=20_000, fp_rate=0.01)
    inserted = _keys(15_000, 1)
    cf.add_many(inserted)
    assert cf.contains_many(inserted).all()  # zero false negatives
    fresh = _keys(20_000, 2)
    fp = cf.contains_many(fresh).mean()
    assert fp < 0.02, fp  # eps ~ 2*4/2^fbits


def test_cuckoo_delete_restores_misses_and_spares_collisions():
    cf = CuckooFilter(capacity=10_000, fp_rate=0.01)
    keys = _keys(8_000, 3)
    cf.add_many(keys)
    gone, kept = keys[:4_000], keys[4_000:]
    deleted = cf.delete_many(gone)
    assert deleted.all()
    # kept keys NEVER go missing (multiset copies protect collisions)
    assert cf.contains_many(kept).all()
    # deleted keys mostly gone (residual hits = fp collisions only)
    assert cf.contains_many(gone).mean() < 0.02
    assert cf.occupancy() == 4_000


def test_cuckoo_blob_roundtrip_and_determinism():
    a = CuckooFilter(capacity=5_000, fp_rate=0.01)
    b = CuckooFilter(capacity=5_000, fp_rate=0.01)
    keys = _keys(4_900, 4)  # ~98% of capacity: stash likely engaged
    a.add_many(keys)
    b.add_many(keys)
    assert a.to_bytes() == b.to_bytes()  # deterministic build
    c = CuckooFilter(capacity=5_000, fp_rate=0.01, blob=a.to_bytes())
    assert c.n_buckets == a.n_buckets and c.fbits == a.fbits
    assert c.contains_many(keys).all()
    assert c.to_bytes() == a.to_bytes()  # exact serialization roundtrip
    assert a.contains_many(keys).all()   # full-ish filter: still no FNs


def test_cuckoo_overflow_goes_to_stash_never_false_negative():
    cf = CuckooFilter(capacity=256, fp_rate=0.01)
    keys = _keys(int(cf.n_buckets * 4 * 1.02), 5)  # >100% load
    cf.add_many(keys)
    assert cf.contains_many(keys).all()
    assert len(cf.stash) > 0  # overflow engaged, absorbed by the stash


def test_partitioned_cuckoo_prefilter_add_remove(spark):
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.seen import PartitionedCuckoo

    pc = PartitionedCuckoo(spark, num_partitions=4,
                           capacity_per_partition=10_000)
    urls = spark.range(500).select(
        F.concat(F.lit("https://d"), (F.col("id") % 7),
                 F.lit(".com/p"), F.col("id")).alias("url_canon"),
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
    )
    # empty filter: everything definitively unseen
    pre0 = pc.prefilter(urls)
    assert pre0.where(F.col("bloom_maybe_seen")).count() == 0
    pc.add(urls.where(F.col("url_hash") % 2 == 0))
    pre1 = pc.prefilter(urls)
    seen1 = pre1.where(F.col("bloom_maybe_seen"))
    # every added hash is flagged (no false negatives through Spark)
    assert seen1.where(F.col("url_hash") % 2 == 0).count() == \
        urls.where(F.col("url_hash") % 2 == 0).count()
    # retire half of what was added; retired rows stop flagging
    retire = urls.where((F.col("url_hash") % 2 == 0)
                        & (F.col("url_hash") % 4 == 0))
    pc.remove(retire)
    pre2 = pc.prefilter(urls)
    still = pre2.where(F.col("bloom_maybe_seen"))
    assert still.join(retire.select("url_hash"), "url_hash", "semi").count() \
        <= int(retire.count() * 0.05)
    # the never-retired half keeps flagging (deletion spared them)
    keep = urls.where((F.col("url_hash") % 2 == 0)
                      & (F.col("url_hash") % 4 != 0))
    assert still.join(keep.select("url_hash"), "url_hash", "semi").count() \
        == keep.count()


def test_bfs_with_cuckoo_filter_matches_bloom(spark, site_dir, tmp_path):
    """seen_filter='cuckoo' must produce the identical crawl: the prefilter
    structure may differ, but the exact anti-join defines the result."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    robots = spark.read.parquet(f"{site_dir}/robots.parquet")
    seeds = [r["url"] for r in
             spark.read.parquet(f"{site_dir}/seeds.parquet").collect()]
    runs = {}
    for name in ("bloom", "cuckoo"):
        cfg = CrawlConfig(
            strategy="bfs", max_depth=2, max_pages=200,
            politeness=PolitenessConfig(wave_seconds=1e9),
            use_bloom=True, seen_filter=name, bloom_partitions=4,
            bloom_min_seen=0,
        )
        eng = FrontierEngine(
            spark, pages, robots, cfg,
            checkpoint_dir=str(tmp_path / f"ck_{name}"),
            out_dir=str(tmp_path / f"out_{name}"),
        )
        run = eng.run(seeds)
        adm = run.admitted_log(spark)
        runs[name] = {
            (r["wave"], r["url_canon"]) for r in adm.collect()
        }
    assert runs["cuckoo"] == runs["bloom"]


def test_requeue_and_retire_recrawl_loop(spark, site_dir, tmp_path):
    """The re-crawl scheduling loop: requeue forces a re-crawl of chosen
    urls; retire_seen forgets discovery so organic link rediscovery
    re-queues pages on the next resumed crawl (cuckoo deletion fold)."""
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    robots = spark.read.parquet(f"{site_dir}/robots.parquet")
    seeds = [r["url"] for r in
             spark.read.parquet(f"{site_dir}/seeds.parquet").collect()]
    cfg = CrawlConfig(
        strategy="bfs", max_depth=2, max_pages=500,
        politeness=PolitenessConfig(wave_seconds=1e9),
        use_bloom=True, seen_filter="cuckoo", bloom_partitions=4,
        bloom_min_seen=0,
    )
    eng = FrontierEngine(
        spark, pages, robots, cfg,
        checkpoint_dir=str(tmp_path / "ck"), out_dir=str(tmp_path / "out"),
    )
    run1 = eng.run(seeds)
    log1 = run1.admitted_log(spark).collect()
    crawled = sorted({r["url_canon"] for r in log1})
    assert len(crawled) > 10
    hub = seeds[0].rstrip("/") + "/"
    # children discovered FROM the hub (depth-1 rows whose parent is a seed)
    children = sorted({
        r["url_canon"] for r in log1
        if r["wave"] == 1
    })[:3]
    assert children

    # --- requeue: hub re-enters the frontier; resume re-crawls it ---------
    n_q = eng.requeue([hub] if hub in crawled else [crawled[0]])
    assert n_q == 1
    # --- retire: children leave seen (cuckoo remove) ----------------------
    n_r = eng.retire_seen(children)
    assert n_r == len(children)
    run2 = eng.run(seeds, resume=True)
    log2 = run2.admitted_log(spark)
    new_waves = log2.where(F.col("wave") > max(r["wave"] for r in log1))
    re_admitted = {r["url_canon"] for r in new_waves.collect()}
    # the requeued hub was re-crawled, and its retired children were
    # organically re-discovered and re-crawled
    assert any(u in re_admitted for u in (hub, crawled[0]))
    assert set(children) <= re_admitted, (
        sorted(set(children) - re_admitted))


def test_diff_driven_recrawl_admits_exactly_changed_and_gone(
        spark, site_dir, tmp_path):
    """Task: close the re-crawl loop end-to-end. Crawl a site, then mutate
    it (one hub page's content changes; two of its children vanish) and
    schedule_recrawl + resume:

      * the changed hub is requeued and re-fetched with the NEW content;
      * the gone children are retired from seen (cuckoo deletion fold),
        organically re-discovered from the hub's re-crawl, re-admitted
        through politeness, and recorded as fetch misses;
      * NOTHING else is re-admitted (exact resume preserved).
    """
    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    pages = spark.read.parquet(f"{site_dir}/pages.parquet")
    robots = spark.read.parquet(f"{site_dir}/robots.parquet")
    seeds = [r["url"] for r in
             spark.read.parquet(f"{site_dir}/seeds.parquet").collect()]
    cfg = CrawlConfig(
        strategy="bfs", max_depth=3, max_pages=500,
        politeness=PolitenessConfig(wave_seconds=1e9),
        use_bloom=True, seen_filter="cuckoo", bloom_partitions=4,
        bloom_min_seen=0,
    )
    eng = FrontierEngine(
        spark, pages, robots, cfg,
        checkpoint_dir=str(tmp_path / "ck"), out_dir=str(tmp_path / "out"),
    )
    run1 = eng.run(seeds)
    res1 = spark.read.parquet(f"{run1.results_dir}/*/results.parquet")
    ok1 = res1.where(F.col("status_code") == 200)
    # a crawled hub with >= 3 crawled children (children = rows whose
    # parent_url is the hub)
    hub_row = (
        ok1.where(F.col("parent_url").isNotNull())
        .groupBy("parent_url").count().where(F.col("count") >= 3)
        .orderBy("parent_url").first()
    )
    assert hub_row is not None
    hub = hub_row["parent_url"]
    children = sorted(
        r["url"] for r in
        ok1.where(F.col("parent_url") == hub).select("url").collect()
    )
    gone = children[:2]
    n_wave1 = run1.waves

    marker = "<p>recrawl marker xyzzy fresh content</p>"
    new_pages = (
        pages.where(~F.col("url").isin(gone))
        .withColumn(
            "html",
            F.when(
                F.col("url") == hub,
                F.encode(F.regexp_replace(
                    F.decode(F.col("html"), "utf-8"),
                    "</body>", marker + "</body>"), "utf-8"),
            ).otherwise(F.col("html")),
        )
    )
    info = eng.schedule_recrawl(new_pages)
    assert info["n_changed"] == 1 and info["n_requeued"] == 1
    assert info["n_gone"] == 2 and info["n_retired"] == 2

    run2 = eng.run(seeds, resume=True)
    res2 = spark.read.parquet(f"{run2.results_dir}/*/results.parquet")
    new_rows = res2.where(
        F.col("wave").cast("int") >= n_wave1
    ).select("url", "status_code", "text").collect()
    re_admitted = {r["url"] for r in new_rows}
    # exactly the changed hub + its two vanished children, nothing else
    assert re_admitted == {hub, *gone}, re_admitted
    by_url = {r["url"]: r for r in new_rows}
    assert by_url[hub]["status_code"] == 200
    assert "recrawl marker xyzzy" in by_url[hub]["text"]
    for g in gone:
        assert by_url[g]["status_code"] != 200  # fetch miss: page is gone
