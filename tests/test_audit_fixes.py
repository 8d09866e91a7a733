"""Pinning tests for the round-5 plan-audit fixes: each test encodes a
behavior that a pre-fix build got wrong (NULL-key bias in the sketches,
truncated double bootstrap totals, negative stale probabilities, a
null-reward host outranking scored hosts in UCB, silent non-convergence
in k_core, and trap-guard counts lost across resume+compaction)."""

import warnings

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# Sketches: NULL keys are excluded like every SQL aggregate
# ---------------------------------------------------------------------------

def test_sketches_ignore_null_keys(spark):
    """A NULL key must not perturb HLL / CMS / KMV: the sketch of
    (keys + NULLs) is identical to the sketch of keys alone. Pre-fix,
    NULL hashed to a NULL register/cell/bottom-k slot — HLL counted a
    phantom hit register, KMV lost a real bottom-k slot to a
    first-sorting NULL."""
    from crawl4ai_custom_spark.operators.sketches import (
        cms_table,
        hll_estimate,
        hll_registers,
        kmv_estimate,
        kmv_sketch,
    )

    clean = spark.createDataFrame(
        [(f"https://n{i}.example.com/",) for i in range(500)], ["url"])
    dirty = clean.unionByName(
        spark.createDataFrame([(None,)] * 25, "url string"))

    for p in (6, 10):
        e_clean = hll_estimate(hll_registers(clean, p=p), p=p).collect()[0]
        e_dirty = hll_estimate(hll_registers(dirty, p=p), p=p).collect()[0]
        assert e_clean["n_registers_hit"] == e_dirty["n_registers_hit"]
        assert e_clean["estimate"] == e_dirty["estimate"]

    cms_clean = {(r["row_idx"], r["col_idx"], r["cnt"])
                 for r in cms_table(clean, depth=3, width=64).collect()}
    cms_dirty = {(r["row_idx"], r["col_idx"], r["cnt"])
                 for r in cms_table(dirty, depth=3, width=64).collect()}
    assert cms_clean == cms_dirty
    # no NULL cells survive
    assert not any(c is None for _, c, _ in cms_dirty)

    k_clean = kmv_estimate(kmv_sketch(clean, k=64), k=64).collect()[0]
    k_dirty = kmv_estimate(kmv_sketch(dirty, k=64), k=64).collect()[0]
    assert (k_clean["n_sample"], k_clean["estimate"]) == \
        (k_dirty["n_sample"], k_dirty["estimate"])


# ---------------------------------------------------------------------------
# Bootstrap: double value columns keep their fractional mass
# ---------------------------------------------------------------------------

def test_bootstrap_double_totals_not_truncated(spark):
    """With a double value column the replicate totals are exact
    weighted sums (local replay to float identity), not long-truncated.
    Pre-fix every total silently floored toward zero."""
    import hashlib

    from crawl4ai_custom_spark.operators.sketches import (
        POISSON1_CUM_T60,
        bootstrap_replicate_stats,
    )

    rows = [(i, 0.25 + i * 0.5) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, x double")
    reps = {r["rep"]: r for r in
            bootstrap_replicate_stats(df, "x", "id", n_reps=4).collect()}

    for j in range(4):
        n_loc, t_loc = 0, 0.0
        for i, x in rows:
            u = int(hashlib.md5(f"{i}:{j}:boot".encode()).hexdigest()[:15],
                    16)
            w = sum(u >= t for t in POISSON1_CUM_T60)
            n_loc += w
            t_loc += w * x
        got = reps[j]
        assert got["n_eff"] == n_loc
        # fractional part survives (w*x sums are exact dyadic halves here)
        assert got["total"] == t_loc, (j, got["total"], t_loc)
        assert got["total"] != int(got["total"])  # truncation would hide this

    # integral columns still produce exact long totals
    di = spark.createDataFrame([(i, i % 7) for i in range(100)],
                               "id bigint, x bigint")
    ri = bootstrap_replicate_stats(di, "x", "id", n_reps=2).collect()
    assert all(isinstance(r["total"], int) for r in ri)


# ---------------------------------------------------------------------------
# Poisson change rate: stale_prob is a probability even under clock skew
# ---------------------------------------------------------------------------

def test_change_rate_stale_prob_floored_at_zero(spark):
    """A visit newer than as_of (epoch-boundary cutoff, clock skew) must
    yield stale_prob = 0.0, not a negative number."""
    from crawl4ai_custom_spark.operators.recrawl import change_rate_poisson

    rows = [
        ("https://a.com/", 1000.0, "f1"),
        ("https://a.com/", 2000.0, "f2"),
        ("https://a.com/", 3000.0, "f3"),   # after as_of=2500
        ("https://b.com/", 1000.0, "g1"),
        ("https://b.com/", 2000.0, "g2"),   # before as_of -> normal prob
    ]
    df = spark.createDataFrame(rows, "url string, ts double, fingerprint string")
    out = {r["url"]: r for r in
           change_rate_poisson(df, as_of=2500.0).collect()}
    a, b = out["https://a.com/"], out["https://b.com/"]
    assert a["lambda_hat"] > 0
    assert a["stale_prob"] == 0.0              # floored, not negative
    assert 0.0 < b["stale_prob"] <= 1.0


# ---------------------------------------------------------------------------
# UCB allocation: a null-reward explored host never outranks scored hosts
# ---------------------------------------------------------------------------

def test_ucb_null_reward_ranks_after_scored_hosts(spark):
    """explored hosts sort by ucb_score desc with nulls LAST: a malformed
    history row (NULL reward_sum, n>0) must not steal a slot from a
    genuinely-scored host; unexplored hosts still rank first."""
    from crawl4ai_custom_spark.operators.recrawl import ucb_host_allocation

    hist = spark.createDataFrame(
        [("scored.com", 5, 10.0),
         ("broken.com", 5, None),       # explored but NULL reward
         ("fresh.com", 0, None)],       # never fetched
        "host string, n_fetches int, reward_sum double")
    picks = [r["host"] for r in ucb_host_allocation(hist, k=2).collect()]
    assert picks == ["fresh.com", "scored.com"]
    # with k=3 the broken host is still returned, ranked dead last
    all3 = ucb_host_allocation(hist, k=3).collect()
    assert [r["host"] for r in all3] == \
        ["fresh.com", "scored.com", "broken.com"]
    assert all3[2]["ucb_score"] is None and all3[2]["explored"]


# ---------------------------------------------------------------------------
# k_core: exhausting max_rounds warns instead of silently returning
# a superset
# ---------------------------------------------------------------------------

def test_k_core_warns_when_round_budget_exhausted(spark):
    """A 14-node path peels two endpoints per round at k=2, needing 7
    rounds to empty; max_rounds=2 cannot converge -> RuntimeWarning and a
    (non-empty) superset; enough rounds -> the exact (empty) 2-core with
    no warning."""
    from crawl4ai_custom_spark.operators.linkgraph import k_core

    path = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(13)], "src string, dst string")

    with pytest.warns(RuntimeWarning, match="did not converge"):
        early = k_core(path, k=2, max_rounds=2)
        n_early = early.count()
    assert n_early > 0                       # superset of the empty core

    with warnings.catch_warnings():
        warnings.simplefilter("error")       # any warning -> failure
        assert k_core(path, k=2, max_rounds=10).count() == 0


# ---------------------------------------------------------------------------
# Frontier: trap-guard counts survive resume across seen compaction
# ---------------------------------------------------------------------------

def test_trap_guard_counts_survive_resume_with_compaction(spark, tmp_path):
    """The trap family's discovery counts straddle the interruption
    boundary (20 urls in wave 1, 15 more in wave 2 — neither alone trips
    min_urls=30). With seen compaction folding the per-wave dirs, a
    resume that rebuilt trap deltas by scanning seen paths lost the
    pre-compaction counts and admitted the trap family. The manifest's
    trap_deltas list is authoritative."""
    import datetime as dt

    from crawl4ai_custom_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
    )
    from crawl4ai_custom_spark.operators.politeness import PolitenessConfig

    hub = "https://t5.example.com/"
    cal_w1 = [f"https://t5.example.com/cal?d=2024-01-{i:02d}"
              for i in range(20)]
    cal_w2 = [f"https://t5.example.com/cal?d=2024-02-{i:02d}"
              for i in range(15)]
    art = [f"https://t5.example.com/art-{i}" for i in range(6)]

    def page(links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return f"<html><body>{body}</body></html>".encode()

    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(hub, ts, page(cal_w1 + art[:3]), "hub", "en")]
    # each wave-1 article links 2 more trap urls + one article, so the
    # family only crosses min_urls after the second wave of discovery
    for i, u in enumerate(art[:3]):
        rows.append((u, ts, page(cal_w2[i * 5:(i + 1) * 5] + [art[3 + i]]),
                     "a", "en"))
    for u in cal_w1 + cal_w2 + art[3:]:
        rows.append((u, ts, page([]), "leaf", "en"))
    pages = spark.createDataFrame(
        rows, ["url", "warc_ts", "html", "text", "lang"])

    def run(tag, max_waves=None, resume=False):
        cfg = CrawlConfig(
            strategy="bfs", max_depth=4, max_pages=500, check_robots=False,
            politeness=PolitenessConfig(wave_seconds=1e9),
            use_bloom=False, seen_compact_every=1,   # fold every wave
            trap_guard_min_urls=30, max_waves=max_waves,
        )
        eng = FrontierEngine(
            spark, pages, None, cfg,
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            out_dir=str(tmp_path / f"out_{tag}"),
        )
        return eng.run([hub], resume=resume)

    # interrupted after wave 2 (hub + wave-1 children crawled), resumed
    run("r", max_waves=2)
    got = {r["url_canon"] for r in
           run("r", resume=True).admitted_log(spark).collect()}
    want = {r["url_canon"] for r in run("c").admitted_log(spark).collect()}
    assert got == want
    assert sum("cal?d=2024-02" in u for u in got) == 0  # family blocked
