"""End-to-end training-corpus pipeline invariants.

Each stage is oracle-gated on its own; here we assert the COMPOSITION
behaves: every hazard class planted in the input is gone from the output,
survivors are intact, and sharding is deterministic.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawl4ai_custom_spark.pipelines import CorpusConfig, build_training_set

_TOPICS = [
    "storage engines and the compaction strategy of the log structured tree",
    "network protocols and the retry behavior of the transport layer stack",
    "query planners and the cost model of the join reordering search",
    "memory allocators and the fragmentation pattern of the arena design",
    "file formats and the encoding scheme of the columnar page layout",
    "schedulers and the fairness property of the work stealing queue",
]


def _doc(i: int) -> str:
    # distinct content per doc (rotating topic + unique trailing sentences)
    # so clean docs stay well below the near-dup Jaccard threshold
    t = _TOPICS[i % len(_TOPICS)]
    return (
        f"The chapter number {i} of the handbook describes {t} in detail. "
        f"A worked example number {i * 7} walks the reader through the "
        f"failure mode number {i * 13} and the recovery steps that the "
        f"operators of deployment {i} should rehearse regularly."
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(i)) for i in range(30)]  # 30 clean, mutually distinct
    # exact duplicate of doc 3
    rows.append((100, _doc(3)))
    # near duplicate of doc 4 (small tail edit)
    rows.append((101, _doc(4) + " Extra tail."))
    # PII-laden doc (otherwise distinct content)
    rows.append((102, "The appendix of the handbook lists the contact "
                      "channels of the support team and the escalation "
                      "rules of the on call rotation for the weekend. "
                      "Contact alice@example.com or 555-123-4567."))
    # junk (low quality): short, no stopwords
    rows.append((103, "xxxx zzzz 1234!!!"))
    # benchmark-contaminated doc (verbatim benchmark text)
    rows.append((104, "The quick brown fox jumps over the lazy dog near the "
                      "river bank while the observers quietly take notes "
                      "about the jumping technique and the landing form."))
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(9000, "The quick brown fox jumps over the lazy dog near the river "
                "bank while the observers quietly take notes about the "
                "jumping technique and the landing form.")],
        ["doc_id", "text"],
    )


def test_pipeline_invariants(spark, corpus, bench, tmp_path):
    cfg = CorpusConfig(decontam_ngram=5)
    out = build_training_set(corpus, cfg, bench=bench,
                             checkpoint_dir=str(tmp_path / "cc")).cache()
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}

    assert 103 not in ids            # junk filtered by quality gate
    assert 104 not in ids            # contaminated vs benchmark
    assert not (100 in ids and 3 in ids)   # exact dup collapsed
    assert not (101 in ids and 4 in ids)   # near dup collapsed to keeper
    assert 102 in ids                # PII doc survives...
    pii_text = next(r["text"] for r in rows if r["doc_id"] == 102)
    assert "<EMAIL>" in pii_text and "<PHONE>" in pii_text
    assert not re.search(r"[\w.]+@[\w.]+", pii_text)  # ...but scrubbed

    # no duplicate fingerprints anywhere in the output
    n_fp = out.select(F.md5(F.lower(F.trim("text"))).alias("f")).distinct().count()
    assert n_fp == len(rows)

    # shards: in range and deterministic across runs
    assert all(0 <= r["shard"] < cfg.n_shards for r in rows)
    again = {(r["doc_id"], r["shard"]) for r in
             build_training_set(corpus, cfg, bench=bench,
                                checkpoint_dir=str(tmp_path / "cc2")).collect()}
    assert {(r["doc_id"], r["shard"]) for r in rows} == again


def test_pipeline_chunking_and_mixture(spark, corpus):
    cfg = CorpusConfig(chunk_tokens=24, near_dedup=False,
                       mixture={"en": 0.5}, default_rate=0.0)
    out = build_training_set(corpus, cfg).collect()
    assert out, "mixture at 0.5 must keep some docs"
    # every chunk respects the token budget under the 0.75 words->tokens rate
    for r in out:
        assert len(r["text"].split()) * 0.75 <= cfg.chunk_tokens + 1e-9
    assert {r["doc_id"] for r in out} < {i for i in range(30)} | {100, 101, 102, 104}


def test_pipeline_lm_gate(spark, corpus):
    """With an LM reference and a tight NLL cap, off-distribution docs drop."""
    lm_ref = spark.createDataFrame(
        [(9100, _doc(0)), (9101, _doc(1)), (9102, _doc(2))],
        ["doc_id", "text"],
    )
    open_cfg = CorpusConfig(near_dedup=False, lm_max_nll=1e9)
    tight_cfg = CorpusConfig(near_dedup=False, lm_max_nll=4.0)
    all_ids = {r["doc_id"] for r in
               build_training_set(corpus, open_cfg, lm_ref=lm_ref).collect()}
    kept = {r["doc_id"] for r in
            build_training_set(corpus, tight_cfg, lm_ref=lm_ref).collect()}
    assert kept < all_ids  # the cap must actually drop some docs
    # docs sharing the reference topics rank best and survive
    assert 0 in kept and 1 in kept


def test_pipeline_line_dedup_stage(spark):
    """Global boilerplate lines vanish before quality is measured."""
    docs = spark.createDataFrame(
        [(i, "SITE NAV MENU\n" + _doc(i) + "\nCOPYRIGHT FOOTER")
         for i in range(8)],
        ["doc_id", "text"],
    )
    cfg = CorpusConfig(near_dedup=False, line_dedup_max_docs=3)
    out = build_training_set(docs, cfg).collect()
    assert len(out) == 8
    for r in out:
        assert "SITE NAV MENU" not in r["text"]
        assert "COPYRIGHT FOOTER" not in r["text"]
        assert "handbook" in r["text"]  # real content intact


def test_pipeline_gopher_c4_span_stages(spark):
    """The optional Gopher / C4 / span-dedup stages gate and rewrite docs
    inside build_training_set."""
    boiler = ("Subscribe to the newsletter now. Follow the project updates. "
              "All rights reserved everywhere.")
    docs = spark.createDataFrame(
        # good docs: disjoint content trios (so ONLY the boilerplate span is
        # duplicated corpus-wide) + a junk line for the C4 filter; doc 100
        # ends in symbol soup -> its single line loses terminal punctuation
        # (C4 drop) and its symbol/alpha ratios break the Gopher rules too
        [(i, _doc(3 * i) + " " + _doc(3 * i + 1) + " " + _doc(3 * i + 2)
          + " " + boiler + "\nclick here")
         for i in range(8)]
        + [(100, ("valid sentence with the and that tokens here. " * 20
                  + "# " * 60))],
        ["doc_id", "text"],
    )
    cfg = CorpusConfig(near_dedup=False, gopher_rules=True, c4_rules=True,
                       span_dedup_sentences=3, min_quality=0.0)
    out = {r["doc_id"]: r for r in build_training_set(docs, cfg).collect()}

    assert 100 not in out            # C4 + Gopher both reject it
    assert len(out) == 8
    kept_boiler = [i for i, r in out.items() if "Subscribe" in r["text"]]
    assert len(kept_boiler) == 1      # span dedup keeps ONE occurrence
    for r in out.values():
        assert "click here" not in r["text"]   # C4 line filter


def test_pipeline_window_dup_gate(spark):
    """The Lee-et-al token-window dup-fraction gate drops boilerplate-heavy
    docs (most windows shared corpus-wide) and keeps distinct ones."""
    boiler = ("please subscribe to the newsletter and follow the project "
              "updates on every channel that the team maintains today")
    docs = spark.createDataFrame(
        # 0..5: distinct real content; 10..13: almost pure shared boilerplate
        [(i, _doc(i)) for i in range(6)]
        + [(10 + j, boiler + f" closing remark number {j}")
           for j in range(4)],
        ["doc_id", "text"],
    )
    cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                       max_dup_window_frac=0.5)
    kept = {r["doc_id"] for r in build_training_set(docs, cfg).collect()}
    assert kept & {0, 1, 2, 3, 4, 5} == {0, 1, 2, 3, 4, 5}
    assert not kept & {10, 11, 12, 13}


def test_pipeline_ccnet_and_budget_stages(spark, corpus):
    """The CCNet bucket gate keeps roughly the configured tercile share and
    the budget stage caps total tokens near the target."""
    lm_ref = spark.createDataFrame(
        [(i, _doc(i)) for i in range(10)], ["doc_id", "text"]
    )
    base_cfg = CorpusConfig(near_dedup=False, redact_pii=False)
    base = build_training_set(corpus, base_cfg, lm_ref=lm_ref)
    n_base = base.count()

    head_cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                            ccnet_keep=("head",))
    head = build_training_set(corpus, head_cfg, lm_ref=lm_ref)
    n_head = head.count()
    assert 0 < n_head < n_base  # one tercile per language survives

    tok = base.agg(F.sum("token_count")).first()[0]
    budget_cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                              budget_tokens=int(tok // 2))
    capped = build_training_set(corpus, budget_cfg, lm_ref=lm_ref)
    got = capped.agg(F.sum("token_count")).first()[0]
    assert got <= tok  # never exceeds the unconstrained corpus
    assert got >= tok // 8  # and keeps a real fraction of it
    # selection is quality-first: min kept quality >= max dropped quality
    # outside the straddling bucket — check via bucket monotonicity
    kept_q = capped.agg(F.min("quality")).first()[0]
    dropped = base.join(capped.select("doc_id"), "doc_id", "left_anti")
    if dropped.count():
        max_dropped = dropped.agg(F.max("quality")).first()[0]
        # dropped docs can share the straddling bucket with kept ones:
        # allow one bucket (1/1000) of overlap
        assert max_dropped <= kept_q + 0.002


def test_pipeline_exact_substring_stage(spark):
    """The exact-substring removal stage excises a duplicated token run from
    all but its first occurrence while the surrounding documents survive."""
    boiler = ("all rights reserved by the site operator under the usual "
              "terms that apply to every page")
    docs = spark.createDataFrame(
        [(i, _doc(i) + " " + boiler) for i in range(4)],
        ["doc_id", "text"],
    )
    cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                       exact_substring_tokens=8)
    out = {r["doc_id"]: r["text"]
           for r in build_training_set(docs, cfg).collect()}
    # every doc survives the stage; the boilerplate run stays only in the
    # keeper occurrence (doc 0, the smallest (id, pos))
    assert set(out) == {0, 1, 2, 3}
    assert "rights reserved" in out[0]
    for i in (1, 2, 3):
        assert "rights reserved" not in out[i]


def test_pipeline_dsir_stage(spark):
    """DSIR resampling keeps exactly n_docs and prefers target-like docs."""
    # pool: half storage-topic docs, half scheduler-topic docs
    pool = spark.createDataFrame(
        [(i, _doc(i)) for i in range(24)], ["doc_id", "text"]
    )
    # target domain: storage-engine flavored (topic index 0 mod 6)
    target = spark.createDataFrame(
        [(1000 + i, _doc(i * 6)) for i in range(8)], ["doc_id", "text"]
    )
    cfg = CorpusConfig(near_dedup=False, redact_pii=False, dsir_n_docs=6)
    out = build_training_set(pool, cfg, dsir_target=target)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert len(ids) == 6
    # determinism: same call twice -> same selected set
    ids2 = sorted(
        r["doc_id"]
        for r in build_training_set(pool, cfg, dsir_target=target)
        .select("doc_id").collect()
    )
    assert ids == ids2
    # the selection skews toward the target topic (doc_id % 6 == 0)
    n_target_like = sum(1 for i in ids if i % 6 == 0)
    assert n_target_like >= 3  # at least half despite being 1/6 of the pool


def test_pipeline_semdedup_stage(spark):
    """SemDeDup drops semantic duplicates that share an embedding direction
    even when their TEXT differs (invisible to lexical dedup), and leaves
    docs without an embedding row untouched."""
    docs = spark.createDataFrame(
        [(i, _doc(i)) for i in range(8)], ["doc_id", "text"]
    )
    # docs 0 and 1: near-identical embeddings (semantic dups); others spread
    def vec(i: int) -> list[float]:
        if i in (0, 1):
            return [1.0, 0.001 * i, 0.0, 0.0]
        return [0.0, 1.0 + 0.1 * i, float(i), 1.0]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(6)],  # docs 6,7 have NO embedding
        ["vec_id", "embedding"],
    )
    cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                       semdedup_eps=0.999, semdedup_k=2)
    out = build_training_set(docs, cfg, embeddings=emb)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    # exactly one of the {0,1} dup pair survives; everything else intact
    assert len(ids & {0, 1}) == 1
    assert {2, 3, 4, 5, 6, 7} <= ids


def test_pipeline_semdedup_with_projection(spark):
    """embedding_projection_dims routes the semantic pass through the
    count-sketch projection: near-identical embedding pairs still dedup
    after the shrink (cosine preserved in expectation), non-dups and
    docs without embeddings untouched."""
    docs = spark.createDataFrame(
        [(i, _doc(i)) for i in range(8)], ["doc_id", "text"]
    )

    def vec(i: int) -> list[float]:
        base = [0.0] * 16
        if i in (0, 1):
            base[0] = 1.0
            base[1] = 0.001 * i
        else:
            base[i % 16] = 1.0
            base[(i * 5) % 16] = float(i)
        return base

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(6)], ["vec_id", "embedding"])
    cfg = CorpusConfig(near_dedup=False, redact_pii=False,
                       semdedup_eps=0.99, semdedup_k=2,
                       embedding_projection_dims=8)
    out = build_training_set(docs, cfg, embeddings=emb)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert len(ids & {0, 1}) == 1
    assert {6, 7} <= ids


def test_pipeline_mojibake_hostboiler_domaincap_stages(spark):
    """The round-5 optional stages: encoding repair first, host-scoped
    boilerplate strip next, and the per-domain cap near the end."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(i,
          f"https://h{i % 2}.example.com/p/{i}",
          "HOST NAV LINE\n" + _doc(i)
          + (" cafÃ© â€” naÃ¯ve" if i % 2 == 0 else ""))
         for i in range(12)],
        ["doc_id", "url", "text"],
    )
    cfg = CorpusConfig(
        near_dedup=False, redact_pii=False,
        fix_mojibake=True, host_boilerplate_min_share=0.8,
        domain_cap=4,
    )
    out = build_training_set(docs, cfg, url_col="url").collect()
    # domain cap: 6 docs per host -> 4 best each
    assert len(out) == 8
    by_host = {}
    for r in out:
        by_host.setdefault(r["url"].split("/")[2], []).append(r)
        # host boilerplate stripped on both hosts
        assert "HOST NAV LINE" not in r["text"]
        # mojibake repaired before anything measured it
        assert "Ã" not in r["text"] and "â€" not in r["text"]
    assert {len(v) for v in by_host.values()} == {4}
    # the even docs (mojibake-injected) kept their repaired accents
    evens = [r for r in out if r["doc_id"] % 2 == 0]
    assert evens and all("café — naïve" in r["text"] for r in evens)
    # url-dependent stages without url_col must refuse loudly
    with _pytest.raises(ValueError):
        build_training_set(docs, CorpusConfig(domain_cap=2))
