"""Randomized differential tests for the retrieval family: seeded random
corpora checked against independent pure-Python reference implementations
(tokenizer replicated from scratch here — not imported from the package),
one Spark job per operator per corpus. Complements the fixed-corpus unit
tests with input-shape coverage: empty docs, 1-char tokens, repeated
terms, punctuation runs, missing query terms."""

import math
import random
import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

WORDS = ["spark", "table", "query", "key", "vector", "aa", "bb", "cc",
         "x", "y", "zz9", "merge", "slow"]


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) > 1]


def _corpus(seed, n_docs=40):
    rng = random.Random(seed)
    out = {}
    for i in range(n_docs):
        n = rng.randint(0, 30)
        words = [rng.choice(WORDS) for _ in range(n)]
        # sprinkle punctuation runs and case noise
        text = " ".join(
            w.upper() if rng.random() < 0.2 else w for w in words)
        if rng.random() < 0.2:
            text += " !!! --- ..."
        out[i] = text
    return out


@pytest.fixture(scope="module")
def indexed(spark):
    from crawl4ai_custom_spark.operators.textstats import (
        inverted_postings,
        term_dictionary,
    )

    built = {}
    for seed in (7, 23):
        corpus = _corpus(seed)
        docs = spark.createDataFrame(
            list(corpus.items()), ["doc_id", "text"])
        p = inverted_postings(docs).persist()
        built[seed] = (corpus, docs, p, term_dictionary(p))
    yield built
    for _, _, p, _ in built.values():
        p.unpersist()


@pytest.mark.parametrize("seed", [7, 23])
def test_bm25_matches_reference(indexed, seed):
    from crawl4ai_custom_spark.operators.textstats import bm25_from_index

    corpus, _, p, d = indexed[seed]
    query = ["spark", "zz9", "table"]
    got = {r["id"]: r["bm25"]
           for r in bm25_from_index(p, d, query).collect()}

    toks = {i: _tok(t) for i, t in corpus.items() if _tok(t)}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(t in v for v in toks.values()) for t in query}
    exp = {}
    for i, v in toks.items():
        s = 0.0
        for t in set(query):
            tf = v.count(t)
            if tf:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * tf * 2.5 / (
                    tf + 1.5 * (0.25 + 0.75 * len(v) / avgdl))
        if s:
            exp[i] = s
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-9


@pytest.mark.parametrize("seed", [7, 23])
def test_phrase_and_proximity_match_reference(indexed, seed):
    from crawl4ai_custom_spark.operators.textstats import (
        phrase_match,
        proximity_match,
    )

    corpus, _, p, _ = indexed[seed]
    toks = {i: _tok(t) for i, t in corpus.items()}

    got_ph = {r["id"]: r["n_matches"]
              for r in phrase_match(p, ["table", "key"]).collect()}
    exp_ph = {}
    for i, v in toks.items():
        c = sum(1 for a, b in zip(v, v[1:]) if (a, b) == ("table", "key"))
        if c:
            exp_ph[i] = c
    assert got_ph == exp_ph

    got_px = {r["id"]: (r["min_dist"], r["n_pairs_within"])
              for r in proximity_match(p, "spark", "vector",
                                       within=4).collect()}
    exp_px = {}
    for i, v in toks.items():
        pa = [k for k, w in enumerate(v) if w == "spark"]
        pb = [k for k, w in enumerate(v) if w == "vector"]
        ds = [abs(a - b) for a in pa for b in pb]
        if ds and min(ds) <= 4:
            exp_px[i] = (min(ds), sum(1 for x in ds if x <= 4))
    assert got_px == exp_px


@pytest.mark.parametrize("seed", [7, 23])
def test_update_index_random_epoch_equals_rebuild(spark, indexed, seed):
    from crawl4ai_custom_spark.operators.textstats import (
        inverted_postings,
        term_dictionary,
        update_index,
    )

    corpus, docs, p, d = indexed[seed]
    rng = random.Random(seed * 31)
    ids = sorted(corpus)
    changed_ids = rng.sample(ids, 8)
    retired_ids = rng.sample(ids, 5)  # may overlap changed: retire wins
    new_id = max(ids) + 1
    changed_rows = [(i, _corpus(seed + 100)[i % 40]) for i in changed_ids]
    changed_rows.append((new_id, "brandnew tokens here"))
    changed = spark.createDataFrame(changed_rows, ["doc_id", "text"])
    retired = spark.createDataFrame([(i,) for i in retired_ids],
                                    ["doc_id"])
    p1, d1 = update_index(p, d, changed, retired)

    final = dict(corpus)
    for i, t in changed_rows:
        final[i] = t
    for i in retired_ids:
        final.pop(i, None)
    rebuilt = spark.createDataFrame(list(final.items()),
                                    ["doc_id", "text"])
    pr = inverted_postings(rebuilt)

    def pset(df):
        return {(r["term"], r["id"], r["tf"], tuple(r["positions"]))
                for r in df.collect()}

    assert pset(p1) == pset(pr)
    assert ({tuple(r) for r in d1.collect()}
            == {tuple(r) for r in term_dictionary(pr).collect()})
