"""train_bpe / bpe_encode against an independent in-test reference BPE
(Sennrich et al. 2016 — pair counts over the word vocab, greedy
left-to-right merges)."""

from __future__ import annotations

import re
from collections import Counter

from crawl4ai_custom_spark.operators.bpe import END, bpe_encode, train_bpe

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low and slow the flow is low",
]


def _ref_train(texts, n_merges):
    vocab = Counter()
    for t in texts:
        vocab.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    words = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += vocab[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )
    got = [
        (r["left"], r["right"])
        for r in train_bpe(docs, 10, checkpoint_dir=None)
        .orderBy("rank").collect()
    ]
    exp, _ = _ref_train(CORPUS, 10)
    assert got == exp


def test_bpe_encode_matches_reference_and_is_word_ordered(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )
    merges = train_bpe(docs, 6)
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}

    mlist, ref_words = _ref_train(CORPUS, 6)
    for i, t in enumerate(CORPUS):
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        exp_tokens = [tok for w in ws for tok in ref_words[w]]
        assert enc[i]["n_words"] == len(ws)
        assert list(enc[i]["tokens"]) == exp_tokens
        assert enc[i]["n_bpe_tokens"] == len(exp_tokens)


def test_bpe_unseen_word_and_empty_doc(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )
    merges = train_bpe(docs, 6)
    tgt = spark.createDataFrame(
        [(100, "glowing"), (101, "")], ["doc_id", "text"]
    )
    enc = {r["doc_id"]: r for r in bpe_encode(tgt, merges).collect()}
    # unseen word still encodes (merges apply where they match)
    toks = list(enc[100]["tokens"])
    assert "".join(toks) == "glowing" + END
    assert enc[101]["n_words"] == 0 and list(enc[101]["tokens"]) == []


def test_train_bpe_both_paths_agree(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )
    fast = [(r["left"], r["right"])
            for r in train_bpe(docs, 8).orderBy("rank").collect()]
    dist = [(r["left"], r["right"])
            for r in train_bpe(docs, 8, driver_max_vocab=0)
            .orderBy("rank").collect()]
    assert fast == dist and len(fast) == 8


def test_unigram_vocab_segment_and_em(spark):
    """Seed vocab keeps every char + top multis with integer costs;
    Viterbi output always reconstructs the word at minimum cost (checked
    against a brute-force enumeration); the EM count step's totals equal
    sum(freq * n_pieces) and every counted piece is in the vocabulary."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.bpe import (
        unigram_em_counts,
        unigram_seed_vocab,
        unigram_segment,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the cat ate the rat",
             "a mat and a rat sat", "the the the cat cat"])],
        ["doc_id", "text"])
    vocab_df = unigram_seed_vocab(docs, max_piece=3, extra_pieces=6)
    vocab = {r["piece"]: r["cost"] for r in vocab_df.collect()}
    # all single chars of the corpus present, all costs positive ints
    chars = set("thecatsonmatertdna")
    assert chars <= {p for p in vocab if len(p) == 1}
    assert all(isinstance(c, int) and c > 0 for c in vocab.values())
    assert sum(1 for p in vocab if len(p) > 1) == 6

    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    seg = {r["word"]: r for r in
           unigram_segment(words, vocab_df, max_piece=3).collect()}
    assert set(seg) == {"the", "cat", "sat", "on", "mat",
                        "ate", "rat", "a", "and"}

    def brute(w):  # enumerate all segmentations, same (cost, path) order
        n = len(w)
        best = None
        for k in range(n):  # k = number of cut points
            for cuts in combinations(range(1, n), k):
                bounds = [0, *cuts, n]
                ps = [w[bounds[i]:bounds[i + 1]]
                      for i in range(len(bounds) - 1)]
                if any(len(p) > 3 or p not in vocab for p in ps):
                    continue
                key = (sum(vocab[p] for p in ps), " ".join(ps))
                if best is None or key < best:
                    best = key
        return best

    for w, r in seg.items():
        assert r["pieces_str"].replace(" ", "") == w
        bc, bp = brute(w)
        assert (r["cost"], r["pieces_str"]) == (bc, bp), w

    em = {r["piece"]: r["new_count"] for r in
          unigram_em_counts(docs, vocab_df, max_piece=3).collect()}
    assert set(em) <= set(vocab)
    freqs = {r["word"]: r["count"] for r in
             words.groupBy("word").count().collect()}
    expect_total = sum(freqs[w] * seg[w]["n_pieces"] for w in seg)
    assert sum(em.values()) == expect_total


def test_train_unigram_cost_non_increasing_and_prunes(spark):
    """Hard-EM rounds never increase the corpus Viterbi cost; unused
    multi-char pieces are pruned while the char set survives with a
    count floor; validation raises."""
    import pytest

    from pyspark.sql import functions as F

    from crawl4ai_custom_spark.operators.bpe import (
        train_unigram,
        unigram_seed_vocab,
        unigram_segment,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the cat ate the rat",
             "a mat and a rat sat", "the the the cat cat"])],
        ["doc_id", "text"])
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    freqs = {r["word"]: r["count"] for r in
             words.groupBy("word").count().collect()}

    def corpus_cost(vocab_df):
        seg = unigram_segment(words, vocab_df, max_piece=3).collect()
        return sum(freqs[r["word"]] * r["cost"] for r in seg)

    v0 = unigram_seed_vocab(docs, max_piece=3, extra_pieces=6)
    v1 = train_unigram(docs, rounds=1, max_piece=3, extra_pieces=6)
    v2 = train_unigram(docs, rounds=2, max_piece=3, extra_pieces=6)
    # re-costing to the ACTUALLY-USED distribution can only help
    c0, c1, c2 = corpus_cost(v0), corpus_cost(v1), corpus_cost(v2)
    assert c1 <= c0 and c2 <= c1

    chars0 = {r["piece"] for r in v0.collect() if len(r["piece"]) == 1}
    rows1 = v1.collect()
    assert {r["piece"] for r in rows1 if len(r["piece"]) == 1} == chars0
    # pruning is real: the toy corpus cannot use all 6 seeded multis
    assert sum(1 for r in rows1 if len(r["piece"]) > 1) < 6
    assert all(r["count"] >= 1 and r["cost"] > 0 for r in rows1)

    with pytest.raises(ValueError):
        train_unigram(docs, rounds=0)
