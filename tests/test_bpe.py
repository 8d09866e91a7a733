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
