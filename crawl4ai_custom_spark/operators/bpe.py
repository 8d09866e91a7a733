"""BPE tokenizer training and encoding as dataflow (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The engine's text profile estimates BPE token counts with a regex
(textstats.profile_documents); this module TRAINS the real thing. The
trick that makes BPE distributable is the algorithm's own: after ONE
corpus pass builds the word vocabulary with frequencies, every training
round runs on the VOCAB table (|distinct words|, orders of magnitude
smaller than the corpus — still a DataFrame, never a driver structure).
Each round is:

    explode adjacent symbol pairs weighted by word count
      -> ONE groupBy(pair) sum              (partial-agg map-side)
      -> top-1 pair (count desc, pair asc — deterministic tie break)
      -> rewrite the symbol arrays (Arrow-batched pandas stage over the
         vocab table; left-to-right greedy merge, the reference rule)
      -> materialize (lineage truncation, the kmeans/frontier pattern)

Encoding re-uses the same split: encode each DISTINCT word once (vocab
table), then join token arrays back to the corpus — a 100 TB corpus
never re-runs the merge loop per occurrence.

Reference parity: crawl4ai counts tokens for chunking via a word regex
(chunking_strategy.py RegexChunking + OverlappingWindowChunking token
budgets); a trained subword vocabulary is engine-side pipeline surface
(task brief: token counting, BPE-ish).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

END = "</w>"

_VOCAB_SCHEMA = StructType([
    StructField("word", StringType()),
    StructField("n", LongType()),
    StructField("syms", ArrayType(StringType())),
])


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass: (word, n) frequencies over the engine's standard
    tokenization, plus the initial character-symbol split."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                     lambda t: F.length(t) > 0)
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    syms = F.concat(
        F.split(F.col("word"), ""),  # one element per character
        F.array(F.lit(END)),
    )
    return vocab.select("word", "n", syms.alias("syms"))


def _merge_once(left: str, right: str, syms: list) -> list:
    """Left-to-right greedy application of one merge — the reference
    (and every BPE implementation's) rewrite rule."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_MERGE_SCHEMA = StructType([
    StructField("rank", LongType()),
    StructField("left", StringType()),
    StructField("right", StringType()),
    StructField("merged", StringType()),
])


def _merge_table(spark, merges: list) -> DataFrame:
    return spark.createDataFrame(
        [(r, l, rt, l + rt) for r, l, rt in merges], _MERGE_SCHEMA
    )


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text",
              checkpoint_dir: str | None = None,
              driver_max_vocab: int = 100_000) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge table (rank, left, right, merged) — rank is application order.

    Ties on pair count break on (left, right) ascending so the learned
    vocabulary is deterministic across partitionings and engines. Each
    round's only driver traffic is the single winning pair (a per-round
    scalar, the kmeans-centroid pattern); the vocab rewrite happens
    executor-side and materializes to parquet so the plan never grows.
    Training stops early if no pair occurs twice (nothing left to merge).

    Small-vocab fast path (the cluster_pairs pattern): when the word vocab
    holds at most ``driver_max_vocab`` rows (known free from the parquet
    footers after the one materialization that happens anyway), the merge
    loop runs driver-side over the collected (word, n) table — the vocab
    IS the algorithm's working set, so a 100k-word corpus is a few MB.
    Web-scale vocabularies exceed the gate and take the distributed
    per-round loop unchanged; both paths are asserted identical in
    tests/test_bpe.py.
    """
    spark = docs.sparkSession
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="bpe_")

    # materialize the vocab ONCE, then the row count comes from parquet
    # footers (no second pass over the corpus aggregation) and both paths
    # read the materialized table
    path = os.path.join(ckpt, "vocab_0")
    _word_vocab(docs, text_col).write.mode("overwrite").parquet(path)
    vocab = spark.read.parquet(path)

    merges: list[tuple[int, str, str]] = []
    if vocab.count() <= driver_max_vocab:  # footer count, no data scan
        rows = vocab.select("word", "n").collect()
        words = {r["word"]: (list(r["word"]) + [END], int(r["n"]))
                 for r in rows}
        for r in range(n_merges):
            pc: dict = {}
            for syms, n in words.values():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + n
            if not pc:
                break
            (left, right), c = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0])
            )
            if c < 2:
                break
            merges.append((r, left, right))
            words = {
                w: (_merge_once(left, right, syms), n)
                for w, (syms, n) in words.items()
            }
        return _merge_table(spark, merges)

    for r in range(n_merges):
        pairs = vocab.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(F.size("syms") - 1,
                                                  F.lit(0))),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r").agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((r, left, right))

        def rewrite(batches: Iterator[pd.DataFrame],
                    _l=left, _r=right) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_once(_l, _r, list(s)) for s in pdf["syms"]
                ]
                yield pdf

        nxt = vocab.mapInPandas(rewrite, _VOCAB_SCHEMA)
        path = os.path.join(ckpt, f"vocab_{(r + 1) % 2}")
        nxt.write.mode("overwrite").parquet(path)
        vocab = spark.read.parquet(path)

    return _merge_table(spark, merges)


def bpe_encode(docs: DataFrame, merges: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Encode with a learned merge table: (id, n_words, n_bpe_tokens,
    tokens array — the per-word subword sequences concatenated in word
    order).

    Scale shape: the merge loop runs ONCE PER DISTINCT WORD (vocab-table
    pandas stage with the merge list broadcast via closure — merge tables
    are small by construction), then token arrays join back to the
    exploded corpus by word. A document is never re-merged.
    """
    ordered = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").collect()
    ]

    words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                     lambda t: F.length(t) > 0)
        ).alias("pos", "word"),
    )
    distinct_words = words.select("word").distinct()

    enc_schema = StructType([
        StructField("word", StringType()),
        StructField("toks", ArrayType(StringType())),
    ])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms = list(w) + [END]
                for left, right in ordered:
                    if len(syms) == 1:
                        break
                    syms = _merge_once(left, right, syms)
                out.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "toks": out})

    encoded = distinct_words.mapInPandas(enc, enc_schema)
    per_word = words.join(encoded, "word")
    agg = per_word.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("toks")).alias("n_bpe_tokens"),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ),
                lambda x: x["toks"],
            )
        ).alias("tokens"),
    )
    return (
        docs.select(F.col(id_col))
        .join(agg, docs[id_col] == agg["id"], "left")
        .drop("id")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
            F.coalesce("tokens", F.array().cast("array<string>"))
            .alias("tokens"),
        )
    )
