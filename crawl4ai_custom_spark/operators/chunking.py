"""Chunking strategies: text -> chunk tables, as dataflow ops.

Reference parity: crawl4ai/chunking_strategy.py:28-256 (Regex, FixedLengthWord,
SlidingWindow, OverlappingWindow chunkers) — re-expressed as explode-based
DataFrame transforms so chunking SCALES (a chunk table, not per-row lists):

  regex_chunks          split on a regex (default paragraph break)
  fixed_word_chunks     consecutive w-word windows
  sliding_word_chunks   w-word windows advancing by stride s (overlapping)
  char_window_chunks    fixed character windows with overlap

Every function returns (id, chunk_index, chunk) rows. All native exprs:
split / sequence / slice / transform / posexplode — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def regex_chunks(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 pattern: str = r"\n\n") -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), pattern)).alias("chunk_index", "chunk"),
        )
        .where(F.length(F.trim("chunk")) > 0)
    )


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))


def fixed_word_chunks(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", words: int = 50) -> DataFrame:
    toks = _tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest((n - 1), F.lit(0)), F.lit(words))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, words)))
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_index", "chunk"),
    ).where(F.length("chunk") > 0)


def sliding_word_chunks(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", words: int = 50,
                        stride: int = 25) -> DataFrame:
    toks = _tokens(text_col)
    n = F.size(toks)
    last_start = F.greatest(n - words, F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, words)))
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_index", "chunk"),
    ).where(F.length("chunk") > 0)


def char_window_chunks(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", width: int = 400,
                       overlap: int = 50) -> DataFrame:
    t = F.col(text_col)
    n = F.length(t)
    step = width - overlap
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(starts, lambda s: F.substring(t, s + 1, width))
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_index", "chunk"),
    ).where(F.length("chunk") > 0)
