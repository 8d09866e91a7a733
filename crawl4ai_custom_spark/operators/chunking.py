"""Chunking strategies: text -> chunk tables, as dataflow ops.

Reference parity: crawl4ai/chunking_strategy.py:28-256 (Regex, FixedLengthWord,
SlidingWindow, OverlappingWindow chunkers) — re-expressed as explode-based
DataFrame transforms so chunking SCALES (a chunk table, not per-row lists):

  identity_chunks          whole text as one chunk (IdentityChunking)
  regex_chunks             split on a regex (default paragraph break)
  fixed_word_chunks        consecutive w-word windows
  sliding_word_chunks      w-word windows advancing by stride s (overlapping)
  overlapping_word_chunks  reference-exact OverlappingWindowChunking: w-word
                           windows advancing by w-overlap, short tail chunk,
                           raw-text passthrough when n <= w
  char_window_chunks       fixed character windows with overlap

Every function returns (id, chunk_index, chunk) rows. All native exprs:
split / sequence / slice / transform / posexplode — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def identity_chunks(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """IdentityChunking (chunking_strategy.py:28-35): the whole text as a
    single chunk — the no-op end of the strategy lattice."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit(0).alias("chunk_index"),
        F.col(text_col).alias("chunk"),
    ).where(F.length("chunk") > 0)


def overlapping_word_chunks(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", words: int = 1000,
                            overlap: int = 100) -> DataFrame:
    """Reference-exact OverlappingWindowChunking (chunking_strategy.py:215-256):
    windows of `words` tokens advancing by `words - overlap`; the final chunk
    may be short; texts with <= `words` tokens pass through as the RAW text
    (original whitespace preserved), exactly like the reference."""
    if not 0 <= overlap < words:
        raise ValueError("need 0 <= overlap < words")
    step = words - overlap
    toks = _tokens(text_col)
    n = F.size(toks)
    # last start index k*step where k = ceil((n - words) / step); while
    # start < n always holds because kmax*step < n - overlap <= n
    kmax = F.ceil((n - F.lit(words)).cast("double") / F.lit(float(step))).cast("int")
    starts = F.sequence(F.lit(0), F.greatest(kmax, F.lit(0)) * step, F.lit(step))
    many = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, words)))
    chunks = F.when(n <= words, F.array(F.col(text_col))).otherwise(many)
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


def token_budget_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_threshold: int = 512,
    overlap: int = 0,
    word_token_rate: float = 0.75,
) -> DataFrame:
    """Token-budget chunk merge — reference ``chunk_documents``
    (/root/reference/crawl4ai/utils.py:76-160) under its default
    no-tokenizer path, where every word contributes ``word_token_rate``
    tokens. With a uniform rate the streaming queue algorithm collapses to a
    closed form, so this is pure native SQL (no UDF):

      m    = max words per chunk   = floor(threshold / rate)   (>= 1)
      o    = overlap words re-queued = floor(overlap / rate)
      step = emitted words per full chunk = m - o               (>= 1)
      f    = number of full chunks = floor((n*rate - threshold)
                                           / (step*rate)) + 1   (0 if n*rate < threshold)

    Full chunk i emits words [i*step, i*step + step); the tail emits the
    rest (the reference's final ``yield " ".join(token_queue)``). Note the
    reference emits each full chunk WITHOUT its overlap suffix — the overlap
    words open the NEXT chunk — reproduced exactly here."""
    m = max(1, int(token_threshold / word_token_rate))
    o = int(overlap / word_token_rate)
    step = max(1, m - o)
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    have = n.cast("double") * F.lit(word_token_rate)
    f = F.when(
        have >= token_threshold,
        F.floor(
            (have - F.lit(float(token_threshold)))
            / F.lit(step * word_token_rate)
        ).cast("int") + 1,
    ).otherwise(F.lit(0))
    base = docs.select(
        F.col(id_col).alias("id"), toks.alias("_toks"),
        n.alias("_n"), f.alias("_f"),
    )
    idx = F.sequence(F.lit(0), F.col("_f"))  # 0..f-1 full chunks + f = tail
    out = base.select(
        "id", "_toks", "_n", "_f", F.explode(idx).alias("chunk_index")
    )
    i = F.col("chunk_index")
    chunk_words = F.when(
        i < F.col("_f"), F.slice("_toks", i * step + 1, step)
    ).otherwise(
        F.slice("_toks", F.col("_f") * step + 1, F.greatest(
            F.col("_n") - F.col("_f") * step, F.lit(0)))
    )
    return (
        out.withColumn("chunk", F.concat_ws(" ", chunk_words))
        .where(F.length("chunk") > 0)
        .select("id", "chunk_index", "chunk")
    )


def sentence_chunks(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sentence chunking — NlpSentenceChunking parity
    (/root/reference/crawl4ai/chunking_strategy.py:64-89): split on sentence
    boundaries, strip, DEDUP (the reference returns ``list(set(sens))``).
    The reference tokenizes with NLTK punkt (not in this container); its own
    commented-out regex spec — split after .!? followed by whitespace — is
    what we implement, via a sentinel substitution (no lookbehind, so the
    exact same regex runs in the DuckDB/RE2 oracle)."""
    sep = "\x01"
    marked = F.regexp_replace(F.col(text_col), r"([.!?])\s+", "$1" + sep)
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(marked, sep)).alias("sentence"),
        )
        .select("id", F.trim("sentence").alias("sentence"))
        .where(F.length("sentence") > 0)
        .distinct()
    )


def topic_segment_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_words: int = 20,
    boundary_threshold: float = 0.12,
) -> DataFrame:
    """Topic segmentation — TextTiling re-expressed as dataflow
    (TopicSegmentationChunking, chunking_strategy.py:93-137, which wraps
    nltk TextTilingTokenizer): fixed pseudo-sentence blocks, lexical
    cohesion (vocabulary Jaccard) between adjacent blocks, a topic boundary
    wherever cohesion drops below threshold, blocks concatenated per topic.
    All native exprs (slice/lag/cumsum/flatten) — scales as one window +
    one groupBy per document partition, no UDF."""
    from pyspark.sql import Window

    toks = _tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(block_words))
    blocks = F.transform(starts, lambda s: F.slice(toks, s + 1, block_words))
    b = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(blocks).alias("block_index", "block_toks"),
    ).where(F.size("block_toks") > 0)
    b = b.withColumn(
        "vocab", F.array_distinct(F.transform("block_toks", F.lower))
    )
    w = Window.partitionBy("id").orderBy("block_index")
    prev = F.lag("vocab").over(w)
    cohesion = (
        F.size(F.array_intersect(F.col("vocab"), prev)).cast("double")
        / F.size(F.array_distinct(F.concat(F.col("vocab"), prev)))
    )
    b = b.withColumn(
        "boundary",
        F.when(prev.isNull() | (cohesion < F.lit(boundary_threshold)), 1)
        .otherwise(0),
    ).withColumn("segment", F.sum("boundary").over(w) - 1)
    agg = b.groupBy("id", "segment").agg(
        F.array_sort(
            F.collect_list(F.struct("block_index", "block_toks"))
        ).alias("bs")
    )
    chunk = F.concat_ws(
        " ", F.flatten(F.transform("bs", lambda s: s["block_toks"]))
    )
    return agg.select(
        "id", F.col("segment").cast("int").alias("chunk_index"),
        chunk.alias("chunk"),
    )


def pack_sequences(chunks: DataFrame, seq_tokens: int = 2048,
                   shard_col: str = "shard", id_col: str = "id",
                   index_col: str = "chunk_index", text_col: str = "chunk",
                   word_token_rate: float = 0.75) -> DataFrame:
    """Offset-pack chunks into fixed-size training sequences, per shard:
    chunks are laid end-to-end in deterministic (id, chunk_index) order and
    every `seq_tokens` tokens starts a new sequence id — the standard
    pretraining sequence-packing layout (documents straddle boundaries; the
    trainer clips/attends within sequences).

    Adds: n_tokens (ceil(words * rate)), seq_id, seq_offset. Scale shape:
    ONE window per shard key — packing parallelism == shard count, exactly
    how packing runs in practice (one worker per shard)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    n_tok = F.ceil(F.size(toks) * F.lit(word_token_rate)).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.asc(id_col), F.asc(index_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = chunks.withColumn("n_tokens", n_tok).withColumn(
        "_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        out.withColumn("seq_id", (F.col("_before") / seq_tokens).cast("long"))
        .withColumn("seq_offset", F.col("_before") % seq_tokens)
        .drop("_before")
    )
