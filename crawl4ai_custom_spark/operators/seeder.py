"""URL seeding: discovery + filtering + relevance ranking over seed tables.

Reference parity: AsyncUrlSeeder (/root/reference/crawl4ai/async_url_seeder.py)
— Common-Crawl-index/sitemap discovery with glob filtering, nonsense-url
dropping, head-peek scoring and BM25 ranking, capped at max_urls. At engine
scale the "CC index" IS a table (here: any DataFrame with a url column —
e.g. the pages table itself), so seeding is a pure dataflow:

  candidate urls -> glob/pattern filter -> nonsense filter -> head peek
  (title/desc/keywords from the html column) -> relevance score vs query
  (head hits + char-3-gram url match) -> orderBy desc -> limit(max_urls)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .filters import nonsense_url_filter, url_pattern_filter
from .headpeek import head_relevance_score, peek_head
from .urlops import url_is_valid


def url_char3gram_score(url_col, query_words: list[str]):
    """Reference's _calculate_url_relevance_score family
    (async_url_seeder.py:1242-1328): fraction of query words whose char
    3-grams appear in the url path (approximated natively with contains)."""
    if not query_words:
        return F.lit(0.0)
    low = F.lower(url_col)
    grams_hit = []
    for w in query_words:
        w = w.lower()
        grams = [w[i:i + 3] for i in range(max(1, len(w) - 2))]
        hit = F.lit(False)
        for g in grams:
            hit = hit | low.contains(g)
        grams_hit.append(F.when(hit, 1.0).otherwise(0.0))
    return (sum(grams_hit, start=F.lit(0.0)) / F.lit(float(len(query_words)))).cast("double")


def seed_urls(
    candidates: DataFrame,
    *,
    pattern: str | None = None,
    query: str | None = None,
    max_urls: int = 1000,
    url_col: str = "url",
    html_col: str | None = "html",
) -> DataFrame:
    """Returns (url, relevance_score) ranked desc, capped at max_urls."""
    df = candidates.where(url_is_valid(F.col(url_col)))
    df = df.where(nonsense_url_filter(F.col(url_col)))
    if pattern:
        df = df.where(url_pattern_filter(F.col(url_col), [pattern]))
    qwords = [w for w in (query or "").split() if w]
    if qwords and html_col and html_col in candidates.columns:
        df = peek_head(df, html_col)
        score = (
            head_relevance_score(
                F.col("head_title"), F.col("head_description"),
                F.col("head_keywords"), qwords,
            ) * 0.7
            + url_char3gram_score(F.col(url_col), qwords) * 0.3
        )
    elif qwords:
        score = url_char3gram_score(F.col(url_col), qwords)
    else:
        score = F.lit(0.5)
    out = df.select(F.col(url_col).alias("url"), score.cast("double").alias("relevance_score"))
    return out.orderBy(F.desc("relevance_score"), F.asc("url")).limit(max_urls)
