"""Head-peek: metadata extraction from only the <head> of the html column.

Reference parity: HeadPeekr (/root/reference/crawl4ai/utils.py:2944-2999) —
fetch/read only up to </head>, pull title/meta/charset. The pages table
already holds the bytes, so "peek" = native substring + regexp extraction
over the html column — a pure projection, no parsing, no UDF. Used by the
SEO/ContentRelevance filters and the seeder's head scoring.

At 100 TB the point is column pruning: queries touching only head metadata
read the html column but never run the DOM parser; at write time the head
slice can be materialized as its own (small) column for scan-only access.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def head_section(html: Column, max_bytes: int = 65536) -> Column:
    """Text up to and including </head> (case-insensitive), bounded."""
    s = F.substring(html.cast("string"), 1, max_bytes)
    idx = F.instr(F.lower(s), "</head>")
    return F.when(idx > 0, F.substring(s, 1, idx + 6)).otherwise(s)


def head_title(head: Column) -> Column:
    return F.regexp_extract(head, r"(?is)<title[^>]*>(.*?)</title>", 1)


def meta_content(head: Column, name: str) -> Column:
    """content= of <meta name=...> or <meta property=...> (either quote)."""
    pat = (
        r'(?is)<meta\s+[^>]*(?:name|property)=["\']' + name
        + r'["\'][^>]*content=["\']([^"\']*)["\']'
    )
    return F.regexp_extract(head, pat, 1)


def peek_head(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds head_title / head_description / head_keywords / og_title columns."""
    head = head_section(F.col(html_col))
    return pages.withColumns(
        {
            "head_title": head_title(head),
            "head_description": meta_content(head, "description"),
            "head_keywords": meta_content(head, "keywords"),
            "og_title": meta_content(head, "og:title"),
        }
    )


def head_relevance_score(head_title_c: Column, head_desc: Column,
                         head_kws: Column, query_words: list[str]) -> Column:
    """BM25-lite head relevance (ContentRelevanceFilter semantics,
    /root/reference/crawl4ai/deep_crawling/filters.py:509-581): weighted hit
    count over title(x3) + description(x2) + keywords(x1), normalized."""
    if not query_words:
        return F.lit(0.0)
    def hits(col: Column) -> Column:
        low = F.lower(col)
        return sum(
            (F.when(low.contains(w.lower()), 1).otherwise(0) for w in query_words),
            start=F.lit(0),
        )
    raw = hits(head_title_c) * 3 + hits(head_desc) * 2 + hits(head_kws)
    return (raw.cast("double") / F.lit(6.0 * len(query_words))).cast("double")
