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


SEO_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def seo_scores(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    keywords: tuple[str, ...] = (),
    weights: dict[str, float] | None = None,
    threshold: float = 0.65,
) -> DataFrame:
    """SEOFilter as native expressions (reference semantics,
    /root/reference/crawl4ai/deep_crawling/filters.py:584-694): weighted head
    heuristics — title length buckets, keyword hits (0.3 each, capped),
    meta-description length, canonical match, noindex gate, ld+json
    presence, URL-quality penalties. Adds per-factor columns, ``seo_score``
    and ``seo_pass``."""
    import re as _re

    w = weights or SEO_WEIGHTS
    head = head_section(F.col(html_col))
    title = head_title(head)
    desc = meta_content(head, "description")
    robots_meta = meta_content(head, "robots")
    canonical = meta_content(head, "canonical")
    tl = F.length(title)
    s_title = (
        F.when((tl >= 50) & (tl <= 60), 1.0)
        .when(((tl >= 40) & (tl < 50)) | ((tl > 60) & (tl <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        pat = r"(?i)\b(" + "|".join(_re.escape(k) for k in keywords) + r")\b"
        s_kw = F.least(
            F.size(F.regexp_extract_all(title, F.lit(pat), 0)) * 0.3, F.lit(1.0)
        )
    else:
        s_kw = F.lit(0.0)
    dl = F.length(desc)
    s_desc = (
        F.when((dl >= 140) & (dl <= 160), 1.0)
        .when((dl >= 120) & (dl <= 200), 0.5)
        .otherwise(0.2)
    )
    s_canon = (
        F.when(canonical == "", 0.5)
        .when(canonical == F.col(url_col), 1.0)
        .otherwise(0.2)
    )
    s_robot = F.when(robots_meta.contains("noindex"), 0.0).otherwise(1.0)
    s_schema = F.when(
        head.rlike(r'<script[^>]+type=["\']application/ld\+json'), 1.0
    ).otherwise(0.0)
    path = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/?#]+([^?#]*)", 1))
    query = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    s_url = (
        F.lit(1.0)
        * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
        * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
        * F.when(query != "", 0.6).otherwise(1.0)
        * F.when(path.contains("_"), 0.9).otherwise(1.0)
    )
    factors = {
        "title_length": s_title, "title_kw": s_kw, "meta_description": s_desc,
        "canonical": s_canon, "robot_ok": s_robot, "schema_org": s_schema,
        "url_quality": s_url,
    }
    score = sum(
        (F.lit(w[k]) * v for k, v in factors.items()), start=F.lit(0.0)
    ).cast("double")
    return pages.withColumns(
        {**{f"seo_{k}": v.cast("double") for k, v in factors.items()},
         "seo_score": score,
         "seo_pass": score >= F.lit(threshold)}
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


def canonical_url(head: Column) -> Column:
    """href of <link rel="canonical"> (either attribute order), with the
    meta name=canonical form as fallback; '' when absent."""
    c1 = F.regexp_extract(
        head,
        r'(?is)<link\s+[^>]*rel=["\']canonical["\'][^>]*href=["\']([^"\']*)["\']',
        1,
    )
    c2 = F.regexp_extract(
        head,
        r'(?is)<link\s+[^>]*href=["\']([^"\']*)["\'][^>]*rel=["\']canonical["\']',
        1,
    )
    return F.when(c1 != "", c1).when(c2 != "", c2).otherwise(
        meta_content(head, "canonical")
    )


def canonical_collapse(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """rel=canonical dedup: every page claiming the same canonical URL
    collapses to one representative (deterministic: lexicographically first
    url). Adds `canonical_url` (self when the page declares none) and
    `is_canonical_rep`; filter on the flag to drop the mirrors — how a
    crawler's post-pass removes parametrized/mirror duplicates without
    content hashing. Shape: one window over canonical_url (a single keyed
    shuffle), regexes in codegen."""
    from pyspark.sql import Window

    head = head_section(F.col(html_col))
    canon = canonical_url(head)
    out = pages.withColumn(
        "canonical_url",
        F.when(canon == "", F.col(url_col)).otherwise(canon),
    )
    w = Window.partitionBy("canonical_url").orderBy(F.col(url_col))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_canonical_rep", F.col("_rn") == 1)
        .drop("_rn")
    )


SOFT404_PHRASES = (
    "page not found|404 not found|no longer available|does not exist"
    "|nothing was found|page you requested"
)


def soft404_detect(pages: DataFrame, url_col: str = "url",
                   text_col: str = "text", min_urls: int = 3) -> DataFrame:
    """Soft-404 / error-template detection: a server that answers HTTP 200
    with the same "not found" page for every bad URL poisons a crawl (every
    such URL looks fetched and unique). Detect them content-side: normalize
    the page text (lowercase, collapse whitespace), fingerprint it, and
    count how many DISTINCT urls on the SAME host share that exact
    fingerprint. A page is a soft-404 when its content is host-shared by
    >= ``min_urls`` urls AND carries an error phrase; the host-shared flag
    alone also marks template pages (login walls, interstitials) worth
    collapsing even without error wording.

    Returns one row per page: url, host, content_fp, n_same_content,
    has_error_phrase, is_soft404.

    Scale shape: one (host, fingerprint) groupBy with map-side partials
    joined back — linear, no self-join, no window; the phrase test is a
    codegen rlike. Complements :func:`canonical_collapse` (declared
    canonicals) with a content-evidence pass.
    """
    from .urlops import url_host

    host = url_host(F.col(url_col))
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    keyed = pages.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        F.md5(norm).alias("content_fp"),
        norm.rlike(SOFT404_PHRASES).alias("has_error_phrase"),
    )
    shared = keyed.groupBy("host", "content_fp").agg(
        F.countDistinct("url").alias("n_same_content")
    )
    return (
        keyed.join(shared, ["host", "content_fp"])
        .withColumn(
            "is_soft404",
            (F.col("n_same_content") >= min_urls) & F.col("has_error_phrase"),
        )
        .select("url", "host", "content_fp", "n_same_content",
                "has_error_phrase", "is_soft404")
    )


def rel_link(head: Column, rel: str) -> Column:
    """href of <link rel="<rel>"> (either attribute order); '' when absent."""
    c1 = F.regexp_extract(
        head,
        r'(?is)<link\s+[^>]*rel=["\']' + rel + r'["\'][^>]*href=["\']([^"\']*)["\']',
        1,
    )
    c2 = F.regexp_extract(
        head,
        r'(?is)<link\s+[^>]*href=["\']([^"\']*)["\'][^>]*rel=["\']' + rel + r'["\']',
        1,
    )
    return F.when(c1 != "", c1).otherwise(c2)


def pagination_links(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """rel=next / rel=prev discovery — how a crawler walks paginated
    listings without guessing URL patterns. Adds next_url / prev_url
    (null when absent); codegen regexes over the bounded head section."""
    head = head_section(F.col(html_col))
    nz = lambda c: F.when(c == "", F.lit(None)).otherwise(c)  # noqa: E731
    return pages.withColumns({
        "next_url": nz(rel_link(head, "next")),
        "prev_url": nz(rel_link(head, "prev")),
    })


def hreflang_alternates(pages: DataFrame, url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """<link rel="alternate" hreflang=...> extraction — how a multilingual
    crawl groups language variants of the same page (and avoids crawling
    every locale of every url). One regexp_extract_all + posexplode over the
    bounded head; emits (url, hreflang, alt_url) rows."""
    head = head_section(F.col(html_col))
    pat = (r'(?is)<link\s+[^>]*rel=["\']alternate["\'][^>]*'
           r'hreflang=["\']([^"\']+)["\'][^>]*href=["\']([^"\']*)["\']')
    langs = F.regexp_extract_all(head, F.lit(pat), F.lit(1))
    hrefs = F.regexp_extract_all(head, F.lit(pat), F.lit(2))
    pairs = F.zip_with(langs, hrefs,
                       lambda l, h: F.struct(l.alias("hl"), h.alias("hu")))
    return (
        pages.select(F.col(url_col).alias("url"),
                     F.posexplode(pairs).alias("alt_index", "p"))
        .select("url", "alt_index", F.col("p.hl").alias("hreflang"),
                F.col("p.hu").alias("alt_url"))
    )


def meta_refresh_target(head: Column) -> Column:
    """url of <meta http-equiv="refresh" content="N;url=..."> — the
    HTML-level redirect a status-code-only pipeline would miss; '' when
    absent. Case-insensitive, tolerant of spaces and quote styles."""
    pat = (r'(?is)<meta\s+[^>]*http-equiv=["\']refresh["\'][^>]*'
           r'content=["\']\s*\d+\s*;\s*url\s*=\s*([^"\'>\s]+)')
    return F.regexp_extract(head, pat, 1)


def meta_refresh_redirects(pages: DataFrame, url_col: str = "url",
                           html_col: str = "html") -> DataFrame:
    """(url, status_code=301-equivalent, redirect_to) rows for pages whose
    html declares a meta refresh — union these into the input of
    `redirects.resolve_redirects` so HTML redirects join the 3xx chains."""
    head = head_section(F.col(html_col))
    t = meta_refresh_target(head)
    return (
        pages.select(F.col(url_col).alias("url"), t.alias("redirect_to"))
        .where(F.col("redirect_to") != "")
        .withColumn("status_code", F.lit(301))
        .select("url", "status_code", "redirect_to")
    )
