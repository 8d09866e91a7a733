"""URL scorers as native Catalyst Column expressions (frontier priority).

Capability parity with /root/reference/crawl4ai/deep_crawling/scorers.py —
every scorer is a pure url->float; unlike the reference's per-url Python
with lru_cache, these are JVM-side expressions inside whole-stage codegen
(no Python boundary at all), so they cost ~nothing at 10^10 rows.

Scorers: keyword relevance (:160-188), path depth (:190-245), content type
(:247-330), freshness (:332-412), domain authority (:414-519), composite
(:91-158); plus the link intrinsic score family (utils.py:3261-3421) used
for link ranking at extraction time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urlops import url_depth_col, url_extension


def keyword_relevance_score(url: Column, keywords: list[str]) -> Column:
    """Fraction of keywords present in the lowercased url; 0 if none."""
    if not keywords:
        return F.lit(0.0)
    low = F.lower(url)
    hits = sum(
        (F.when(low.contains(k.lower()), 1).otherwise(0) for k in keywords),
        start=F.lit(0),
    )
    return (hits / F.lit(len(keywords))).cast("double")


def path_depth_score(url: Column, optimal_depth: int = 3) -> Column:
    """1.0 at optimal depth, decaying as 1/(1+|d-optimal|) with the
    reference's lookup fast path [1, .5, .333, .25]."""
    diff = F.abs(url_depth_col(url) - F.lit(optimal_depth))
    return (F.lit(1.0) / (F.lit(1.0) + diff.cast("double"))).cast("double")


DEFAULT_CONTENT_TYPE_WEIGHTS = {
    "html": 1.0, "htm": 1.0, "php": 0.9, "asp": 0.9, "aspx": 0.9, "jsp": 0.9,
    "": 0.8, "pdf": 0.5, "doc": 0.4, "docx": 0.4, "txt": 0.6, "md": 0.7,
    "jpg": 0.2, "jpeg": 0.2, "png": 0.2, "gif": 0.1, "svg": 0.1,
    "zip": 0.1, "exe": 0.0, "dmg": 0.0, "mp4": 0.1, "mp3": 0.1, "css": 0.0,
    "js": 0.0, "json": 0.3, "xml": 0.4,
}


def content_type_score(
    url: Column, weights: dict[str, float] | None = None, default: float = 0.5
) -> Column:
    w = weights or DEFAULT_CONTENT_TYPE_WEIGHTS
    ext = url_extension(url)
    expr = F.lit(float(default))
    for k, v in w.items():
        expr = F.when(ext == F.lit(k), F.lit(float(v))).otherwise(expr)
    return expr.cast("double")


def freshness_score(url: Column, current_year: int = 2026) -> Column:
    """Newest 19xx/20xx year token in the url -> lookup [1.0,.9,...,.5],
    fallback max(.1, 1-.1*diff); 0.5 when no year appears."""
    year_s = F.regexp_extract(url, r"(?:^|[/\-_.])((?:19|20)\d{2})(?:[/\-_.]|$)", 1)
    year = F.when(year_s == "", None).otherwise(year_s.cast("int"))
    diff = F.lit(current_year) - year
    scored = (
        F.when(year.isNull(), F.lit(None).cast("double"))  # no year -> default
        .when(diff < 0, F.lit(0.5))
        .when(diff <= 5, F.lit(1.0) - diff.cast("double") * 0.1)
        .otherwise(F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * 0.1))
    )
    return F.coalesce(scored, F.lit(0.5)).cast("double")


def domain_authority_score(
    domain: Column, weights: dict[str, float] | None = None, default: float = 0.5
) -> Column:
    """domain (registrable) -> weight map; broadcast-free chained whens for
    small maps; pass a DataFrame join for big authority tables instead."""
    if not weights:
        return F.lit(float(default))
    expr = F.lit(float(default))
    for k, v in weights.items():
        expr = F.when(domain == F.lit(k.lower()), F.lit(float(v))).otherwise(expr)
    return expr.cast("double")


def composite_score(
    parts: list[tuple[Column, float]], normalize: bool = True
) -> Column:
    """Weighted sum of scorer columns (CompositeScorer parity)."""
    if not parts:
        return F.lit(0.0)
    total = sum((c * F.lit(float(w)) for c, w in parts), start=F.lit(0.0))
    if normalize:
        wsum = sum(w for _, w in parts) or 1.0
        total = total / F.lit(float(wsum))
    return total.cast("double")


_PUNCT_STRIP = r'^[.,!?;:"()\[\]{}]+|[.,!?;:"()\[\]{}]+$'


def _term_set(text: Column) -> Column:
    """Reference tokenization (utils.py:3249-3252): split on whitespace,
    strip edge punctuation, keep words longer than 2 chars, lowercase."""
    toks = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    stripped = F.transform(
        toks, lambda w: F.regexp_replace(w, _PUNCT_STRIP, "")
    )
    return F.array_distinct(F.filter(stripped, lambda w: F.length(w) > 2))


def page_context_terms(
    title: Column, headlines: Column, meta_description: Column
) -> Column:
    """extract_page_context term set (utils.py:3216-3258): title + h1-h3
    headline text + meta description, tokenized once per PAGE so every link
    scores against a precomputed array (the same once-per-page optimization
    the reference makes)."""
    return _term_set(
        F.concat_ws(
            " ",
            F.coalesce(title, F.lit("")),
            F.coalesce(headlines, F.lit("")),
            F.coalesce(meta_description, F.lit("")),
        )
    )


def is_docs_site(host: Column) -> Column:
    """'docs.', 'api.', 'developer.', 'reference.' in the page host
    (utils.py:3243-3245)."""
    low = F.lower(F.coalesce(host, F.lit("")))
    return (
        low.contains("docs.") | low.contains("api.")
        | low.contains("developer.") | low.contains("reference.")
    )


def context_overlap_score(link_text: Column, page_terms: Column) -> Column:
    """Term-overlap relevance, up to +2.0 (utils.py:3345-3357):
    overlap / min(|link_words|, 10) * 2.0 when any overlap."""
    lw = _term_set(link_text)
    overlap = F.size(F.array_intersect(lw, page_terms))
    ratio = overlap.cast("double") / F.least(F.size(lw), F.lit(10)).cast("double")
    return F.when(
        (F.size(lw) > 0) & (overlap > 0), ratio * F.lit(2.0)
    ).otherwise(F.lit(0.0))


def docs_site_bonus(parent_host: Column, link_text: Column) -> Column:
    """+1.0 on documentation sites when the link text names a doc artifact
    (utils.py:3359-3365)."""
    kw = F.lower(F.coalesce(link_text, F.lit("")))
    has_kw = (
        kw.contains("api") | kw.contains("reference") | kw.contains("guide")
        | kw.contains("tutorial") | kw.contains("example")
    )
    return F.when(is_docs_site(parent_host) & has_kw, F.lit(1.0)).otherwise(
        F.lit(0.0)
    )


def link_intrinsic_score(
    href: Column,
    text: Column,
    title: Column,
    is_internal: Column,
    page_terms: Column | None = None,
    parent_host: Column | None = None,
) -> Column:
    """0..10 heuristic link quality (utils.py:3261-3373 family): text quality,
    title presence, path hints (docs/admin), https, depth moderation; plus —
    when the parent page context is supplied — the reference's term-overlap
    component (<= 2.0, utils.py:3345-3357) and docs-site bonus (+1.0,
    :3359-3365)."""
    low = F.lower(href)
    s = F.lit(5.0)
    s = s + F.when(F.length(F.trim(text)) > 3, 1.0).otherwise(0.0)
    s = s + F.when(F.length(F.trim(title)) > 0, 0.5).otherwise(0.0)
    s = s + F.when(low.startswith("https://"), 0.5).otherwise(0.0)
    s = s + F.when(is_internal, 0.5).otherwise(F.lit(0.0))
    s = s + F.when(low.rlike(r"/(docs?|guide|tutorial|blog|article)s?(/|$)"), 1.0).otherwise(0.0)
    s = s - F.when(low.rlike(r"/(login|signup|admin|cart|checkout|account)(/|$)"), 2.0).otherwise(0.0)
    depth = url_depth_col(href)
    s = s - F.when(depth > 5, (depth - 5).cast("double") * 0.25).otherwise(0.0)
    if page_terms is not None:
        s = s + context_overlap_score(text, page_terms)
    if parent_host is not None:
        s = s + docs_site_bonus(parent_host, text)
    return F.greatest(F.lit(0.0), F.least(F.lit(10.0), s)).cast("double")
