"""Link preview: head-peek scoring of discovered links before crawling them.

Reference parity: ``LinkPreview.extract_link_heads``
(/root/reference/crawl4ai/link_preview.py:71-110) — for each discovered link,
fetch only the target's <head>, extract title/description, BM25-score against
the crawl query (``relevance_score`` -> ``contextual_score``), and blend with
the link's intrinsic score via ``calculate_total_score``
(/root/reference/crawl4ai/utils.py:3376-3421). Filter/cap semantics from
``_filter_links`` (link_preview.py:112-170): include internal/external,
include/exclude glob patterns, truncate to ``max_links`` in document order
(internal before external), THEN dedup first-wins — cap before dedup, as in
the reference.

Spark shape: the "fetch head" is a join of the link targets against the
pages table's head slice (native substring+regexp, no DOM parse — see
headpeek.py), so the whole operator is projections + one equi-join + two
bounded windows. At scale the join is the big shuffle; both sides key on the
canonical url, so the same bucket(url_hash) layout that serves the seen
anti-join co-locates it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .filters import url_pattern_filter
from .headpeek import head_relevance_score, peek_head


def total_score(
    intrinsic: Column,
    contextual: Column,
    score_links_enabled: bool = True,
    query_provided: bool = True,
) -> Column:
    """calculate_total_score (utils.py:3376-3421), null-faithful:
    scoring off -> 5.0; no query or null contextual -> clamp(intrinsic);
    else clamp(0.7*intrinsic + 0.3*min(contextual*10, 10))."""
    if not score_links_enabled:
        return F.lit(5.0)
    i = F.coalesce(intrinsic, F.lit(0.0))
    intrinsic_only = F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    if not query_provided:
        return intrinsic_only
    ctx_scaled = F.least(contextual * 10.0, F.lit(10.0))
    blended = F.greatest(
        F.lit(0.0), F.least(i * 0.7 + ctx_scaled * 0.3, F.lit(10.0))
    )
    return F.when(contextual.isNull(), intrinsic_only).otherwise(blended)


def link_preview(
    links: DataFrame,
    pages: DataFrame,
    query_terms: list[str],
    include_internal: bool = True,
    include_external: bool = False,
    include_patterns: tuple[str, ...] = (),
    exclude_patterns: tuple[str, ...] = (),
    max_links: int = 10,
    intrinsic_col: str = "intrinsic_score",
) -> DataFrame:
    """links: edge table (page_url, href, link_pos, is_internal[, intrinsic]).
    pages: latest-capture (url, html). Returns the filtered/capped links with
    head_title/head_description, contextual_score, total_score.

    A link whose target is not in pages (un-fetchable head) keeps a NULL
    contextual_score and falls back to intrinsic-only total, exactly like a
    failed head fetch in the reference (_merge_head_data, link_preview.py:
    276-321)."""
    lf = links
    if include_internal and not include_external:
        lf = lf.where(F.col("is_internal"))
    elif include_external and not include_internal:
        lf = lf.where(~F.col("is_internal"))
    elif not (include_internal or include_external):
        lf = lf.where(F.lit(False))
    if include_patterns:
        lf = lf.where(url_pattern_filter(F.col("href"), list(include_patterns)))
    if exclude_patterns:
        lf = lf.where(~url_pattern_filter(F.col("href"), list(exclude_patterns)))

    # document order: internal block first, then external (the reference
    # extends internal hrefs then external ones), position within each
    order = [F.desc("is_internal"), F.asc("link_pos")]
    if max_links > 0:
        w_cap = Window.partitionBy("page_url").orderBy(*order)
        lf = (
            lf.withColumn("_ln", F.row_number().over(w_cap))
            .where(F.col("_ln") <= max_links)
            .drop("_ln")
        )
    # first-wins dedup AFTER the cap (reference order: truncate then dedup)
    w_dd = Window.partitionBy("page_url", "href").orderBy(*order)
    lf = (
        lf.withColumn("_dd", F.row_number().over(w_dd))
        .where(F.col("_dd") == 1)
        .drop("_dd")
    )

    heads = peek_head(pages.select(F.col("url").alias("href"), "html")).select(
        "href", "head_title", "head_description", "head_keywords"
    )
    out = lf.join(heads, "href", "left")
    contextual = F.when(
        F.col("head_title").isNotNull(),
        head_relevance_score(
            F.col("head_title"),
            F.col("head_description"),
            F.col("head_keywords"),
            query_terms,
        ),
    )
    intrinsic = (
        F.col(intrinsic_col) if intrinsic_col in links.columns else F.lit(None)
    )
    return out.withColumns(
        {
            "contextual_score": contextual.cast("double"),
            "total_score": total_score(
                intrinsic, contextual, True, bool(query_terms)
            ).cast("double"),
        }
    )
