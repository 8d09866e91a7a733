"""URL filter chain as Column predicates (+ pass/reject stats).

Capability parity with /root/reference/crawl4ai/deep_crawling/filters.py:
URLPatternFilter (:119-263) with its fast paths (suffix / prefix / domain /
glob->regex), ContentTypeFilter (:266-429), DomainFilter (:432-506), SEO /
ContentRelevance filters (:509-694, head-content based — see
operators/headpeek.py), and the FilterChain conjunction with
pass/reject counters (:69-116).

All pure predicates compile to native Catalyst expressions — they run
JVM-side before any pandas UDF, so Catalyst can push them into scans.
FilterChain stats are computed as one aggregation over indicator columns
instead of mutable counters.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urlops import url_extension, url_host, url_path

# MIME-ish extension groups (ContentTypeFilter's ext->mime map, condensed).
EXT_GROUPS = {
    "text/html": ("html", "htm", "xhtml", "php", "asp", "aspx", "jsp", ""),
    "text/plain": ("txt", "text", "md", "rst"),
    "application/pdf": ("pdf",),
    "image": ("jpg", "jpeg", "png", "gif", "webp", "avif", "svg", "ico"),
    "video": ("mp4", "webm", "avi", "mov", "mkv"),
    "audio": ("mp3", "wav", "ogg", "flac"),
    "application/json": ("json",),
    "application/xml": ("xml", "rss", "atom"),
}


def _glob_to_predicate(pattern: str, url: Column) -> Column:
    """Translate one URL glob with the reference's fast paths:
    '*.html' suffix -> endswith; '/foo/*' prefix -> startswith (with path
    boundary); '*.example.com[/...]' domain -> host match; else full
    fnmatch->regex via rlike."""
    if re.fullmatch(r"\*\.\w+", pattern):  # suffix: *.html
        return url.endswith(pattern[1:])
    if pattern.endswith("/*") and "*" not in pattern[:-2]:  # prefix
        return url.startswith(pattern[:-1]) | (url == pattern[:-2])
    m = re.fullmatch(r"\*\.([\w.-]+\.\w+)(/.*)?", pattern)
    if m and "*" not in m.group(1):  # domain: *.example.com/...
        host = url_host(url)
        dom = m.group(1).lower()
        cond = (host == dom) | host.endswith("." + dom)
        if m.group(2) and m.group(2) not in ("/*", "/"):
            cond = cond & _glob_to_predicate(m.group(2), url_path(url))
        return cond
    return url.rlike(fnmatch.translate(pattern).replace(r"\Z", "$"))


def url_pattern_filter(
    url: Column, patterns: list[str], reverse: bool = False
) -> Column:
    """True when url matches ANY pattern (reverse flips to block-list)."""
    if not patterns:
        return F.lit(not reverse)
    cond = _glob_to_predicate(patterns[0], url)
    for p in patterns[1:]:
        cond = cond | _glob_to_predicate(p, url)
    return ~cond if reverse else cond


def content_type_filter(url: Column, allowed_types: list[str]) -> Column:
    """Allow urls whose extension maps to an allowed group; extension-less
    urls pass (reference behavior: no extension -> allow)."""
    exts: set[str] = set()
    for t in allowed_types:
        exts.update(EXT_GROUPS.get(t, ()))
        if "/" not in t:  # bare extension given directly
            exts.add(t.lstrip("."))
    ext = url_extension(url)
    return (ext == "") | ext.isin(*exts) if exts else F.lit(True)


def domain_filter(
    domain: Column,
    allowed: list[str] | None = None,
    blocked: list[str] | None = None,
) -> Column:
    """allow/block lists over the registrable-domain column; subdomain match
    via endswith('.parent')."""

    def any_match(doms: list[str]) -> Column:
        cond = F.lit(False)
        for d in doms:
            d = d.lower()
            cond = cond | (domain == d) | domain.endswith("." + d)
        return cond

    cond = F.lit(True)
    if allowed:
        cond = cond & any_match(allowed)
    if blocked:
        cond = cond & ~any_match(blocked)
    return cond


def url_blocklist_flags(
    urls: DataFrame,
    blocked_domains: DataFrame,
    keywords: list[str] | None = None,
    kw_threshold: int = 1,
    url_col: str = "url_canon",
    domain_col: str = "registrable_domain",
) -> DataFrame:
    """RefinedWeb-style URL curation (Penedo et al. 2023 §G.1, public
    paper; the UT1 adult/fraud blocklist pattern): the curated blocklist
    is a TABLE — UT1 ships ~4.6M registrable domains, far past literal
    expressions like :func:`domain_filter` — joined BROADCAST against the
    url set (the blocklist is tiny next to a 10^10 frontier), plus a soft
    keyword score over the lowercased url string. Returns ``urls`` with
    ``domain_blocked`` (registrable domain on the blocklist), ``kw_hits``
    (distinct blocked keywords appearing in the url), and ``url_blocked``
    (either signal fires: domain hit, or >= ``kw_threshold`` keywords).

    Shuffle-free over the url side: one broadcast left-semi-style join +
    a codegen projection; the frontier never repartitions.
    """
    bl = F.broadcast(
        blocked_domains.select(
            F.lower(F.col(blocked_domains.columns[0])).alias("_bl_domain"),
            F.lit(True).alias("_bl_hit"),
        ).distinct()
    )
    low = F.lower(F.col(url_col))
    kw_hits = F.lit(0)
    for kw in keywords or []:
        kw_hits = kw_hits + F.when(low.contains(kw.lower()), 1).otherwise(0)
    return (
        urls.join(bl, F.lower(F.col(domain_col)) == F.col("_bl_domain"),
                  "left")
        .withColumn("domain_blocked", F.coalesce("_bl_hit", F.lit(False)))
        .withColumn("kw_hits", kw_hits)
        .withColumn(
            "url_blocked",
            F.col("domain_blocked") | (F.col("kw_hits") >= kw_threshold),
        )
        .drop("_bl_domain", "_bl_hit")
    )


NONSENSE_URL_RE = (
    r"(?i)(/wp-admin/|/cgi-bin/|/feed/?$|\.(?:css|js|map|ico|woff2?|ttf|eot)(?:[?#]|$)"
    r"|/xmlrpc\.php|/trackback/?$|[?&]replytocom=)"
)


def nonsense_url_filter(url: Column) -> Column:
    """Drops utility/junk urls (seeder _is_nonsense_url parity,
    /root/reference/crawl4ai/async_url_seeder.py:1330-1424)."""
    return ~url.rlike(NONSENSE_URL_RE)


@dataclass
class FilterChain:
    """Ordered conjunction of named predicates with per-filter stats.

    ``apply`` returns (filtered_df, stats_df); stats_df has one row per
    filter: (filter, total, passed, rejected) — computed in ONE aggregation
    pass via conditional counts, replacing the reference's mutable counters
    (filters.py:19-37). Short-circuit cost order is preserved by Catalyst
    since all predicates are native."""

    filters: list[tuple[str, Column]] = field(default_factory=list)

    def add(self, name: str, predicate: Column) -> "FilterChain":
        self.filters.append((name, predicate))
        return self

    def predicate(self) -> Column:
        cond = F.lit(True)
        for _, p in self.filters:
            cond = cond & p
        return cond

    def apply(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        if not self.filters:
            from ..session import local_df

            return df, local_df(
                df.sparkSession, [],
                "filter string, total long, passed long, rejected long",
            )
        with_flags = df
        flag_cols = []
        prev = F.lit(True)
        for i, (name, p) in enumerate(self.filters):
            col = f"_f{i}"
            # a filter only "sees" rows that survived earlier filters
            with_flags = with_flags.withColumn(col, prev & p)
            prev = F.col(col)
            flag_cols.append((name, col))
        aggs = [F.count(F.lit(1)).alias("_total")]
        for name, col in flag_cols:
            aggs.append(F.sum(F.col(col).cast("long")).alias(col))
        stat_row = with_flags.agg(*aggs).collect()[0].asDict()
        stats = []
        seen_before = stat_row["_total"]
        for name, col in flag_cols:
            passed = stat_row[col] or 0
            stats.append((name, seen_before, passed, seen_before - passed))
            seen_before = passed
        from ..session import local_df

        stats_df = local_df(
            df.sparkSession, stats,
            "filter string, total long, passed long, rejected long",
        )
        last_flag = flag_cols[-1][1]
        out = with_flags.where(F.col(last_flag)).drop(*[c for _, c in flag_cols])
        return out, stats_df
