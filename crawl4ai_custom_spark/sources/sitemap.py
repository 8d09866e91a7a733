"""Sitemap source: <loc> extraction + sitemap-index recursion as dataflow.

Reference parity: AsyncUrlSeeder's sitemap path
(/root/reference/crawl4ai/async_url_seeder.py:765-1004) — fetch sitemap.xml,
recurse through <sitemapindex> children, yield every <url><loc>, gz
tolerated. Re-expressed over a TABLE of already-fetched sitemap documents
(url, xml): extraction is a native regexp_extract_all (no XML parser needed
for the sitemap protocol's flat <loc> shape — the reference itself regexes),
and index recursion is a bounded iterative join (sitemap nesting is <= 2-3
levels by spec convention), each round O(Δ) like the frontier waves.

Scale notes: the regex runs inside whole-stage codegen over the xml column;
recursion joins are equi-joins on url (broadcast when the child list is
small). Gzipped payloads go through one small Arrow-batched gunzip stage
first (decompress_sitemaps) — the only Python hop, and only for .gz rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemap entries: <url><loc>page</loc></url>; index entries:
# <sitemap><loc>child-sitemap</loc></sitemap>
_URL_LOC = r"(?s)<url>.*?<loc>\s*([^<]+?)\s*</loc>"
_INDEX_LOC = r"(?s)<sitemap>.*?<loc>\s*([^<]+?)\s*</loc>"


def decompress_sitemaps(df: DataFrame, payload_col: str = "payload",
                        out_col: str = "xml") -> DataFrame:
    """(url, payload binary) -> + xml string; gunzips rows with the gzip
    magic (1f 8b), decodes the rest as utf-8. One mapInPandas stage."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("url", StringType()), StructField(out_col, StringType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            xmls = []
            for p in pdf[payload_col]:
                b = bytes(p) if p is not None else b""
                if b[:2] == b"\x1f\x8b":
                    try:
                        b = gzip.decompress(b)
                    except OSError:
                        b = b""
                xmls.append(b.decode("utf-8", errors="replace"))
            yield pd.DataFrame({"url": pdf["url"], out_col: xmls})

    return df.select("url", payload_col).mapInPandas(fn, schema)


def sitemap_page_urls(
    sitemaps: DataFrame,
    roots: DataFrame | None = None,
    url_col: str = "url",
    xml_col: str = "xml",
    max_depth: int = 3,
) -> DataFrame:
    """All page urls reachable from ``roots`` through the sitemap graph.

    sitemaps: (url, xml) — every fetched sitemap document.
    roots:    (url) subset to start from; None -> every document that is
              not itself referenced as a child (i.e. the true roots).
    Returns (sitemap_url, loc) — one row per page url, tagged with the
    LEAF sitemap document that listed it.
    """
    reach = _reachable_docs(sitemaps, roots, url_col, xml_col, max_depth)
    return reach.select(
        F.col("url").alias("sitemap_url"),
        F.explode(
            F.regexp_extract_all("xml", F.lit(_URL_LOC), F.lit(1))
        ).alias("loc"),
    )


def _reachable_docs(
    sitemaps: DataFrame,
    roots: DataFrame | None,
    url_col: str,
    xml_col: str,
    max_depth: int,
) -> DataFrame:
    """(url, xml) of every sitemap document reachable from ``roots``
    through <sitemapindex> references — the shared traversal of
    sitemap_page_urls / sitemap_page_entries."""
    docs = sitemaps.select(
        F.col(url_col).alias("url"), F.col(xml_col).alias("xml")
    )
    # the edge table appears max_depth+1 times in the single lazy plan below;
    # no persist — a persist here would either leak (never unpersisted once
    # the lazy DF escapes) or be a no-op if unpersisted before return, and
    # recomputing the regexp extraction over KB-sized sitemap xml is cheap
    children_of = docs.select(
        "url",
        F.explode_outer(
            F.regexp_extract_all("xml", F.lit(_INDEX_LOC), F.lit(1))
        ).alias("child"),
    )
    if roots is None:
        referenced = children_of.where(F.col("child").isNotNull()).select(
            F.col("child").alias("url")
        ).distinct()
        current = docs.select("url").join(referenced, "url", "left_anti")
    else:
        current = roots.select(F.col(url_col).alias("url")).distinct()

    # bounded recursion (sitemap nesting is spec-shallow): unroll max_depth
    # joins LAZILY — one Spark action total, instead of an isEmpty() job per
    # round; duplicates from diamonds/cycles fold in the final distinct
    reachable = current
    for _ in range(max_depth):
        current = (
            current.join(children_of, "url")
            .where(F.col("child").isNotNull())
            .select(F.col("child").alias("url"))
            # per-round distinct (still lazy, no extra action): with fan-in
            # (a child referenced by k parents) undeduped rows multiply
            # ~k^depth across the unrolled joins, and self/cyclic references
            # keep feeding rows through every round
            .distinct()
        )
        reachable = reachable.unionByName(current)
    reachable = reachable.distinct()

    return reachable.join(docs, "url")


_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_LOC_IN = r"(?s)<loc>\s*([^<]+?)\s*</loc>"
_LASTMOD_IN = r"(?s)<lastmod>\s*([^<]+?)\s*</lastmod>"
_CHANGEFREQ_IN = r"(?s)<changefreq>\s*([^<]+?)\s*</changefreq>"
_PRIORITY_IN = r"(?s)<priority>\s*([^<]+?)\s*</priority>"


def sitemap_page_entries(
    sitemaps: DataFrame,
    roots: DataFrame | None = None,
    url_col: str = "url",
    xml_col: str = "xml",
    max_depth: int = 3,
) -> DataFrame:
    """Full sitemap-protocol page entries reachable from ``roots``:
    (sitemap_url, loc, lastmod, lastmod_ts, changefreq, priority) — the
    metadata :func:`sitemap_page_urls` drops. ``lastmod_ts`` is the W3C
    datetime cast to timestamp (null when unparseable; the raw string is
    kept alongside), ``priority`` a double, both null when the entry omits
    them. ``lastmod`` is what makes sitemap-driven RE-crawl scheduling
    possible: see ``recrawl.sitemap_revisit_candidates``.

    Same traversal and scale shape as sitemap_page_urls (bounded lazy
    joins; one codegen regex pass per field over the leaf documents —
    entry blocks explode once, fields extract per block)."""
    reach = _reachable_docs(sitemaps, roots, url_col, xml_col, max_depth)
    blocks = reach.select(
        F.col("url").alias("sitemap_url"),
        F.explode(
            F.regexp_extract_all("xml", F.lit(_URL_BLOCK), F.lit(1))
        ).alias("_b"),
    )
    nn = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    lastmod = nn(F.regexp_extract("_b", _LASTMOD_IN, 1))
    return blocks.select(
        "sitemap_url",
        nn(F.regexp_extract("_b", _LOC_IN, 1)).alias("loc"),
        lastmod.alias("lastmod"),
        # try_cast: real-web lastmod values are dirty; malformed -> null
        lastmod.try_cast("timestamp").alias("lastmod_ts"),
        nn(F.regexp_extract("_b", _CHANGEFREQ_IN, 1)).alias("changefreq"),
        # try_cast like lastmod: real-web priority values are just as dirty
        nn(F.regexp_extract("_b", _PRIORITY_IN, 1)).try_cast("double")
        .alias("priority"),
    ).where(F.col("loc").isNotNull())


_ROBOTS_SITEMAP = r"(?im)^\s*sitemap:\s*(\S+)"


def robots_sitemap_urls(robots: DataFrame, url_col: str = "url",
                        text_col: str = "robots_txt") -> DataFrame:
    """`Sitemap:` directives from robots.txt bodies — the reference's
    fallback discovery step (async_url_seeder.py:768 step 2: "parse
    robots.txt for alternative sitemap URLs"). Native regexp over the text
    column + one explode; feed the result to sitemap_page_urls."""
    from pyspark.sql import functions as F

    return robots.select(
        F.col(url_col).alias("robots_url"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_ROBOTS_SITEMAP), F.lit(1))
        ).alias("sitemap_index", "sitemap_url"),
    )
