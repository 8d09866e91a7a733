"""RSS/Atom feed source: fresh-url discovery as dataflow.

Feeds are the web's push channel for NEW urls — the natural complement to
the sitemap source (full inventory + lastmod) and the link walk (organic
discovery). Same design rationale as sources/sitemap.py: the feed formats'
flat element shape needs no XML parser — one codegen regex pass over a
TABLE of already-fetched feed documents (url, xml) extracts every entry,
so discovery over 10^8 feeds is a narrow projection, no Python.

Covers RSS 2.0 ``<item>`` (link/title/pubDate) and Atom ``<entry>``
(link href/title/updated) in a single pass. Timestamps parse RFC-822
(``05 Jan 2026 04:00:00 GMT``, weekday optional and ignored) and ISO-8601
(Atom) — dirty values keep the raw string with a null timestamp, like the
sitemap source's lastmod.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_BLOCK = r"(?s)<(?:item|entry)\b[^>]*>(.*?)</(?:item|entry)>"
_LINK_TAG = r"(?s)<link>\s*([^<]+?)\s*</link>"
_LINK_HREF = r"(?s)<link\b[^>]*href=\"([^\"]+)\""
_TITLE_IN = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"
_PUBDATE_IN = r"(?s)<pubDate>\s*([^<]+?)\s*</pubDate>"
_UPDATED_IN = r"(?s)<updated>\s*([^<]+?)\s*</updated>"
# RFC-822 with the optional weekday already stripped (see below)
_RFC822_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def feed_entries(feeds: DataFrame, url_col: str = "url",
                 xml_col: str = "xml") -> DataFrame:
    """(feed_url, loc, title, published, published_ts) — one row per RSS
    ``<item>`` / Atom ``<entry>`` with a link. ``published`` keeps the raw
    pubDate/updated string; ``published_ts`` parses RFC-822 or ISO-8601
    (null when dirty). Feed entries postdating the stored capture feed
    ``recrawl.sitemap_revisit_candidates`` unchanged (it only needs
    loc + a timestamp column) — rename published_ts to lastmod_ts."""
    blocks = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_BLOCK),
                                 F.lit(1))
        ).alias("_b"),
    )
    nn = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    raw = F.coalesce(
        nn(F.regexp_extract("_b", _PUBDATE_IN, 1)),
        nn(F.regexp_extract("_b", _UPDATED_IN, 1)),
    )
    # strip the optional RFC-822 weekday ("Mon, ") so one format covers
    # every compliant producer; strict weekday validation rejects the
    # wrong-weekday feeds that are everywhere in the wild
    rfc = F.regexp_replace(raw, r"^[A-Za-z]{3},\s*", "")
    ts = F.coalesce(
        F.try_to_timestamp(rfc, F.lit(_RFC822_FMT)),
        raw.try_cast("timestamp"),
    )
    return blocks.select(
        "feed_url",
        F.coalesce(
            nn(F.regexp_extract("_b", _LINK_TAG, 1)),
            nn(F.regexp_extract("_b", _LINK_HREF, 1)),
        ).alias("loc"),
        nn(F.regexp_extract("_b", _TITLE_IN, 1)).alias("title"),
        raw.alias("published"),
        ts.alias("published_ts"),
    ).where(F.col("loc").isNotNull())
