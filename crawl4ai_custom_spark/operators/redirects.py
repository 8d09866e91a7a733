"""Redirect-chain resolution as bounded iterative self-joins.

The reference follows redirects inside the browser/HTTP client
(async_crawler_strategy's fetch handles 3xx transparently); a batch engine
over captured pages must resolve chains itself so the frontier keys, the
seen set, and the canonical collapse all see TERMINAL urls.

`resolve_redirects` unrolls at most `max_hops` lazy self-joins (no driver
actions, no loops over collect): each hop is one equi-join of the current
cursor against the (url -> location) map. Chains longer than max_hops
surface honestly as `resolved = false`.

Scale shape: the redirect map is a filtered projection of the pages table
(3xx rows only — typically a small fraction); each hop joins the full url
set against that small side, broadcastable when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def resolve_redirects(pages: DataFrame, url_col: str = "url",
                      status_col: str = "status_code",
                      loc_col: str = "redirect_to",
                      max_hops: int = 4,
                      broadcast_map: bool = True) -> DataFrame:
    """pages(url, status_code, redirect_to) ->
    (url, final_url, n_hops, resolved).

    resolved = the terminal url is NOT itself a pending redirect within the
    hop budget (loops and over-long chains come back unresolved)."""
    rmap = pages.where(
        F.col(status_col).isin(*REDIRECT_STATUSES)
        & F.col(loc_col).isNotNull()
    ).select(F.col(url_col).alias("_src"), F.col(loc_col).alias("_loc"))
    if broadcast_map:
        rmap = F.broadcast(rmap)

    cur = pages.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("final_url"),
        F.lit(0).alias("n_hops"),
    )
    for _ in range(max_hops):
        j = cur.join(rmap, cur["final_url"] == rmap["_src"], "left")
        step = F.col("_loc").isNotNull()
        cur = j.select(
            "url",
            F.when(step, F.col("_loc")).otherwise(F.col("final_url"))
            .alias("final_url"),
            F.when(step, F.col("n_hops") + 1).otherwise(F.col("n_hops"))
            .alias("n_hops"),
        )
    # resolved iff the final url is not still a redirect source
    done = cur.join(
        rmap.select(F.col("_src"), F.lit(True).alias("_pending")),
        cur["final_url"] == F.col("_src"), "left",
    )
    return done.select(
        "url", "final_url", "n_hops",
        F.col("_pending").isNull().alias("resolved"),
    )
