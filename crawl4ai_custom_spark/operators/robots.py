"""robots.txt gate: broadcast join + vectorized rule matching.

Reference parity: RobotsParser.can_fetch with a 7-day SQLite cache
(/root/reference/crawl4ai/utils.py:252-365). Here the rules live in a
``robots(domain, rules, fetch_time)`` table — tiny relative to the frontier,
so it broadcast-joins on registrable_domain; rule evaluation runs in a
pandas UDF with a per-batch parsed-RuleSet cache (one parse per domain per
Arrow batch, vectorized over urls). Stale rules (> TTL) are treated as
absent => allow, exactly like a cache miss in the reference.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..kernel.robotstxt import ROBOTS_TTL_SECONDS, parse_robots
from .urlops import url_host, url_path


@F.pandas_udf(BooleanType())
def robots_allows_udf(rules: pd.Series, path: pd.Series) -> pd.Series:
    cache: dict[str, object] = {}
    out = []
    for r, p in zip(rules, path):
        if r is None:
            out.append(True)
            continue
        rs = cache.get(r)
        if rs is None:
            rs = cache[r] = parse_robots(r)
        out.append(rs.can_fetch(p or "/"))
    return pd.Series(out, dtype="bool")


def robots_gate(
    frontier: DataFrame,
    robots: DataFrame | None,
    *,
    now: dt.datetime | None = None,
    ttl_seconds: int = ROBOTS_TTL_SECONDS,
) -> DataFrame:
    """Filter frontier rows denied by robots. frontier needs ``url_canon``.
    Robots rules are per-HOST (not per registrable domain — politeness and
    robots key differently by design). Rules past TTL => absent => allow."""
    if robots is None:
        return frontier
    rb = robots.select(
        F.lower(F.col("domain")).alias("_robots_host"),
        F.col("rules").alias("_robots_rules"),
        F.col("fetch_time").alias("_robots_fetch_time"),
    )
    if now is not None:
        rb = rb.where(
            F.col("_robots_fetch_time")
            >= F.lit(now - dt.timedelta(seconds=ttl_seconds))
        )
    host = url_host(F.col("url_canon"))
    out = frontier.withColumn("_host", host).join(
        F.broadcast(rb), F.col("_host") == F.col("_robots_host"), "left"
    )
    out = out.where(
        robots_allows_udf(F.col("_robots_rules"), url_path(F.col("url_canon")))
    )
    return out.drop("_robots_rules", "_robots_fetch_time", "_robots_host", "_host")
