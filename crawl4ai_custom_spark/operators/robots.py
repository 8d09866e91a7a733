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
from pyspark.sql.types import BooleanType, DoubleType

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


def robots_mark(
    frontier: DataFrame,
    robots: DataFrame | None,
    *,
    now: dt.datetime | None = None,
    ttl_seconds: int = ROBOTS_TTL_SECONDS,
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Adds ``out_col`` boolean = robots verdict for each row (True when no
    fresh rules exist — cache-miss semantics, exactly robots_gate's). The
    gate's flag form: computing the verdict ONCE where a delta is already
    being materialized lets every later consumer filter on the stored
    column instead of re-running the broadcast join + pandas-UDF rule
    matcher (the crawl wave loop executes its lazy frontier plan twice —
    snapshot commit + next admission — so the gate-as-filter form paid the
    Python stage twice per wave)."""
    if robots is None:
        return frontier.withColumn(out_col, F.lit(True))
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
    out = out.withColumn(
        out_col,
        robots_allows_udf(F.col("_robots_rules"), url_path(F.col("url_canon"))),
    )
    return out.drop("_robots_rules", "_robots_fetch_time", "_robots_host", "_host")


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
    return (
        robots_mark(frontier, robots, now=now, ttl_seconds=ttl_seconds,
                    out_col="_robots_allowed")
        .where(F.col("_robots_allowed"))
        .drop("_robots_allowed")
    )


@F.pandas_udf(DoubleType())
def robots_crawl_delay_udf(rules: pd.Series) -> pd.Series:
    """Crawl-delay of the group matching our agent (same kernel parser as
    the allow/deny gate; None when the group declares none)."""
    cache: dict[str, object] = {}
    out = []
    for r in rules:
        if r is None:
            out.append(None)
            continue
        rs = cache.get(r)
        if rs is None:
            rs = cache[r] = parse_robots(r)
        out.append(rs.crawl_delay)
    return pd.Series(out, dtype="float64")


def robots_crawl_delays(
    robots: DataFrame,
    *,
    now: dt.datetime | None = None,
    ttl_seconds: int = ROBOTS_TTL_SECONDS,
) -> DataFrame:
    """(registrable_domain, crawl_delay) for every fresh robots entry that
    DECLARES a Crawl-delay — the input to politeness admission's
    robots-aware per-domain budget (``admit(crawl_delays=...)``). Hosts
    without a declared delay are absent (politeness keeps its adaptive
    delay); TTL-stale entries drop like a cache miss, mirroring
    :func:`robots_gate`. The robots table is host-keyed; where hosts and
    registrable domains diverge (rare sub-domain robots), map the column
    before joining — politeness budgets are per registrable domain.

    The result is one tiny row per delay-declaring host: compute it once
    per crawl (the robots table is static for a crawl session) and let
    every wave broadcast it."""
    rb = robots.select(
        F.lower(F.col("domain")).alias("registrable_domain"),
        F.col("rules").alias("_rules"),
        F.col("fetch_time").alias("_ft"),
    )
    if now is not None:
        rb = rb.where(
            F.col("_ft") >= F.lit(now - dt.timedelta(seconds=ttl_seconds))
        )
    return (
        rb.withColumn("crawl_delay", robots_crawl_delay_udf(F.col("_rules")))
        .where(F.col("crawl_delay").isNotNull())
        # one row PER DOMAIN even when the robots table holds refetched
        # duplicates — a duplicate key here would multiply frontier rows
        # through admit()'s join; max() is the conservative (slowest) pick
        .groupBy("registrable_domain")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
