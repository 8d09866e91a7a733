"""Reference-faithful single-process BFS oracle crawler (FIXTURES.md F6).

Replicates the engine's frontier semantics in plain Python over the pages
rows: robots gate on the frontier, per-domain politeness budgets, global
budget, link discovery via the same pure kernel, exact seen set. Used to
assert frontier equivalence (per-wave admitted SETS + final seen set).
"""

from __future__ import annotations

import math
from collections import defaultdict

from crawl4ai_custom_spark.kernel.extract import extract_page
from crawl4ai_custom_spark.kernel.robotstxt import parse_robots
from crawl4ai_custom_spark.kernel.urlnorm import canonicalize_url, registrable_domain


def load_web(pages_rows):
    """latest capture per url -> {url: html}"""
    best = {}
    for r in pages_rows:
        u = r["url"]
        if u not in best or r["warc_ts"] > best[u][0]:
            best[u] = (r["warc_ts"], r["html"])
    return {u: h for u, (_, h) in best.items()}


def oracle_bfs(
    seeds: list[str],
    pages_rows,
    robots_rows=None,
    *,
    max_depth: int = 3,
    max_pages: int = 10_000,
    base_delay: float = 2.0,
    wave_seconds: float = 1e9,  # generous default: budget = everything
    max_waves: int = 64,
):
    web = load_web(pages_rows)
    robots = {}
    for r in robots_rows or []:
        robots[r["domain"].lower()] = parse_robots(r["rules"])

    def allowed(url: str) -> bool:
        host = url.split("/", 3)[2].lower()
        rs = robots.get(host)
        if rs is None:
            return True
        path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
        return rs.can_fetch(path)

    frontier: dict[str, tuple[int, float]] = {}  # url -> (depth, score)
    for s in seeds:
        c = canonicalize_url(s)
        if c:
            frontier[c] = (0, 1.0)
    seen = set(frontier)
    waves: list[set[str]] = []
    crawled = 0
    delay = defaultdict(lambda: base_delay)

    for _wave in range(max_waves):
        frontier = {u: v for u, v in frontier.items() if allowed(u)}
        if not frontier or crawled >= max_pages:
            break
        if min(d for d, _ in frontier.values()) > max_depth:
            break
        order = sorted(frontier.items(), key=lambda kv: (-kv[1][1], kv[1][0], kv[0]))
        per_dom: dict[str, int] = defaultdict(int)
        admitted: list[str] = []
        for u, (d, s) in order:
            dom = registrable_domain(u)
            budget = max(1, math.floor(wave_seconds / delay[dom]))
            if per_dom[dom] < budget:
                per_dom[dom] += 1
                admitted.append(u)
        admitted = admitted[: max_pages - crawled]
        if not admitted:
            break
        waves.append(set(admitted))
        new: dict[str, tuple[int, float]] = {}
        for u in admitted:
            depth = frontier[u][0]
            html = web.get(u)
            if html is None:
                delay[registrable_domain(u)] = max(
                    base_delay, delay[registrable_domain(u)] * 0.75
                )
                continue
            row = extract_page(u, html)
            delay[registrable_domain(u)] = max(
                base_delay, delay[registrable_domain(u)] * 0.75
            )
            for link in row["links"]:
                if not link["is_internal"]:
                    continue
                href = link["href"]
                if href in seen or depth + 1 > max_depth:
                    continue
                if href not in new or new[href][0] > depth + 1:
                    new[href] = (depth + 1, new.get(href, (0, 0.0))[1])
        for href in new:
            seen.add(href)
        frontier = {u: v for u, v in frontier.items() if u not in set(admitted)}
        frontier.update({u: (d, 0.5) for u, (d, _) in new.items()})
        crawled += len(admitted)

    return {"waves": waves, "seen": seen, "crawled": crawled}
