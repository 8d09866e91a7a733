"""robots.txt parsing and matching — from scratch, stdlib-free of network.

Capability parity with the reference's RobotsParser
(/root/reference/crawl4ai/utils.py:252-365): per-domain rule cache with TTL
semantics and a ``can_fetch(agent, url)`` gate. In the Spark engine the rules
live in a ``robots(domain, rules, fetch_time)`` table broadcast-joined to the
frontier; matching runs vectorized inside a pandas UDF with a per-batch
parsed-rule cache (one parse per domain per batch).

Matching follows the de-facto standard (Google REP): group selection by
best user-agent match ('*' fallback), longest-path-match wins between Allow
and Disallow, Allow wins ties, '$' anchors, '*' wildcards, empty Disallow
means allow-all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ROBOTS_TTL_SECONDS = 7 * 24 * 3600  # 7-day cache TTL, like the reference.


@dataclass
class RuleSet:
    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: float | None = None
    _compiled: list[tuple[int, bool, re.Pattern]] | None = None

    def _compile(self) -> list[tuple[int, bool, re.Pattern]]:
        if self._compiled is None:
            pats: list[tuple[int, bool, re.Pattern]] = []
            for allow, rules in ((True, self.allows), (False, self.disallows)):
                for p in rules:
                    if not p:
                        continue
                    rx = re.escape(p).replace(r"\*", ".*")
                    rx = rx[:-2] + "$" if rx.endswith(r"\$") else rx + ".*"
                    pats.append((len(p), allow, re.compile("^" + rx)))
            # longest specific rule first; Allow wins ties.
            pats.sort(key=lambda t: (-t[0], not t[1]))
            self._compiled = pats
        return self._compiled

    def can_fetch(self, path: str) -> bool:
        if not path:
            path = "/"
        for _ln, allow, rx in self._compile():
            if rx.match(path):
                return allow
        return True


def parse_robots(body: str, agent: str = "*") -> RuleSet:
    """Parse a robots.txt body, returning rules for the best-matching agent."""
    groups: dict[str, RuleSet] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, RuleSet())
            last_was_agent = True
            continue
        last_was_agent = False
        if not current:
            continue
        for a in current:
            g = groups[a]
            if key == "disallow":
                g.disallows.append(val)
            elif key == "allow":
                g.allows.append(val)
            elif key == "crawl-delay":
                try:
                    g.crawl_delay = float(val)
                except ValueError:
                    pass
    agent = agent.lower()
    # best match: longest agent token contained in our agent, else '*'.
    best, best_len = None, -1
    for a, g in groups.items():
        if a == "*":
            continue
        if a in agent and len(a) > best_len:
            best, best_len = g, len(a)
    return best if best is not None else groups.get("*", RuleSet())


def can_fetch(rules_body: str, url_path: str, agent: str = "*") -> bool:
    return parse_robots(rules_body, agent).can_fetch(url_path)
