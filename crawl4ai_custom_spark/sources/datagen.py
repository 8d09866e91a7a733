"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1-F3).

Generates a multi-domain link-graph site — home -> categories -> subcategories
-> products (the same shape as the reference's dummy-site test generator,
/root/reference/tests/general/generate_dummy_site.py:152-284) — rendered to
real HTML with head metadata, nav/footer boilerplate, mixed link forms
(relative, root-relative, absolute, tracking-params, fragments, mailto),
images with srcset, a spec table and a code block on product pages.

Properties engineered for the engine's test matrix:
- zipf-skewed domain sizes with one mega-host (skew-split / salting tests)
- >=2 captures (different warc_ts) for ~4% of urls (latest-capture window)
- a few links to urls that do NOT exist in the table (fetch-miss)
- /private/ paths + a robots table that disallows them (robots gate)
- deterministic: everything derives from md5 of the url + a run seed; no
  wall-clock, no global RNG state.

Output schema == BASELINE.json input_hint:
  pages(url string, warc_ts timestamp, html binary, text string, lang string)
plus side tables seeds(url, priority) and robots(domain, rules, fetch_time).
The ``text`` column is the kernel-extracted text of the html (oracle column).
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.extract import extract_page
from ..kernel.textproc import stable_hash64

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_VOCAB = (
    "widget gadget spinner module sensor actuator valve rotor stator flange "
    "bearing coupling gasket manifold nozzle piston spring damper bracket rail "
    "premium durable precision industrial compact modular adaptive efficient "
    "measure install configure calibrate optimize maintain inspect replace "
    "quality performance reliability throughput latency capacity pressure "
    "temperature velocity torque friction resonance alignment tolerance"
).split()

_CATEGORIES = ["tools", "parts", "kits", "materials", "electronics", "safety"]
_SUBCATS = ["pro", "basic", "industrial", "home", "custom"]
_EXTERNAL_SITES = (
    "https://partner.example.org/catalog",
    "https://docs.example.net/manual",
    "https://forum.example.info/board",
    "https://facebook.com/exampleshop",
)


def _rng(url: str, seed: int) -> random.Random:
    return random.Random(stable_hash64(f"{seed}:{url}"))


def _words(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_VOCAB) for _ in range(n))


def _sentence(r: random.Random) -> str:
    s = _words(r, r.randint(6, 14))
    return s[0].upper() + s[1:] + "."


def domain_names(n_domains: int) -> list[str]:
    """domain 0 is the mega-host."""
    return ["mega.example-shop.com"] + [
        f"shop{i}.example{i}.com" for i in range(1, n_domains)
    ]


def site_urls(n_pages: int, n_domains: int) -> dict[str, list[str]]:
    """Deterministic url tree per domain; zipf-ish allocation (mega-host ~50%)."""
    domains = domain_names(n_domains)
    weights = [1.0 / (i + 1) for i in range(n_domains)]
    wsum = sum(weights)
    alloc = [max(4, int(n_pages * w / wsum)) for w in weights]
    tree: dict[str, list[str]] = {}
    for d, budget in zip(domains, alloc):
        urls = [f"https://{d}/"]
        n_cat = min(len(_CATEGORIES), max(1, budget // 8))
        cats = [f"https://{d}/{c}" for c in _CATEGORIES[:n_cat]]
        urls += cats
        remaining = budget - len(urls)
        subs: list[str] = []
        for c in _CATEGORIES[:n_cat]:
            for s in _SUBCATS[: max(1, remaining // (n_cat * 4) or 1)]:
                subs.append(f"https://{d}/{c}/{s}")
        subs = subs[: max(1, remaining // 3)]
        urls += subs
        remaining = budget - len(urls)
        prods: list[str] = []
        i = 0
        while len(prods) < remaining and subs:
            parent = subs[i % len(subs)]
            prods.append(f"{parent}/item-{i:04d}")
            i += 1
        urls += prods
        # a private section the robots table disallows
        urls.append(f"https://{d}/private/internal-report")
        tree[d] = urls
    return tree


def _page_links(url: str, domain: str, tree: dict[str, list[str]], r: random.Random) -> list[str]:
    """Raw hrefs as they appear in the HTML (mixed forms, pre-canonicalization)."""
    urls = tree[domain]
    path = url[len(f"https://{domain}") :]
    depth = len([s for s in path.split("/") if s])
    links: list[str] = ["/"]  # home
    children = [u for u in urls if u.startswith(url.rstrip("/") + "/") and u != url]
    r.shuffle(children)
    for c in children[:12]:
        links.append(c[len(f"https://{domain}") :])  # root-relative
    siblings = [u for u in urls if u.rsplit("/", 1)[0] == url.rsplit("/", 1)[0] and u != url]
    for s in siblings[:4]:
        links.append(s)  # absolute
    if depth >= 1:
        links.append("../")
    # cross-domain internal-web links
    other_domains = [d for d in tree if d != domain]
    if other_domains:
        od = other_domains[stable_hash64(url) % len(other_domains)]
        links.append(tree[od][stable_hash64(url + "x") % len(tree[od])])
    # tracking-param + fragment variants of a sibling (canonicalization tests)
    if siblings:
        links.append(siblings[0] + "?utm_source=gen&utm_campaign=test")
        links.append(siblings[0] + "#details")
    # external + junk
    links.append(_EXTERNAL_SITES[stable_hash64(url + "e") % len(_EXTERNAL_SITES)])
    links.append("mailto:info@" + domain)
    if r.random() < 0.05:
        links.append(f"/missing/never-generated-{r.randint(0, 999)}")  # fetch-miss
    if r.random() < 0.15:
        links.append("/private/internal-report")  # robots-blocked target
    return links


def render_page(url: str, domain: str, tree: dict[str, list[str]], seed: int,
                revision: int = 0) -> str:
    r = _rng(url + (f"@rev{revision}" if revision else ""), seed)
    path = url[len(f"https://{domain}") :]
    slug = (path.strip("/").replace("/", " ") or "home").title()
    title = f"{slug} — {domain.split('.')[0].title()} Shop"
    desc = _sentence(r)
    kws = ", ".join(r.sample(_VOCAB, 5))
    nav = " ".join(
        f'<a href="/{c}">{c.title()}</a>' for c in _CATEGORIES[:4]
    )
    paras = "\n".join(
        f"<p>{' '.join(_sentence(r) for _ in range(r.randint(2, 5)))}</p>"
        for _ in range(r.randint(2, 6))
    )
    link_html = " ".join(
        f'<a href="{href}">{href.split("/")[-1] or "home"}</a>'
        for href in _page_links(url, domain, tree, r)
    )
    is_product = "item-" in url
    table_html = ""
    code_html = ""
    if is_product:
        rows = "\n".join(
            f"<tr><td>{r.choice(_VOCAB)}</td><td>{r.randint(1, 500)}</td><td>{r.choice(['mm','kg','W','V'])}</td></tr>"
            for _ in range(r.randint(3, 6))
        )
        table_html = f"""<h2>Specifications</h2>
<table><caption>Specs for {slug}</caption>
<thead><tr><th>Property</th><th colspan="2">Value</th></tr></thead>
<tbody>{rows}</tbody></table>"""
        code_html = f'<pre><code class="language-bash">shopctl order {path.strip("/").replace("/", "-")}</code></pre>'
    img = (
        f'<img src="/img{path.rstrip("/") or "/home"}.png" alt="{slug} photo" '
        f'width="{r.choice([120, 320, 640])}" height="240" '
        f'srcset="/img{path.rstrip("/") or "/home"}-2x.png 2x">'
    )
    rev_note = f"<p>Revision {revision} updated copy.</p>" if revision else ""
    return f"""<!DOCTYPE html>
<html><head>
<title>{title}</title>
<meta name="description" content="{desc}">
<meta name="keywords" content="{kws}">
<meta property="og:title" content="{slug}">
</head>
<body>
<nav class="nav-main">{nav}</nav>
<article class="content">
<h1>{slug}</h1>
{rev_note}{paras}
{img}
{table_html}
{code_html}
<ul>{"".join(f"<li>{_sentence(r)}</li>" for _ in range(r.randint(2, 4)))}</ul>
<p>Related: {link_html}</p>
</article>
<footer class="footer">© 2026 {domain} <a href="/about">About</a></footer>
<script>var t = "{r.randint(0, 1 << 30)}";</script>
</body></html>"""


def generate_pages(
    n_pages: int = 2000,
    n_domains: int = 10,
    seed: int = 42,
    with_text: bool = True,
) -> tuple[list[dict], list[dict], list[dict]]:
    """Returns (pages_rows, seeds_rows, robots_rows)."""
    tree = site_urls(n_pages, n_domains)
    pages: list[dict] = []
    langs = ["en"] * 17 + ["de", "fr", "es"]
    for domain, urls in tree.items():
        for url in urls:
            h = stable_hash64(url)
            ts = EPOCH + dt.timedelta(seconds=h % (86400 * 90))
            html = render_page(url, domain, tree, seed)
            text = extract_page(url, html)["text"] if with_text else ""
            lang = langs[h % len(langs)]
            pages.append(
                {"url": url, "warc_ts": ts, "html": html.encode(), "text": text,
                 "lang": lang}
            )
            if h % 25 == 0:  # ~4%: an older, different capture (latest wins)
                old_html = render_page(url, domain, tree, seed, revision=1)
                pages.append(
                    {
                        "url": url,
                        "warc_ts": ts - dt.timedelta(days=30),
                        "html": old_html.encode(),
                        "text": extract_page(url, old_html)["text"] if with_text else "",
                        "lang": lang,
                    }
                )
    seeds = [
        {"url": f"https://{d}/", "priority": 1.0} for d in list(tree)[: max(2, n_domains // 2)]
    ] + [{"url": "https://mega.example-shop.com/missing/seed-404", "priority": 0.1}]
    robots: list[dict] = []
    for i, d in enumerate(tree):
        if i % 7 == 3:
            rules = "User-agent: *\nDisallow: /"
        else:
            rules = "User-agent: *\nDisallow: /private/\nDisallow: /*.pdf$\n"
        robots.append({"domain": d, "rules": rules, "fetch_time": EPOCH})
    return pages, seeds, robots


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_dataset(out_dir: str, n_pages: int = 2000, n_domains: int = 10,
                  seed: int = 42, with_text: bool = True) -> dict[str, str]:
    """Write pages/seeds/robots parquet files; returns their paths."""
    os.makedirs(out_dir, exist_ok=True)
    pages, seeds, robots = generate_pages(n_pages, n_domains, seed, with_text)
    paths = {}
    pages_t = pa.Table.from_pylist(pages, schema=PAGES_SCHEMA)
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages_t, paths["pages"])
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(pa.Table.from_pylist(seeds), paths["seeds"])
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    robots_t = pa.Table.from_pylist(
        robots,
        schema=pa.schema(
            [("domain", pa.string()), ("rules", pa.string()),
             ("fetch_time", pa.timestamp("us", tz="UTC"))]
        ),
    )
    pq.write_table(robots_t, paths["robots"])
    return paths
