"""Scraper-output differential fixtures over REFERENCE-GENERATED inputs.

Runs the reference's own dummy-site generator
(/root/reference/tests/general/generate_dummy_site.py — pure stdlib, executed
with a pinned seed, never copied) plus its sample_wikipedia.html asset,
scrapes every page with this repo's kernel (kernel/scraper.py), and freezes
the FULL scraper output surface — links/media/metadata/tables dicts, title,
and digests of text/cleaned_html — into
tests/fixtures/scraper_outputs.json.gz. Page HTML is embedded (gzipped) so
the differential test runs without /root/reference present.

Honesty note: the reference's LXMLWebScrapingStrategy needs lxml, which this
container does not ship, so these fixtures pin THIS repo's scraper as a
byte-exact regression contract over reference-authored inputs (markdown
already has a true reference differential — 90/90 byte-identical via the
vendored pure-python html2text). When lxml is available, rerun with
C4A_REF_SCRAPER=1 to capture the reference outputs instead and diff.

Run once; fixtures are checked in.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import os
import random
import runpy
import sys
import tempfile
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GEN = "/root/reference/tests/general/generate_dummy_site.py"
WIKI = "/root/reference/tests/async/sample_wikipedia.html"
OUT = os.path.join(REPO, "tests", "fixtures", "scraper_outputs.json.gz")


def build_dummy_site(root: Path) -> None:
    random.seed(20260817)
    mod = runpy.run_path(GEN)
    mod["generate_site"](root, site_name="FakeShop", base_path="")


def digest(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def main() -> None:
    from crawl4ai_custom_spark.kernel.scraper import scrap

    pages: list[tuple[str, str]] = []  # (url, html)
    with tempfile.TemporaryDirectory(prefix="dummy_site_") as td:
        site = Path(td) / "site"
        build_dummy_site(site)
        files = sorted(site.rglob("*.html"))
        # every page class: home, categories, subcats, a spread of products,
        # details and reviews pages — capped to keep fixtures reviewable
        keep: list[Path] = []
        for f in files:
            name = f.name
            rel = f.relative_to(site).as_posix()
            if name == "index.html" and rel.count("/") <= 2:
                keep.append(f)
            elif name.startswith("product_") and name.endswith(("1.html", "3.html")):
                keep.append(f)
            elif name.startswith(("details_", "reviews_")) and "001" in name:
                keep.append(f)
        for f in keep:
            rel = f.relative_to(site).as_posix()
            pages.append((f"https://dummy.example/{rel}", f.read_text()))
    pages.append(("https://en.wikipedia.org/wiki/Test",
                  open(WIKI, encoding="utf-8").read()))

    # colspan/rowspan-heavy tables: the dummy-site spec tables score below
    # the keep threshold (as they would in the reference), so exercise the
    # table walk explicitly with data-dense pages
    big_rows = "".join(
        f"<tr><td>r{r}</td>"
        + "".join(f"<td>v{r}c{c}</td>" for c in range(6))
        + "</tr>"
        for r in range(12)
    )
    pages.append((
        "https://tables.example/colspan",
        "<html><head><title>Spans</title></head><body><table>"
        '<caption>Quarterly</caption>'
        "<thead><tr><th>Region</th><th colspan='3'>H1</th>"
        "<th colspan='3'>H2</th><th>Total</th></tr></thead><tbody>"
        + "".join(
            f"<tr><th>R{r}</th>" + "".join(f"<td>{r * 7 + c}</td>" for c in range(7))
            + "</tr>" for r in range(10)
        )
        + "</tbody></table></body></html>",
    ))
    pages.append((
        "https://tables.example/dense",
        "<html><head><title>Dense</title></head><body>"
        f"<table><tr><th>id</th>{''.join(f'<th>h{c}</th>' for c in range(6))}</tr>"
        f"{big_rows}</table><p>after</p></body></html>",
    ))
    pages.append((
        "https://tables.example/rowspan",
        "<html><head><title>Rowspan</title></head><body><table>"
        "<tr><th>a</th><th>b</th><th>c</th></tr>"
        "<tr><td rowspan='2'>tall</td><td>1</td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr>"
        + "".join(f"<tr><td>x{r}</td><td>y{r}</td><td>z{r}</td></tr>"
                  for r in range(8))
        + "</table></body></html>",
    ))

    # hostile structural constructs beyond the dummy-site vocabulary: the
    # scraper walk must stay stable over forms, definition lists, iframes,
    # svg/noscript subtrees, entity soup, and pathological nesting
    pages.append((
        "https://constructs.example/form",
        "<html><head><title>Form</title></head><body>"
        "<form action='/submit' method='post'><fieldset><legend>Login</legend>"
        "<label for='u'>User</label><input id='u' name='u' type='text'>"
        "<select name='s'><option value='1'>one</option>"
        "<option value='2' selected>two</option></select>"
        "<textarea name='t'>preset text</textarea>"
        "<button type='submit'>Go</button></fieldset></form>"
        "<p>after the form.</p></body></html>",
    ))
    pages.append((
        "https://constructs.example/dl",
        "<html><head><title>Defs</title></head><body>"
        "<dl><dt>alpha</dt><dd>first letter</dd>"
        "<dt>beta</dt><dd>second letter</dd><dd>also a fish</dd></dl>"
        "<figure><img src='/img/x.png' alt='an x'>"
        "<figcaption>the x figure</figcaption></figure></body></html>",
    ))
    pages.append((
        "https://constructs.example/iframe-svg",
        "<html><head><title>Embedded</title></head><body>"
        "<iframe src='https://other.example/frame' title='fr'></iframe>"
        "<svg width='10' height='10'><circle cx='5' cy='5' r='4'/>"
        "<text>svg label</text></svg>"
        "<noscript><p>enable scripts please</p></noscript>"
        "<object data='movie.swf'><param name='q' value='hi'>fallback</object>"
        "<p>visible prose stays.</p></body></html>",
    ))
    pages.append((
        "https://constructs.example/entities",
        "<html><head><title>Entit&eacute;s</title></head><body>"
        "<p>AT&amp;T &lt;tag&gt; &#169; &#x2603; &nbsp;gap &amp;notreal;</p>"
        "<p>curly &ldquo;quotes&rdquo; and &mdash; dashes</p></body></html>",
    ))
    pages.append((
        "https://constructs.example/nesting",
        "<html><head><title>Deep</title></head><body>"
        + "<div>" * 60 + "<p>core text survives depth.</p>" + "</div>" * 60
        + "<ul><li>a<ul><li>b<ul><li>c</li></ul></li></ul></li></ul>"
        "</body></html>",
    ))
    pages.append((
        "https://constructs.example/malformed",
        "<html><head><title>Broken</head><body>"
        "<p>unclosed paragraph<div>div inside p</p></div>"
        "<table><tr><td>orphan cell<tr><td>next row"
        "<a href='/rel/link'>anchor<b>bold tail</a>"
        "<p>recovery prose.</p>",
    ))

    # seeded random-grammar pages (same generator as the markdown fuzz
    # contract) wrapped as full documents with base-href + link/media salt:
    # pins the scraper walk over construct interactions nobody hand-wrote
    from make_ref_fixtures import fuzz_corpus

    for name, body in sorted(fuzz_corpus(n_docs=20, seed=915).items()):
        pages.append((
            f"https://fuzz.example/{name}",
            f"<html><head><title>{name}</title>"
            "<base href='https://fuzz-base.example/sub/'>"
            "<meta name='description' content='fuzz page'></head>"
            f"<body>{body}"
            "<a href='../up/rel'>rel</a>"
            "<img src='big.png' width='400' height='300' alt='salted'>"
            "</body></html>",
        ))

    fixtures = []
    for url, html in pages:
        sr = scrap(url, html)
        fixtures.append(
            {
                "url": url,
                "html_b64gz": base64.b64encode(
                    # mtime=0: reproducible bytes, so re-running the
                    # generator yields a clean no-op diff for unchanged pages
                    gzip.compress(html.encode("utf-8"), 9, mtime=0)
                ).decode("ascii"),
                "success": sr.success,
                "title": sr.title,
                "text_md5": digest(sr.text),
                "text_len": len(sr.text),
                "cleaned_html_md5": digest(sr.cleaned_html),
                "links_internal": sr.links_internal,
                "links_external": sr.links_external,
                "images": sr.images,
                "videos": sr.videos,
                "audios": sr.audios,
                "tables": sr.tables,
                "metadata": sr.metadata,
            }
        )
    with gzip.open(OUT, "wt") as f:
        json.dump(fixtures, f, sort_keys=True)
    print(f"wrote {len(fixtures)} scraper fixtures -> {OUT}")


if __name__ == "__main__":
    main()
