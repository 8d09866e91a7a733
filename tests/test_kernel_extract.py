"""Extraction kernel tests: DOM, scraper, markdown, content filters.

Fixture mirrors FIXTURES.md F1 html requirements: head meta/og tags, internal
+ external + tracking + fragment + mailto links, images with srcset, nav and
footer boilerplate, a data table with thead/colspan, a pre/code block.
"""

from crawl4ai_custom_spark.kernel.content_filter import (
    BM25ContentFilter,
    PruningContentFilter,
)
from crawl4ai_custom_spark.kernel.extract import ExtractConfig, extract_page
from crawl4ai_custom_spark.kernel.htmldom import parse_html
from crawl4ai_custom_spark.kernel.markdown import generate_markdown, html_to_markdown
from crawl4ai_custom_spark.kernel.scraper import ScrapeConfig, scrap

URL = "https://shop.example.com/products/widget-1"

PAGE = b"""<!DOCTYPE html>
<html><head>
  <title>Widget One - Example Shop</title>
  <meta name="description" content="The best widget for everything widget related.">
  <meta name="keywords" content="widget, shop, gadgets">
  <meta property="og:title" content="Widget One">
  <meta property="og:image" content="/img/widget1-og.png">
</head>
<body>
  <nav class="nav-main"><a href="/">Home</a> <a href="/products/">Products</a></nav>
  <!-- a comment to strip -->
  <article class="content">
    <h1>Widget One</h1>
    <p>The <strong>Widget One</strong> is the best widget for everything widget
       related. It spins, it shines, and it integrates with your workflow to make
       every day measurably better than the one before.</p>
    <p>See also <a href="/products/widget-2?utm_source=page&b=2&a=1" title="W2">Widget Two</a>
       and our partner <a href="https://partner.example.org/catalog#top">catalog</a>.
       Contact <a href="mailto:sales@example.com">sales</a> or read
       <a href="#reviews">reviews</a>.</p>
    <img src="/img/widget1.png" alt="Widget One glamour shot" width="640" height="480"
         srcset="/img/widget1-2x.png 2x, /img/widget1-1x.png 1x">
    <h2>Specifications</h2>
    <table>
      <caption>Widget One specs</caption>
      <thead><tr><th>Property</th><th colspan="2">Value</th></tr></thead>
      <tbody>
        <tr><td>Weight</td><td>1.2</td><td>kg</td></tr>
        <tr><td>Color</td><td>blue</td><td>RAL5010</td></tr>
      </tbody>
    </table>
    <h2>Install</h2>
    <pre><code class="language-bash">widgetctl install --now</code></pre>
    <ul><li>Fast spin-up</li><li>Low drag <em>coefficient</em></li></ul>
  </article>
  <script>trackEverything();</script>
  <footer class="footer">Copyright 2026 <a href="https://facebook.com/exampleshop">fb</a></footer>
</body></html>"""


def test_scrap_links_split_and_canonicalized():
    sr = scrap(URL, PAGE)
    assert sr.success
    hrefs_int = {l["href"] for l in sr.links_internal}
    hrefs_ext = {l["href"] for l in sr.links_external}
    assert "https://shop.example.com/" in hrefs_int
    assert "https://shop.example.com/products" in hrefs_int
    # tracking param dropped, others kept in order
    assert "https://shop.example.com/products/widget-2?b=2&a=1" in hrefs_int
    # fragment dropped -> page itself
    assert "https://partner.example.org/catalog" in hrefs_ext
    assert "https://facebook.com/exampleshop" in hrefs_ext
    # mailto and bare-fragment excluded entirely
    assert not any("mailto" in h for h in hrefs_int | hrefs_ext)
    assert URL not in hrefs_ext


def test_scrap_social_media_exclusion():
    sr = scrap(URL, PAGE, ScrapeConfig(exclude_social_media_links=True))
    assert not any("facebook" in l["href"] for l in sr.links_external)


def test_scrap_metadata():
    sr = scrap(URL, PAGE)
    assert sr.metadata["title"] == "Widget One - Example Shop"
    assert sr.metadata["og:title"] == "Widget One"
    assert "widget" in sr.metadata["keywords"]


def test_scrap_images_scored():
    sr = scrap(URL, PAGE)
    assert len(sr.images) == 1
    img = sr.images[0]
    assert img["src"] == "https://shop.example.com/img/widget1.png"
    assert img["score"] >= 3
    assert "https://shop.example.com/img/widget1-2x.png" in img["variants"]


def test_scrap_table_extracted_with_colspan():
    sr = scrap(URL, PAGE)
    assert len(sr.tables) == 1
    t = sr.tables[0]
    assert t["headers"] == ["Property", "Value", ""]
    assert t["rows"][0] == ["Weight", "1.2", "kg"]
    assert t["caption"] == "Widget One specs"


def test_scrap_cleanup_removes_script_and_comments():
    sr = scrap(URL, PAGE)
    assert "trackEverything" not in sr.cleaned_html
    assert "<!--" not in sr.cleaned_html
    assert 'class="nav-main"' not in sr.cleaned_html  # attrs stripped to keep-list
    assert 'class="content"' not in sr.cleaned_html


def test_markdown_blocks():
    md = generate_markdown(parse_html(scrap(URL, PAGE).cleaned_html))
    assert "# Widget One" in md.raw_markdown
    assert "## Specifications" in md.raw_markdown
    assert "**Widget One**" in md.raw_markdown
    # reference byte contract: plain fences (language class dropped),
    # '  * ' bullets, 'a| b' table cells (see tests/test_ref_differential.py)
    assert "```\nwidgetctl install --now\n```" in md.raw_markdown
    assert "  * Fast spin-up" in md.raw_markdown
    assert "Property| Value" in md.raw_markdown
    # anchor title attributes render as (url "title"), as in the reference
    assert '[Widget Two](https://shop.example.com/products/widget-2?b=2&a=1 "W2")' in md.raw_markdown


def test_markdown_citations():
    md = generate_markdown(parse_html(scrap(URL, PAGE).cleaned_html))
    assert "⟨1⟩" in md.markdown_with_citations
    # reference format (mgs.py:140): leading blank lines + '## References'
    assert md.references_markdown.startswith("\n\n## References\n\n")
    assert "https://shop.example.com/products/widget-2?b=2&a=1" in md.references_markdown


def test_markdown_deterministic():
    a = generate_markdown(parse_html(scrap(URL, PAGE).cleaned_html))
    b = generate_markdown(parse_html(scrap(URL, PAGE).cleaned_html))
    assert a.raw_markdown == b.raw_markdown
    assert a.markdown_with_citations == b.markdown_with_citations


def test_pruning_filter_drops_boilerplate_keeps_article():
    sr = scrap(URL, PAGE)
    # reference contract: filter_content returns a LIST of block fragments
    fit = "\n".join(
        PruningContentFilter().filter_content(parse_html(sr.cleaned_html)))
    assert "best widget for everything" in fit
    assert "Copyright 2026" not in fit


def test_bm25_filter_keeps_query_relevant_chunks():
    html = parse_html(PAGE.decode())
    fit = "\n".join(
        BM25ContentFilter(user_query="widget").filter_content(html))
    assert "widget" in fit.lower()
    assert "Copyright" not in fit


def test_extract_page_end_to_end():
    row = extract_page(URL, PAGE)
    assert row["success"]
    assert row["title"] == "Widget One - Example Shop"
    assert row["raw_markdown"].startswith("# Widget One") or "# Widget One" in row["raw_markdown"]
    assert row["fit_markdown"]
    assert any(l["is_internal"] for l in row["links"])
    assert any(not l["is_internal"] for l in row["links"])
    assert row["tables"][0]["rows"][1] == ["Color", "blue", "RAL5010"]


def test_extract_page_pure():
    assert extract_page(URL, PAGE) == extract_page(URL, PAGE)


def test_extract_page_tolerates_garbage():
    row = extract_page("https://x.example.com/", b"\xff\xfe<not html <<<")
    assert row["url"] == "https://x.example.com/"
    row2 = extract_page("https://x.example.com/", b"")
    assert isinstance(row2["text"], str)


def test_markdown_nested_lists_and_blockquote():
    html = """<body><blockquote><p>Quoted wisdom</p></blockquote>
    <ol><li>one<ul><li>sub a</li></ul></li><li>two</li></ol></body>"""
    md, _ = html_to_markdown(html)
    assert "> Quoted wisdom" in md
    assert "  1. one" in md
    assert "    * sub a" in md
    assert "  2. two" in md


# ---- preprocess_html_for_schema (fit_html producer) -------------------------


def test_schemaprep_removes_head_and_noise_tags():
    from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

    h = ("<html><head><title>T</title><style>.a{}</style></head><body>"
         "<script>x()</script><noscript>n</noscript><iframe src='u'></iframe>"
         "<svg><g></g></svg><video controls></video><p>keep</p></body></html>")
    out = preprocess_html_for_schema(h)
    assert out == "<html><body><p>keep</p></body></html>"


def test_schemaprep_attr_whitelist_and_truncation():
    from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

    h = ('<html><body><a href="/x" style="c" id="i" class="k" name="n" '
         'type="t" value="v" data-z="1" aria-label="drop">t</a></body></html>')
    out = preprocess_html_for_schema(h)
    assert 'href' not in out and 'style' not in out and 'aria' not in out
    for keep in ('id="i"', 'class="k"', 'name="n"', 'type="t"', 'value="v"',
                 'data-z="1"'):
        assert keep in out
    long = "<html><body><div id=\"" + "x" * 250 + "\">t</div></body></html>"
    out2 = preprocess_html_for_schema(long)
    assert '"' + "x" * 200 + '..."' in out2


def test_schemaprep_text_truncation_strips_then_cuts():
    from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

    h = "<html><body><p>  " + "w" * 150 + "  </p><p> short </p></body></html>"
    out = preprocess_html_for_schema(h)
    # truncation fires -> stripped prefix + '...'; short run keeps its spaces
    assert "<p>" + "w" * 100 + "...</p>" in out
    assert "<p> short </p>" in out
    # tail text (after an element) truncates the same way
    h2 = "<html><body><div><b>b</b>" + "y" * 150 + "</div></body></html>"
    assert "y" * 100 + "..." in preprocess_html_for_schema(h2)


def test_schemaprep_dedup_keeps_first_per_tag_class_text():
    from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

    h = ('<html><body><div class="c">same</div><div class="c">same</div>'
         '<div class="c">other</div><span class="c">same</span>'
         "<div>same</div></body></html>")
    out = preprocess_html_for_schema(h)
    # duplicate (div, c, same) removed; different text / tag / class-less kept
    assert out.count('<div class="c">same</div>') == 1
    assert '<div class="c">other</div>' in out
    assert '<span class="c">same</span>' in out
    assert "<div>same</div>" in out


def test_schemaprep_max_size_cap_and_idempotent_shapes():
    from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

    h = "<html><body>" + "<p>para</p>" * 500 + "</body></html>"
    out = preprocess_html_for_schema(h, max_size=100)
    assert len(out) == 103 and out.endswith("...")
    # under the cap -> untouched tail
    out2 = preprocess_html_for_schema("<html><body><p>a</p></body></html>")
    assert out2.endswith("</body></html>")


def test_extract_page_fit_html_is_schema_prep():
    from crawl4ai_custom_spark.kernel.extract import ExtractConfig, extract_page
    from crawl4ai_custom_spark.kernel.schemaprep import fit_html_for_page

    html = ("<html><head><title>T</title></head><body>"
            '<div class="card" style="x"><h2>Item</h2><p>'
            + "desc " * 200 + "</p></div></body></html>")
    row = extract_page("http://e.com/", html)
    assert row["fit_html"] == fit_html_for_page(html)
    assert "style=" not in row["fit_html"]
    # opt-out skips the second parse
    cfg = ExtractConfig(schema_fit_html=False)
    assert extract_page("http://e.com/", html, cfg)["fit_html"] == ""


def test_fit_html_shared_parse_equals_standalone():
    from crawl4ai_custom_spark.kernel.htmldom import parse_html
    from crawl4ai_custom_spark.kernel.schemaprep import fit_html_for_page

    html = ("<html><head><title>T</title></head><body>"
            '<div class="c" style="x">' + "t " * 300 + "</div>"
            '<div class="c">' + "t " * 300 + "</div>"
            "<script>j()</script></body></html>")
    tree = parse_html(html)
    before = tree.to_html()
    assert fit_html_for_page(html, tree=tree) == fit_html_for_page(html)
    # the donated tree must not be mutated (scrap consumes it afterwards)
    assert tree.to_html() == before
