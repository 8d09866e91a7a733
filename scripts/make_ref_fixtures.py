"""Generate golden markdown fixtures FROM THE REFERENCE implementation.

Loads the reference's vendored html2text subpackage directly from its path
(bypassing crawl4ai/__init__.py, whose import chain needs packages this
container lacks), runs CustomHTML2Text with DefaultMarkdownGenerator's
default options (markdown_generation_strategy.py:180-200), and writes
(html -> reference raw_markdown) pairs to tests/fixtures/ref_markdown.json.

Run once; the fixtures are checked in so the differential test
(tests/test_ref_differential.py) runs without the reference present.
Only reference OUTPUTS are captured — no reference code is copied.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REF = "/root/reference/crawl4ai/html2text"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "ref_markdown.json")

# A corpus covering the constructs a web-text pipeline actually meets.
CORPUS: dict[str, str] = {
    "heading_para": '<h1>Title</h1><p>Hello <b>world</b> &amp; '
                    '<a href="/x" title="T">link</a>.</p>',
    "paras": "<p>one</p><p>two</p><p>three</p>",
    "headings_seq": "<h1>A</h1><h2>B</h2><p>t</p>",
    "ul": "<ul><li>a</li><li>b</li></ul><p>after</p>",
    "ul_nested": "<ul><li>a</li><li>b<ul><li>b1</li></ul></li></ul>",
    "ol_nested": "<ol><li>one<ol><li>inner</li></ol></li><li>two</li></ol>",
    "list_then_heading": "<p>before</p><ul><li>a</li></ul><h2>Head</h2>",
    "li_with_para": "<ul><li><p>para in li</p></li><li>plain</li></ul>",
    "pre_code": '<pre><code class="language-py">x = 1\ny = 2</code></pre>',
    "pre_then_para": "<pre>code here</pre><p>after</p>",
    "pre_entities": "<pre><code>x&lt;1</code></pre>",
    "blockquote_hr_br": "<blockquote><p>quoted</p></blockquote><hr>"
                        "<p>after<br>break</p>",
    "table": "<table><tr><th>A</th><th>B</th></tr>"
             "<tr><td>1</td><td>2</td></tr></table>",
    "table_body": "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
                  "<tbody><tr><td>1</td><td>2</td></tr>"
                  "<tr><td>3</td><td>4</td></tr></tbody></table><p>after</p>",
    "inline_mix": '<p>em <i>ital</i> and <code>inline</code> and '
                  '<img src="/i.png" alt="pic"></p>',
    "links": '<p>a <a href="/x">x</a> b <a href="https://e.com/">e</a></p>',
    "entities": "<p>A&nbsp;B &lt;tag&gt; &copy; &mdash; &rsquo;</p>",
    "emph_adjacent": "<p><strong>b</strong> _plain_ <em>i</em></p>",
    "div_text": "<div>just text</div>",
    "specials": "<p>escape * star _ under # hash</p>",
    "skip_tags": "<script>var x;</script><style>.a{}</style><p>visible</p>",
    "article_page": "<html><head><title>T</title></head><body><article>"
                    "<h2>Post</h2><p>Intro para with a "
                    '<a href="https://site.example/ref">ref</a>.</p>'
                    "<ul><li>point one</li><li>point two</li></ul>"
                    "<p>Closing.</p></article></body></html>",
    "docs_page": "<html><body><main><h1>Guide</h1>"
                 "<p>Install with:</p><pre><code>pip install x</code></pre>"
                 "<h2>Options</h2><table><tr><th>flag</th><th>meaning</th></tr>"
                 "<tr><td>-v</td><td>verbose</td></tr></table></main>"
                 "</body></html>",
    "messy_whitespace": "<p>  lots   of\n  spaces </p>\n\n<p>next</p>",
    "empty_emphasis": "<p>x <b></b> y <i> </i> z</p>",
    "anchor_no_href": "<p><a>bare anchor</a> end</p>",
    "sup_sub_del": "<p>x<sup>2</sup> and H<sub>2</sub>O and <del>gone</del> "
                   "<s>also</s></p>",
    "bq_multi_para": "<blockquote><p>one</p><p>two</p></blockquote>",
    "bq_nested": "<blockquote><blockquote><p>deep</p></blockquote>"
                 "</blockquote>",
    "img_inside_link": '<p><a href="/x"><img src="/i.png" alt="pic"></a></p>',
    "heading_with_link": '<h2>Head <a href="/h">with link</a></h2>',
    "li_inline_bold": "<ul><li>item <b>bold</b> tail</li></ul>",
    "multi_br": "<p>a<br/>b<br>c</p>",
    "figure_caption": '<figure><img src="/f.png" alt="fig">'
                      "<figcaption>Cap</figcaption></figure>",
    "dl_dt_dd": "<dl><dt>term</dt><dd>definition</dd>"
                "<dt>t2</dt><dd>d2</dd></dl>",
    "table_colspan": '<table><tr><th colspan="2">Wide</th></tr>'
                     "<tr><td>1</td><td>2</td></tr></table>",
    "deep_nested_list": "<ul><li>a<ul><li>b<ul><li>c</li></ul></li></ul>"
                        "</li></ul>",
    "ol_start": '<ol start="5"><li>five</li><li>six</li></ol>',
    "code_in_li": "<ul><li>use <code>pip</code> now</li></ul>",
    "hr_between": "<p>a</p><hr/><p>b</p>",
    "h3_to_h6": "<h3>c</h3><h4>d</h4><h5>e</h5><h6>f</h6><p>t</p>",
    "entities_numeric": "<p>&#65;&#x42; &amp;#65;</p>",
    "strong_em_nested": "<p><strong><em>both</em></strong> tail</p>",
    "space_around_emph": "<p>a <b> b </b> c</p>",
    "empty_paras": "<p></p><p>x</p><p>  </p><p>y</p>",
    "unicode_text": "<p>naïve café — ünïcødé 中文 ok</p>",
    "link_in_list": '<ul><li><a href="/a">A</a> then</li>'
                    '<li>pre <a href="/b">B</a></li></ul>',
    "para_in_blockquote_list": "<blockquote><ul><li>q item</li></ul>"
                               "</blockquote>",
    # -- round-3 hostile constructs ------------------------------------
    "nested_tables": "<table><tr><td>outer<table><tr><td>inner</td></tr>"
                     "</table></td><td>b</td></tr></table><p>after</p>",
    "entity_soup": "<p>&amp;amp; &lt;&lt; &gt; &quot; &#39; &nbsp;&nbsp;"
                   "&mdash;&ndash; &rsquo;&lsquo; &copy;&middot; "
                   "&rarr;&larr; &eacute;&uuml; &oelig; &lrm;x&rlm;</p>",
    "deep_list_6": "<ul><li>1<ul><li>2<ul><li>3<ul><li>4<ul><li>5<ul>"
                   "<li>6</li></ul></li></ul></li></ul></li></ul></li>"
                   "</ul></li></ul>",
    "ol_in_ul_in_ol": "<ol><li>a<ul><li>b<ol><li>c</li></ol></li></ul>"
                      "</li></ol>",
    "link_title_quotes": '<p><a href="/x" title="has (parens) and '
                         '[brackets]">t</a></p>',
    "url_needs_escape": '<p><a href="/a(b)c_d">x</a> '
                        '<img src="/i(1).png" alt="a[b]"></p>',
    "autolink": '<p><a href="https://ex.com/p">https://ex.com/p</a> and '
                '<a href="ftp://f.com/">ftp://f.com/</a></p>',
    "empty_link_and_mailto": '<p><a href="/e"></a><a href="mailto:x@y.z">'
                             "mail</a>.</p>",
    "code_in_link": '<p><a href="/c">see <code>fn()</code> docs</a></p>',
    "u_q_kbd_tt": "<p><u>under</u> <q>quoted</q> <kbd>Ctrl</kbd> "
                  "<tt>mono</tt></p>",
    "abbr_titles": '<p><abbr title="HyperText Markup Language">HTML</abbr> '
                   'and <abbr title="CSS def">CSS</abbr> twice '
                   '<abbr title="HyperText Markup Language">HTML</abbr></p>',
    "dl_nested_dd": "<dl><dt>t1</dt><dd>d1 <b>bold</b></dd><dt>t2</dt>"
                    "<dd>d2<ul><li>li in dd</li></ul></dd></dl><p>after</p>",
    "stress_boundaries": "<p>a<b>b</b>c <i>i</i>. (<b>p</b>) [<i>q</i>] "
                         "x<em>y</em>!</p>",
    "emphasis_after_star": "<p>*<b>bold</b> and text*<i>it</i></p>",
    "header_soup": "<h3>Head <b>bold</b> <a href='/h'>link</a> tail</h3>"
                   "<p>t</p>",
    "pre_with_markup": "<pre>line1\n  <b>not-bold</b> &lt;tag&gt;\n"
                       "\tline3</pre><p>after</p>",
    "table_in_list": "<ul><li>item<table><tr><td>a</td><td>b</td></tr>"
                     "</table></li><li>next</li></ul>",
    "br_soup": "<p>a<br><br>b</p><blockquote>c<br>d</blockquote>",
    "unclosed_tags": "<p>one<p>two<b>bold<p>three</b>plain",
    "sup_sub_mixed": "<p>E=mc<sup>2</sup> and H<sub>2</sub>O ratio "
                     "x<sup>a+b</sup></p>",
    "strike_mix": "<p>~<del>gone</del> <s>also</s>~~<strike>third"
                  "</strike></p>",
    "div_soup": "<div><div><div>deep</div></div><div>sib</div></div>",
    "whitespace_only_blocks": "<p>  </p><div>\n\t</div><p>real</p>"
                              "<blockquote>   </blockquote><p>end</p>",
    "comment_and_cdata": "<p>a<!-- hidden -->b</p><!--top--><p>c</p>",
    "mixed_inline_block": "<span>free span</span><p>para</p>plain text"
                          "<section><p>in section</p></section>",
    "entity_in_attr": '<p><a href="?b=1&ndash;2&amp;c=3" title="A&mdash;B">'
                      "x</a> &ndash; text</p>",
    # HTML5 semantic / interactive / annotation constructs (round 4):
    # every case verified byte-identical before inclusion
    "details": "<details><summary>More</summary><p>hidden prose</p></details>",
    "audio_video": "<p>before</p><audio src='/a.mp3' controls>no audio</audio>"
                   "<video src='/v.mp4'><track kind='captions'>fallback"
                   "</video><p>after</p>",
    "ruby": "<p><ruby>漢<rt>kan</rt></ruby> text</p>",
    "subsup": "<p>H<sub>2</sub>O and x<sup>2</sup></p>",
    "del_ins": "<p>old <del>gone</del> <ins>added</ins> <s>struck</s></p>",
    "kbd_samp": "<p>press <kbd>Ctrl</kbd> see <samp>out</samp> var "
                "<var>x</var></p>",
    "mark_meter": "<p><mark>hot</mark> <meter value='0.5'>50%</meter> "
                  "<progress value='1'>p</progress></p>",
    "picture": "<picture><source srcset='/big.png'>"
               "<img src='/small.png' alt='pic'></picture>",
    "template": "<p>a</p><template><p>never rendered</p></template><p>b</p>",
    "bdo_wbr": "<p><bdo dir='rtl'>abc</bdo> long<wbr>word</p>",
    "address": "<address>1 Main St<br>Town</address>",
    "small_center_font": "<center><small>tiny</small> "
                         "<font color='red'>red</font></center>",
    "map_area": "<img src='/m.png' usemap='#m' alt='map'>"
                "<map name='m'><area href='/x' alt='x'></map>",
    "abbr": "<p><abbr title='World Health Organization'>WHO</abbr> said</p>",
    "q_cite": "<p><q>inline quote</q> from <cite>book</cite></p>",
    "dfn_time": "<p><dfn>term</dfn> at "
                "<time datetime='2026-01-01'>new year</time></p>",
    "datalist": "<input list='l'><datalist id='l'><option value='a'>"
                "</datalist><p>after</p>",
    "hgroup_section": "<section><hgroup><h1>T</h1><h2>Sub</h2></hgroup>"
                      "<article><p>body</p></article></section>",
    # nesting interactions (round 4, batch 2): block elements inside list
    # items / blockquotes / table cells, links wrapping media, numbered-list
    # attributes — all verified byte-identical before inclusion
    "pre_in_li": "<ul><li>code:<pre>x = 1\ny = 2</pre></li><li>next</li></ul>",
    "blockquote_nested": "<blockquote><p>outer</p><blockquote><p>inner</p>"
                         "</blockquote></blockquote>",
    "blockquote_in_li": "<ul><li><blockquote>quoted in list</blockquote>"
                        "</li></ul>",
    "img_in_link": '<p><a href="/x"><img src="/i.png" alt="pic"></a></p>',
    "link_in_heading": '<h2><a href="/sec">Section</a></h2>',
    "em_across_br": "<p><em>one<br>two</em></p>",
    "code_with_specials": "<p><code>a*b_c`d</code></p>",
    "table_empty_cells": "<table><tr><td></td><td>b</td></tr>"
                         "<tr><td>c</td><td></td></tr></table>",
    "table_nested": "<table><tr><td><table><tr><td>in</td></tr></table>"
                    "</td><td>out</td></tr></table>",
    "ol_start_value": "<ol start='5'><li>five</li><li value='9'>nine</li></ol>",
    "dl_nested_dl": "<dl><dt>a</dt><dd><dl><dt>b</dt><dd>c</dd></dl></dd></dl>",
    "heading_in_li": "<ul><li><h3>head in li</h3>text</li></ul>",
    "hr_in_blockquote": "<blockquote>a<hr>b</blockquote>",
    "multiple_br": "<p>a<br><br><br>b</p>",
    "link_title_dquotes": "<p><a href='/x' title='say \"hi\"'>q</a></p>",
    "empty_link": "<p><a href='/x'></a>after</p>",
    "anchor_name_only": "<p><a name='top'>anchored text</a></p>",
    "pre_inline_tags": "<pre>line <b>bold</b> &amp; <i>ital</i></pre>",
    "whitespace_pre_wrap": "<p>   leading and trailing   </p>",
    # pathological cases (round 4, batch 3) — all verified byte-identical
    "tfoot_caption": "<table><caption>Cap</caption><thead><tr><th>h</th>"
                     "</tr></thead><tfoot><tr><td>f</td></tr></tfoot>"
                     "<tbody><tr><td>b</td></tr></tbody></table>",
    "deep_list_8": "<ul><li>1<ul><li>2<ul><li>3<ul><li>4<ul><li>5<ul><li>6"
                   "<ul><li>7<ul><li>8</li></ul></li></ul></li></ul></li>"
                   "</ul></li></ul></li></ul></li></ul></li></ul>",
    # NUL entity only: a lone-surrogate entity (&#xD800;) round-trips
    # through the converter as an unpaired surrogate char, which cannot be
    # UTF-8/JSON serialized into the fixture file — covered by the
    # adversarial Spark tests instead
    "null_entity": "<p>a&#0;b c</p>",
    "rtl_mixed": "<p>english العربية mixed עברית text</p>",
    "lang_class_code": '<pre><code class="language-rust">fn main() {}'
                       "</code></pre>",
    "triple_mixed_lists": "<ol><li>o1<ul><li>u1<ol><li>io1</li></ol></li>"
                          "</ul></li></ol>",
    "li_text_after_block": "<ul><li><p>para</p>tail text</li></ul>",
    "emph_double_nested": "<p><strong><em>both</em></strong> and "
                          "<em><strong>swap</strong></em></p>",
    "two_tables_adjacent": "<table><tr><td>t1</td></tr></table>"
                           "<table><tr><td>t2</td></tr></table>",
    "link_with_newlines": "<p><a href='/x'>line\none\ntwo</a></p>",
    "img_no_alt_no_src": "<p><img> <img src='/y.png'> "
                         "<img alt='only alt'></p>",
    "heading_7_invalid": "<h7>not a heading</h7><p>after</p>",
    "duplicate_attrs": "<p><a href='/a' href='/b'>dup</a></p>",
    "uppercase_tags": "<P>UPPER <B>BOLD</B> <A HREF='/X'>LINK</A></P>",
    "self_closed_div": "<div/>text after<p>para</p>",
    "entity_decimal_big": "<p>&#128512; &#65536; edge</p>",
    "table_th_only": "<table><tr><th>only</th><th>heads</th></tr></table>",
    "br_at_boundaries": "<p><br>lead</p><p>trail<br></p>",
    "list_no_li": "<ul>loose text</ul><ol><p>para in ol</p></ol>",
    "blockquote_list": "<blockquote><ul><li>in quote</li><li>two</li>"
                       "</ul></blockquote>",
}


def load_ref_html2text():
    spec = importlib.util.spec_from_file_location(
        "ref_html2text", os.path.join(REF, "__init__.py"),
        submodule_search_locations=[REF],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_html2text"] = mod
    spec.loader.exec_module(mod)
    return mod


def fuzz_corpus(n_docs: int = 120, seed: int = 20260817) -> dict[str, str]:
    """Deterministic random-construct pages: a seeded recursive grammar over
    the block/inline constructs the converter handles, so the byte contract
    covers construct INTERACTIONS no hand-written case thought of. Same
    seed -> same corpus forever (fixtures stay reproducible)."""
    import random

    rng = random.Random(seed)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "crawl parse merge shard token window filter bucket join "
             "star*mark under_score hash#tag amp&ersand tilde~x").split()

    def text(lo=1, hi=6):
        return " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi)))

    def inline(depth=0):
        r = rng.random()
        if depth > 2 or r < 0.45:
            return text()
        if r < 0.55:
            return f"<b>{inline(depth + 1)}</b>"
        if r < 0.65:
            return f"<em>{inline(depth + 1)}</em>"
        if r < 0.75:
            return f'<a href="/{text(1, 1)}/{rng.randint(0, 99)}">{inline(depth + 1)}</a>'
        if r < 0.82:
            return f"<code>{text(1, 3)}</code>"
        if r < 0.88:
            return f'<img src="/i{rng.randint(0, 9)}.png" alt="{text(1, 2)}">'
        if r < 0.94:
            return f"{text()}&nbsp;&mdash;&nbsp;{text(1, 2)}"
        return f"{inline(depth + 1)}<br>{inline(depth + 1)}"

    def list_block(depth):
        tag = rng.choice(("ul", "ol"))
        items = []
        for _ in range(rng.randint(1, 4)):
            body = inline()
            if depth < 2 and rng.random() < 0.35:
                body += list_block(depth + 1)
            items.append(f"<li>{body}</li>")
        return f"<{tag}>{''.join(items)}</{tag}>"

    def table_block():
        cols = rng.randint(1, 3)
        head = "".join(f"<th>{text(1, 2)}</th>" for _ in range(cols))
        rows = "".join(
            "<tr>" + "".join(f"<td>{inline()}</td>" for _ in range(cols)) + "</tr>"
            for _ in range(rng.randint(1, 3))
        )
        return f"<table><tr>{head}</tr>{rows}</table>"

    def block(depth=0):
        r = rng.random()
        if r < 0.3:
            return f"<p>{inline()}</p>"
        if r < 0.42:
            return f"<h{rng.randint(1, 6)}>{text(1, 4)}</h{rng.randint(1, 6)}>"
        if r < 0.56:
            return list_block(0)
        if r < 0.64:
            return f"<pre><code>{text(2, 5)}\n{text(1, 4)}</code></pre>"
        if r < 0.72 and depth < 2:
            return f"<blockquote>{block(depth + 1)}{block(depth + 1)}</blockquote>"
        if r < 0.8:
            return table_block()
        if r < 0.86:
            return "<hr>"
        if r < 0.94 and depth < 2:
            return f"<div>{block(depth + 1)}{inline()}</div>"
        return f"<p>{inline()}<br>{inline()}</p>"

    return {
        f"fuzz_{i:03d}": "".join(block() for _ in range(rng.randint(2, 6)))
        for i in range(n_docs)
    }


def main() -> None:
    mod = load_ref_html2text()
    fixtures = {}
    corpus = dict(CORPUS)
    corpus.update(fuzz_corpus())
    for name, html in corpus.items():
        # CustomHTML2Text keeps state across handle() calls — a fresh
        # instance per document matches how the generator drives it
        # (markdown_generation_strategy.py builds one per convert).
        h = mod.CustomHTML2Text()
        h.update_params(**{
            "body_width": 0, "ignore_emphasis": False, "ignore_links": False,
            "ignore_images": False, "protect_links": False,
            "single_line_break": True, "mark_code": True, "escape_snob": False,
        })
        raw = h.handle(html)
        raw = raw.replace("    ```", "```")  # generator post-step, mgs.py:214
        fixtures[name] = {"html": html, "ref_raw_markdown": raw}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixtures, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(fixtures)} fixtures -> {OUT}")


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Real-page differential corpus: the reference's own 768 KB wikipedia fixture
# (/root/reference/tests/async/sample_wikipedia.html, exercised by
# tests/async/test_content_scraper_strategy.py:30-58) plus a seeded run of
# the reference's dummy-site generator
# (/root/reference/tests/general/generate_dummy_site.py). Captured through
# the same reference converter and stored gzipped.

PAGES_OUT = os.path.join(os.path.dirname(OUT), "ref_markdown_pages.json.gz")
WIKI = "/root/reference/tests/async/sample_wikipedia.html"
DUMMY_GEN = "/root/reference/tests/general/generate_dummy_site.py"


def make_page_fixtures() -> None:
    import glob
    import gzip
    import random
    import runpy
    import tempfile

    mod = load_ref_html2text()

    def ref_md(html: str) -> str:
        h = mod.CustomHTML2Text()
        h.update_params(**{
            "body_width": 0, "ignore_emphasis": False, "ignore_links": False,
            "ignore_images": False, "protect_links": False,
            "single_line_break": True, "mark_code": True, "escape_snob": False,
        })
        return h.handle(html).replace("    ```", "```")

    pages: dict[str, str] = {}
    with open(WIKI, encoding="utf-8") as f:
        pages["wikipedia_apple"] = f.read()

    with tempfile.TemporaryDirectory() as tmp:
        random.seed(42)
        argv, sys.argv = sys.argv, [DUMMY_GEN, "-o", tmp, "-n", "FakeShop"]
        try:
            runpy.run_path(DUMMY_GEN, run_name="__main__")
        finally:
            sys.argv = argv
        paths = sorted(glob.glob(os.path.join(tmp, "**", "*.html"),
                                 recursive=True))
        # one of each page family + breadth across categories
        for p in paths[::7]:
            name = "dummy_" + os.path.relpath(p, tmp).replace("/", "_")
            with open(p, encoding="utf-8") as f:
                pages[name] = f.read()

    # hostile structural constructs (same corpus as the scraper byte
    # contract): pin the REFERENCE converter's output on forms, definition
    # lists, embedded subtrees, entity soup, deep nesting, and tag soup
    pages["construct_form"] = (
        "<html><head><title>Form</title></head><body>"
        "<form action='/submit' method='post'><fieldset><legend>Login</legend>"
        "<label for='u'>User</label><input id='u' name='u' type='text'>"
        "<select name='s'><option value='1'>one</option>"
        "<option value='2' selected>two</option></select>"
        "<textarea name='t'>preset text</textarea>"
        "<button type='submit'>Go</button></fieldset></form>"
        "<p>after the form.</p></body></html>"
    )
    pages["construct_dl"] = (
        "<html><head><title>Defs</title></head><body>"
        "<dl><dt>alpha</dt><dd>first letter</dd>"
        "<dt>beta</dt><dd>second letter</dd><dd>also a fish</dd></dl>"
        "<figure><img src='/img/x.png' alt='an x'>"
        "<figcaption>the x figure</figcaption></figure></body></html>"
    )
    pages["construct_iframe_svg"] = (
        "<html><head><title>Embedded</title></head><body>"
        "<iframe src='https://other.example/frame' title='fr'></iframe>"
        "<svg width='10' height='10'><circle cx='5' cy='5' r='4'/>"
        "<text>svg label</text></svg>"
        "<noscript><p>enable scripts please</p></noscript>"
        "<object data='movie.swf'><param name='q' value='hi'>fallback</object>"
        "<p>visible prose stays.</p></body></html>"
    )
    pages["construct_entities"] = (
        "<html><head><title>Entit&eacute;s</title></head><body>"
        "<p>AT&amp;T &lt;tag&gt; &#169; &#x2603; &nbsp;gap &amp;notreal;</p>"
        "<p>curly &ldquo;quotes&rdquo; and &mdash; dashes</p></body></html>"
    )
    pages["construct_nesting"] = (
        "<html><head><title>Deep</title></head><body>"
        + "<div>" * 60 + "<p>core text survives depth.</p>" + "</div>" * 60
        + "<ul><li>a<ul><li>b<ul><li>c</li></ul></li></ul></li></ul>"
        "</body></html>"
    )
    pages["construct_malformed"] = (
        "<html><head><title>Broken</head><body>"
        "<p>unclosed paragraph<div>div inside p</p></div>"
        "<table><tr><td>orphan cell<tr><td>next row"
        "<a href='/rel/link'>anchor<b>bold tail</a>"
        "<p>recovery prose.</p>"
    )

    fixtures = {n: {"html": h, "ref_raw_markdown": ref_md(h)}
                for n, h in pages.items()}
    with gzip.open(PAGES_OUT, "wt", encoding="utf-8") as f:
        json.dump(fixtures, f, ensure_ascii=False)
    print(f"wrote {len(fixtures)} page fixtures -> {PAGES_OUT}")
