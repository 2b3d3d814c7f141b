"""HTML DOM front-end: boilerplate heuristics, table aggregation,
pre preservation, img handling."""

from vlm_ocr_pipeline_spark.functions.html_extract import (
    classify_blocks,
    detect_html_blocks,
    extract_html_page,
)


def _types_texts(html):
    page = extract_html_page(html)
    return [(b["type"], b["text"]) for b in page["blocks"]]


def test_nav_header_footer_aside_discarded():
    html = """<body>
    <header><p>Site banner text long enough to not be length-dropped</p></header>
    <nav><ul><li><a href="/">Home</a></li></ul></nav>
    <aside><p>side content that is long enough to otherwise stay</p></aside>
    <main><p>real main content paragraph that definitely stays here</p></main>
    <footer><p>copyright notice long enough to pass the length rule</p></footer>
    </body>"""
    tt = _types_texts(html)
    kept = [t for t, _ in tt if t != "discarded" and t != "image"]
    assert kept == ["text"]


def test_link_density_boilerplate():
    linky = '<p><a href="/a">one link</a> <a href="/b">two link</a> and</p>'
    texty = "<p>" + "word " * 30 + '<a href="/c">tiny</a></p>'
    page = extract_html_page(f"<body>{linky}{texty}</body>")
    assert page["blocks"][0]["type"] == "discarded"
    assert page["blocks"][1]["type"] == "text"


def test_short_blocks_dropped():
    page = extract_html_page("<body><p>ok</p><p>long enough text</p></body>")
    assert [b["type"] for b in page["blocks"]] == ["discarded", "text"]


def test_heading_types():
    page = extract_html_page("<body><h1>Big Title Here</h1><h3>Sub Title Here</h3></body>")
    assert [b["type"] for b in page["blocks"]] == ["title", "title"]


def test_table_cells_aggregate_with_pipes():
    html = """<body><table>
    <tr><th>name</th><th>value</th></tr>
    <tr><td>alpha</td><td>one</td></tr>
    </table></body>"""
    page = extract_html_page(html)
    tbl = page["blocks"][0]
    assert tbl["type"] == "table"
    assert tbl["text"] == "name | value\nalpha | one"


def test_pre_preserves_whitespace():
    html = "<body><pre>def f():\n    return 1</pre></body>"
    page = extract_html_page(html)
    assert page["blocks"][0]["type"] == "code"
    assert page["blocks"][0]["text"] == "def f():\n    return 1"


def test_img_alt_becomes_description():
    html = '<body><img src="x.png" alt="a nice chart"><p>text long enough to stay</p></body>'
    page = extract_html_page(html)
    img = page["blocks"][0]
    assert img["type"] == "image"
    assert img["description"] == "a nice chart"
    assert img["text"] is None


def test_dom_order_assigned_at_detect_time():
    html = "<body><h1>Title Here Long</h1><p>first paragraph long enough</p><p>second paragraph long enough</p></body>"
    page = extract_html_page(html)
    assert [b["order"] for b in page["blocks"]] == [0, 1, 2]
    # bbox packs (depth, dom index) so geometric y-sort == DOM order
    ys = [b["y0"] for b in page["blocks"]]
    assert ys == sorted(ys)


def test_entities_unescaped():
    page = extract_html_page("<body><p>a &amp; b &lt; c longer padding text</p></body>")
    assert "a & b < c" in page["blocks"][0]["text"]


def test_malformed_html_no_crash():
    page = extract_html_page("<body><p>unclosed paragraph <div><p>nested ok text here")
    assert isinstance(page["blocks"], list)


def test_title_extracted():
    page = extract_html_page("<html><head><title>Doc 1 — Site</title></head><body></body></html>")
    assert page["title"] == "Doc 1 — Site"


def test_script_style_skipped():
    html = "<body><script>var x='<p>fake</p>';</script><p>visible content long enough</p></body>"
    page = extract_html_page(html)
    texts = [b["text"] for b in page["blocks"]]
    assert texts == ["visible content long enough"]


def test_fast_scanner_equivalence():
    """The regex scanner must produce IDENTICAL blocks to html.parser
    on the golden corpus and on adversarial snippets."""
    from vlm_ocr_pipeline_spark.sources import datagen

    for idx in range(300):
        c = datagen.page_content(idx)
        if c["kind"] != "html":
            continue
        doc = datagen.html_for_content(c)
        assert extract_html_page(doc, fast=True) == extract_html_page(doc, fast=False)

    snippets = [
        '<p>a &amp; b</p>',
        '<p>unclosed <div><p>x</p>',
        '<script>var x = "<p>no</p>";</script><p>real content here ok</p>',
        '<IMG SRC=x ALT="Big Alt">',
        "<img alt='single quotes'>",
        '<img alt=bare>',
        '<!-- <p>comment</p> --><p>after comment text here</p>',
        '<!DOCTYPE html><p>doc ok fine</p>',
        '<style>p {color: red}</style><p>styled text here ok</p>',
        '<div/><p>weird self-closing div then text here</p>',
        '<textarea><p>not a block</p></textarea><p>after textarea ok</p>',
        '<p>trailing junk <',
        '<pre>  spaced\n  code  </pre>',
        # raw-text close-tag matching must be case-insensitive and
        # whitespace-tolerant, exactly like stdlib cdata mode
        '<script>a</SCRIPT><p>early upper close kept content here</p><script>b</script>',
        '<script>x</ script ><p>spaced close tag content here ok</p>',
        '<script>y</scriptfoo></script><p>prefix-name is not a close</p>',
        '<script>unterminated raw text at eof',
        '<style>p{}</STYLE><p>styled after upper close ok here</p>',
    ]
    for s in snippets:
        assert extract_html_page(s, fast=True) == extract_html_page(s, fast=False), s
