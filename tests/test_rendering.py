"""Byte-exact rendering parity (reference markdown/__init__.py:88-312,
rendering_stage.py:63-231, plaintext.py:14-71, analyzer.py:15-54)."""

from vlm_ocr_pipeline_spark.functions.rendering import (
    block_to_markdown,
    blocks_to_markdown,
    blocks_to_plaintext,
    compose_page_text,
    render_markdown,
    render_plaintext,
)


def b(type_, text=None, order=None, y0=0, x0=0, **kw):
    return {"type": type_, "text": text, "order": order,
            "x0": x0, "y0": y0, "x1": x0 + 10, "y1": y0 + 10, **kw}


# ---- per-block markdown -------------------------------------------------
def test_title_header_prefix():
    assert block_to_markdown(b("title", "Introduction")) == "# Introduction"


def test_subtitle_and_subheading_levels():
    assert block_to_markdown(b("subtitle", "S")) == "## S"
    assert block_to_markdown(b("subheading", "S")) == "### S"


def test_list_coercion_markdown_tuple():
    assert block_to_markdown(b("list", "item")) == "- item"
    assert block_to_markdown(b("list", "9. item")) == "9. item"
    assert block_to_markdown(b("list", "* x")) == "* x"


def test_table_pipe_passthrough():
    assert block_to_markdown(b("table", "a | b")) == "a | b"
    assert block_to_markdown(b("table", "no pipes")) == "**Table:**\n\nno pipes"
    assert block_to_markdown(b("table_caption", "Cap")) == "**Table:** Cap"
    assert block_to_markdown(b("table_footnote", "F")) == "*F*"


def test_equation_variants():
    assert block_to_markdown(b("equation", "E=mc^2")) == "$$E=mc^2$$"
    assert block_to_markdown(b("equation", "$$x$$")) == "$$x$$"
    assert block_to_markdown(b("inline_equation", "x")) == "$x$"
    assert block_to_markdown(b("inline_equation", "$x$")) == "$x$"
    assert block_to_markdown(b("isolate_formula", "y")) == "$$y$$"
    assert block_to_markdown(b("formula_caption", "c")) == "*Formula: c*"


def test_code_fencing():
    assert block_to_markdown(b("code", "x = 1")) == "```\nx = 1\n```"
    assert block_to_markdown(b("code", "```\ny\n```")) == "```\ny\n```"
    assert block_to_markdown(b("code_caption", "c")) == "**Code:** c"


def test_skip_types_render_empty():
    for t in ("header", "footer", "page_number", "discarded", "abandon"):
        assert block_to_markdown(b(t, "anything")) == ""


def test_corrected_text_preferred():
    blk = b("text", "raw", corrected_text="fixed")
    assert block_to_markdown(blk) == "fixed"


# ---- document composition ----------------------------------------------
def test_blocks_to_markdown_header_spacing_rule():
    blocks = [b("text", "para", order=0), b("title", "Head", order=1)]
    # type change INTO a header type inserts an extra blank line
    assert blocks_to_markdown(blocks) == "para\n\n\n\n# Head"


def test_render_markdown_stage_has_no_header_spacing():
    # RenderingStage renders singleton lists -> rule never fires
    blocks = [b("text", "para", order=0), b("title", "Head", order=1)]
    assert render_markdown(blocks) == "para\n\n# Head"


def test_ranked_sorted_unranked_appended():
    blocks = [
        b("text", "unranked", order=None, y0=0),
        b("text", "second", order=1),
        b("text", "first", order=0),
    ]
    assert render_plaintext(blocks) == "first\n\nsecond\n\nunranked"


def test_all_unranked_keeps_input_order():
    blocks = [b("text", "b", y0=50), b("text", "a", y0=0)]
    assert render_markdown(blocks) == "b\n\na"


# ---- plaintext stage -----------------------------------------------------
def test_plaintext_title_prefix_and_short_list_tuple():
    assert render_plaintext([b("title", "T", order=0)]) == "[TITLE] T"
    # plaintext list tuple is SHORT: "4." is NOT recognized -> coerced
    assert render_plaintext([b("list", "4. x", order=0)]) == "- 4. x"
    # but markdown's longer tuple recognizes it
    assert block_to_markdown(b("list", "4. x")) == "4. x"


def test_image_block_plaintext_parts():
    blk = b("image", text=None, order=0, image_path="img/p.png",
            description="a chart")
    assert render_plaintext([blk]) == "[IMAGE: img/p.png]\n[FIGURE DESCRIPTION] a chart"
    blk2 = b("figure", text="fallback", order=0)
    assert render_plaintext([blk2]) == "[FIGURE] fallback"


def test_image_block_markdown_parts():
    blk = b("image", text=None, order=0, image_path="img/p.png",
            description="a chart")
    assert render_markdown([blk]) == "![a chart](img/p.png)\n\n**Figure:**\n\na chart"


# ---- compose_page_text / blocks_to_plaintext -----------------------------
def test_compose_page_text_filters_and_sorts():
    blocks = [
        b("table", "skip me", order=0),
        b("text", "  stripped  ", order=2),
        b("title", "T", order=1),
        b("text", None, order=3),
    ]
    assert compose_page_text(blocks) == "T\n\nstripped"


def test_compose_unordered_falls_back_to_y_x():
    blocks = [b("text", "b", y0=10), b("text", "a", y0=5)]
    assert compose_page_text(blocks) == "a\n\nb"


def test_blocks_to_plaintext_mixed_order_key():
    # ranked item sorts by (0, order, y, x); unranked by (1, y, y, x)
    blocks = [
        b("text", "unranked_y5", order=None, y0=5),
        b("text", "ranked7", order=7, y0=100),
        b("text", "unranked_y1", order=None, y0=1),
    ]
    assert (
        blocks_to_plaintext(blocks)
        == "ranked7\n\nunranked_y1\n\nunranked_y5"
    )


def test_blocks_to_plaintext_all_unranked():
    blocks = [b("text", "b", y0=10, x0=5), b("text", "a", y0=10, x0=1)]
    assert blocks_to_plaintext(blocks) == "a\n\nb"


def test_image_render_modes():
    blk = b("image", text=None, order=0, image_path="p.png", description="d")
    from vlm_ocr_pipeline_spark.functions.rendering import (
        render_markdown,
        render_plaintext,
    )

    assert render_plaintext([blk], "image_only") == "[IMAGE: p.png]"
    assert render_plaintext([blk], "description_only") == "[FIGURE DESCRIPTION] d"
    assert render_markdown([blk], "image_only") == "![d](p.png)"
    assert render_markdown([blk], "description_only") == "**Figure:**\n\nd"
