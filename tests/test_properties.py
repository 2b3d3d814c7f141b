"""Property-based tests (hypothesis) for the ordering/rendering/
correction kernels — invariants that hold for ANY input, not just the
golden corpus."""

import numpy as np
from hypothesis import given, settings, strategies as st

from vlm_ocr_pipeline_spark.functions import correction, ordering, rendering
from vlm_ocr_pipeline_spark.functions.dedup_blocks import overlap_keep_mask

boxes_strategy = st.lists(
    st.tuples(
        st.integers(0, 500), st.integers(0, 500),
        st.integers(1, 200), st.integers(1, 200),
    ).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]]),
    min_size=0, max_size=30,
)


@settings(derandomize=True, max_examples=200, deadline=None)
@given(boxes_strategy)
def test_xycut_is_a_permutation(boxes):
    arr = np.array(boxes, dtype=np.int64).reshape(-1, 4)
    perm = ordering.xy_cut_order(arr)
    # every block ordered exactly once (no drops for positive-area boxes)
    assert sorted(perm.tolist()) == list(range(len(arr)))


@settings(derandomize=True, max_examples=200, deadline=None)
@given(boxes_strategy)
def test_fallback_order_is_sorted_by_y_x(boxes):
    arr = np.array(boxes, dtype=np.int64).reshape(-1, 4)
    perm = ordering.fallback_order(arr)
    keys = [(int(arr[i, 1]), int(arr[i, 0])) for i in perm]
    assert keys == sorted(keys)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(boxes_strategy)
def test_overlap_dedup_keeps_at_least_one_per_cluster(boxes):
    arr = np.array(boxes, dtype=np.int64).reshape(-1, 4)
    keep = overlap_keep_mask(arr, ["text"] * len(arr))
    if len(arr):
        assert keep.any()  # never drops everything
    # determinism
    keep2 = overlap_keep_mask(arr, ["text"] * len(arr))
    assert (keep == keep2).all()


text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(derandomize=True, max_examples=200, deadline=None)
@given(text_strategy)
def test_span_merge_correct_idempotent(t):
    once = correction.span_merge_correct(t)
    assert correction.span_merge_correct(once) == once


@settings(derandomize=True, max_examples=200, deadline=None)
@given(text_strategy, text_strategy)
def test_correction_ratio_bounds(a, b):
    r = correction.correction_ratio(a, b)
    assert 0.0 <= r <= 1.0
    assert correction.correction_ratio(a, a) == 0.0


@settings(derandomize=True, max_examples=100, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "type": st.sampled_from(["text", "title", "list", "table", "image"]),
                "text": st.one_of(st.none(), st.text(max_size=40)),
                "order": st.one_of(st.none(), st.integers(0, 50)),
                "x0": st.integers(0, 100), "y0": st.integers(0, 100),
            }
        ).map(lambda d: {**d, "x1": d["x0"] + 1, "y1": d["y0"] + 1}),
        max_size=15,
    )
)
def test_renderers_total_and_deterministic(blocks):
    # renderers never raise and are pure functions of their input
    for fn in (
        rendering.render_markdown,
        rendering.render_plaintext,
        rendering.blocks_to_markdown,
        rendering.compose_page_text,
        rendering.blocks_to_plaintext,
    ):
        a = fn([dict(b) for b in blocks])
        b2 = fn([dict(b) for b in blocks])
        assert a == b2
        assert isinstance(a, str)
        # the double-newline block separator contract
        assert "\n\n\n\n\n" not in a or fn is rendering.blocks_to_markdown


# ---- fast scanner vs html.parser fuzz -------------------------------------
_tag_names = st.sampled_from(
    ["p", "div", "li", "ul", "h1", "pre", "table", "tr", "td", "a",
     "nav", "aside", "img", "br", "span", "b", "figcaption", "script"]
)
_fragment = st.one_of(
    st.text(alphabet="abc <>&;/=\"'x1!-", max_size=12),
    _tag_names.map(lambda t: f"<{t}>"),
    _tag_names.map(lambda t: f"</{t}>"),
    st.just("<!-- c -->"),
    st.just("&amp;"),
    st.just('<img alt="z">'),
    st.just("<a href='/l'>link</a>"),
)


@settings(derandomize=True, max_examples=300, deadline=None)
@given(st.lists(_fragment, max_size=25).map("".join))
def test_fast_scanner_matches_stdlib_on_tag_soup(doc):
    from vlm_ocr_pipeline_spark.functions.html_extract import extract_html_page

    assert extract_html_page(doc, fast=True) == extract_html_page(doc, fast=False)
