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


# ---- round-4 surfaces: image headers, robots rules, BPE, PSL --------


@settings(derandomize=True, max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_parse_image_dimensions_total_on_junk(payload):
    """Any byte string: returns None or a pair of non-negative ints,
    never raises — corrupt crawl payloads must not kill a task."""
    from vlm_ocr_pipeline_spark.operators.multimodal import parse_image_dimensions

    got = parse_image_dimensions(payload)
    assert got is None or (
        isinstance(got, tuple) and len(got) == 2 and all(v >= 0 for v in got)
    )


@settings(derandomize=True, max_examples=300, deadline=None)
@given(
    st.binary(min_size=0, max_size=32),
    st.integers(0, 2**31 - 1),
    st.integers(0, 2**31 - 1),
)
def test_parse_png_dimensions_ignore_trailing_junk(junk, w, h):
    from vlm_ocr_pipeline_spark.operators.multimodal import parse_image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + junk
    )
    assert parse_image_dimensions(png) == (w, h)


_RULE_CHARS = st.text(
    alphabet="/ab.?*$[](){}+|^\\=-", min_size=1, max_size=12
).map(lambda s: "/" + s)
_PATH_CHARS = st.text(
    alphabet="/ab.?=x", min_size=1, max_size=16
).map(lambda s: "/" + s)


def _py_rule_match(rule: str, path: str) -> bool:
    """Reference RFC 9309 matcher: literal prefix walk with '*' as any
    run and trailing '$' as end anchor — independent of the regex
    translation under test."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    segs = body.split("*")

    def walk(p: str, segs: list[str]) -> bool:
        if not p.startswith(segs[0]):
            return False
        pos = len(segs[0])
        for seg in segs[1:]:
            i = p.find(seg, pos)
            if i < 0:
                return False
            pos = i + len(seg)
        # '*' tail already matched anything; for anchored rules the
        # LAST segment must also be able to reach the end
        if anchored:
            if len(segs) == 1:
                return pos == len(p)
            last = segs[-1]
            return last == "" or p.endswith(last)
        return True

    return walk(path, segs)


@settings(derandomize=True, max_examples=500, deadline=None)
@given(_RULE_CHARS, _PATH_CHARS)
def test_robots_rule_regex_matches_reference_walker(rule, path):
    """The compiled rule pattern agrees with an independent wildcard
    walker on arbitrary rules (incl. regex metacharacters, which must
    be escaped) and paths."""
    import re

    from vlm_ocr_pipeline_spark.operators.urls import _robots_rule_regex

    pat = _robots_rule_regex(rule)
    if pat is None:
        got = path.startswith(rule)
    else:
        got = re.search(pat, path) is not None
    assert got == _py_rule_match(rule, path), (rule, path, pat)


@settings(derandomize=True, max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(1, 50),
        ),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    st.integers(1, 20),
)
def test_bpe_incremental_matches_naive_on_random_freqs(freqs, n_merges):
    from tests.test_bpe import _naive_train

    from vlm_ocr_pipeline_spark.operators import bpe

    assert bpe.train_bpe_from_frequencies(freqs, n_merges) == _naive_train(
        freqs, n_merges
    )


@settings(derandomize=True, max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=8),
            st.integers(1, 30),
        ),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
    st.text(alphabet="abcdef", min_size=1, max_size=10),
)
def test_bpe_encode_word_lossless(freqs, word):
    from vlm_ocr_pipeline_spark.operators import bpe

    merges = bpe.train_bpe_from_frequencies(freqs, 15)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = bpe.encode_word(word, ranks)
    assert "".join(toks) == word + bpe.EOW


# ----------------------------------------------------- charset ladder


@settings(derandomize=True, max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_decode_payload_total_on_arbitrary_bytes(payload):
    """The decode ladder never raises and always returns a str — the
    row-status contract extraction depends on."""
    from vlm_ocr_pipeline_spark.functions import charset

    text, codec, evidence = charset.decode_payload(payload)
    assert isinstance(text, str) and isinstance(codec, str)
    assert evidence in (
        "bom", "nul-pattern", "escape-shift", "declared", "meta",
        "utf-8", "utf-8-lossy", "fallback",
    )


@settings(derandomize=True, max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_fix_mojibake_total_and_idempotent(text):
    """Repair never raises on arbitrary unicode and is a fixpoint
    after one application (the accept gate guarantees it)."""
    from vlm_ocr_pipeline_spark.functions import charset

    once = charset.fix_mojibake(text)
    assert charset.fix_mojibake(once) == once


@settings(derandomize=True, max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=120))
def test_mangled_roundtrip_recovers_when_detectable(text):
    """For any UTF-8-encodable text, sloppy-1252 mangling either gets
    fully repaired or (when the text has no multibyte chars, so
    mangling is the identity) stays unchanged."""
    from vlm_ocr_pipeline_spark.functions import charset

    mangled = "".join(
        chr(charset._SLOPPY_DECODE[b]) for b in text.encode("utf-8")
    )
    if mangled == text:  # pure-ASCII: nothing to repair
        return
    fixed = charset.fix_mojibake(mangled)
    # repair is accept-gated: it must never make things WORSE, and
    # whenever the fingerprint regex sees the damage it must fully
    # undo it (single-pass mangle is always byte-reversible)
    if charset.py_mojibake_count(mangled) > 0:
        assert fixed == text
    else:
        assert fixed == mangled
