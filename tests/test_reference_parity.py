"""DIFFERENTIAL parity tests: run the reference implementation
(read-only at /root/reference, imported at test time — never copied)
side-by-side with our kernels on randomized inputs and require
byte/rank-identical output.

This is the direct evidence for the north-star invariant ("matching the
reference's extracted text/spans per document"): not self-consistency
of our port, but equality against the actual reference code paths for
every deterministic operator.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from vlm_ocr_pipeline_spark.functions import dedup_blocks, ordering, rendering, spanmatch

_TYPES = ["text", "title", "list", "table", "image", "code", "ref_text",
          "header", "footer", "equation", "aside_text", "plain text"]


def _rand_boxes(rng, n):
    xy = rng.integers(0, 500, size=(n, 2))
    wh = rng.integers(1, 220, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def _ref_blocks(boxes, types=None, texts=None, orders=None):
    from pipeline.types import BBox, Block

    out = []
    for i, b in enumerate(boxes):
        out.append(
            Block(
                type=types[i] if types else "text",
                bbox=BBox(int(b[0]), int(b[1]), int(b[2]), int(b[3])),
                text=texts[i] if texts else None,
                order=orders[i] if orders else None,
            )
        )
    return out


def test_xycut_rank_parity_500_random_layouts():
    from pipeline.layout.ordering.mineru.xycut import MinerUXYCutSorter

    sorter = MinerUXYCutSorter()
    img = np.zeros((800, 600, 3), dtype=np.uint8)
    rng = np.random.default_rng(7)
    for trial in range(500):
        n = int(rng.integers(1, 25))
        boxes = _rand_boxes(rng, n)
        ref_sorted = sorter.sort(_ref_blocks(boxes), img)
        ref_ranks = {}
        for blk in ref_sorted:
            key = (blk.bbox.x0, blk.bbox.y0, blk.bbox.x1, blk.bbox.y1)
            ref_ranks.setdefault(key, []).append(blk.order)
        perm = ordering.xy_cut_order(boxes)
        ours = ordering.assign_order(n, perm)
        for i, b in enumerate(boxes):
            key = (int(b[0]), int(b[1]), int(b[2]), int(b[3]))
            assert int(ours[i]) in ref_ranks[key], f"trial {trial} box {key}"


def test_overlap_dedup_parity_300_random_layouts():
    from pipeline.layout.ordering.paddleocr.doclayout_v2 import PPDocLayoutV2Sorter

    sorter = PPDocLayoutV2Sorter(overlap_threshold=0.7)
    rng = np.random.default_rng(11)
    for trial in range(300):
        n = int(rng.integers(1, 15))
        boxes = _rand_boxes(rng, n)
        types = [_TYPES[i] for i in rng.integers(0, len(_TYPES), n)]
        ref_out = sorter._filter_overlap_blocks(_ref_blocks(boxes, types))
        ref_keys = [
            (b.type, b.bbox.x0, b.bbox.y0, b.bbox.x1, b.bbox.y1) for b in ref_out
        ]
        idx = dedup_blocks.apply_overlap_dedup_order(boxes, types)
        our_keys = [
            (types[i], int(boxes[i][0]), int(boxes[i][1]), int(boxes[i][2]),
             int(boxes[i][3]))
            for i in idx
        ]
        assert our_keys == ref_keys, f"trial {trial}"


def _rand_render_blocks(rng, n):
    types = [_TYPES[i] for i in rng.integers(0, len(_TYPES), n)]
    texts = [
        None if rng.random() < 0.15 else
        " ".join(["word", "-item", "1. x", "|cell|", "$y$", "```z```"][int(t)]
                 for t in rng.integers(0, 6, size=int(rng.integers(1, 5))))
        for _ in range(n)
    ]
    orders = [None if rng.random() < 0.3 else int(rng.integers(0, 50)) for _ in range(n)]
    boxes = _rand_boxes(rng, n)
    ours = [
        {"type": types[i], "text": texts[i], "order": orders[i],
         "x0": int(boxes[i][0]), "y0": int(boxes[i][1]),
         "x1": int(boxes[i][2]), "y1": int(boxes[i][3])}
        for i in range(n)
    ]
    return ours, _ref_blocks(boxes, types, texts, orders)


def test_markdown_composition_byte_parity():
    from pipeline.io.output.markdown import blocks_to_markdown as ref_md

    rng = np.random.default_rng(13)
    for trial in range(400):
        ours, refs = _rand_render_blocks(rng, int(rng.integers(0, 12)))
        assert rendering.blocks_to_markdown(ours) == ref_md(refs), f"trial {trial}"


def test_plaintext_composition_byte_parity():
    from pipeline.io.output.plaintext import blocks_to_plaintext as ref_pt

    rng = np.random.default_rng(17)
    for trial in range(400):
        ours, refs = _rand_render_blocks(rng, int(rng.integers(0, 12)))
        assert rendering.blocks_to_plaintext(ours) == ref_pt(refs), f"trial {trial}"


def test_compose_page_text_byte_parity():
    from pipeline.layout.ordering.analyzer import ReadingOrderAnalyzer

    analyzer = ReadingOrderAnalyzer()
    rng = np.random.default_rng(19)
    for trial in range(400):
        ours, refs = _rand_render_blocks(rng, int(rng.integers(0, 12)))
        assert rendering.compose_page_text(ours) == analyzer.compose_page_text(
            refs
        ), f"trial {trial}"


def test_rendering_stage_byte_parity_all_modes():
    from pipeline.stages.rendering_stage import RenderingStage

    rng = np.random.default_rng(23)
    for mode in ("image_and_description", "image_only", "description_only"):
        md_stage = RenderingStage(renderer="markdown", image_render_mode=mode)
        pt_stage = RenderingStage(renderer="plaintext", image_render_mode=mode)
        for trial in range(150):
            ours, refs = _rand_render_blocks(rng, int(rng.integers(0, 10)))
            # give image blocks paths/descriptions sometimes
            for o, r in zip(ours, refs):
                if o["type"] == "image" and rng.random() < 0.6:
                    o["image_path"] = r.image_path = "img/x.png"
                if o["type"] == "image" and rng.random() < 0.6:
                    o["description"] = r.description = "a figure caption here"
            assert rendering.render_markdown(ours, mode) == md_stage._process_impl(
                refs
            ), f"md {mode} {trial}"
            assert rendering.render_plaintext(ours, mode) == pt_stage._process_impl(
                refs
            ), f"pt {mode} {trial}"


def test_anchor_text_byte_parity():
    from pipeline.types.result import blocks_to_olmocr_anchor_text

    rng = np.random.default_rng(29)
    for trial in range(300):
        ours, refs = _rand_render_blocks(rng, int(rng.integers(0, 12)))
        w, h = int(rng.integers(100, 900)), int(rng.integers(100, 900))
        assert spanmatch.blocks_to_anchor_text(
            ours, w, h
        ) == blocks_to_olmocr_anchor_text(refs, w, h), f"trial {trial}"


def test_bbox_conversions_parity():
    from pipeline.types import BBox

    rng = np.random.default_rng(31)
    from vlm_ocr_pipeline_spark.functions import geometry as g

    for _ in range(300):
        x, y, w, h = (float(v) for v in rng.uniform(0, 500, size=4))
        ref = BBox.from_xywh(x, y, w, h)
        ours = g.xywh_to_xyxy(np.array([x, y, w, h]))
        assert (ref.x0, ref.y0, ref.x1, ref.y1) == tuple(int(v) for v in ours)
        pp = ref.to_pypdf_rect(page_height=792)
        ours_pp = g.xyxy_to_pypdf_rect(
            np.array([[ref.x0, ref.y0, ref.x1, ref.y1]]), 792
        )[0]
        assert pp == [int(v) for v in ours_pp]


def test_multicolumn_merge_and_assignment_parity():
    import pipeline.layout.ordering.pymupdf.multi_column as mc
    from pipeline.types import BBox, Block

    from vlm_ocr_pipeline_spark.functions import columns

    sorter = mc.MultiColumnSorter.__new__(mc.MultiColumnSorter)
    rng = np.random.default_rng(37)
    for trial in range(300):
        n_cols = int(rng.integers(1, 6))
        col_boxes = _rand_boxes(rng, n_cols)
        page_w = int(col_boxes[:, 2].max()) + 10
        ref_cols = sorter._merge_column_boxes(
            [{"bbox": BBox(*[int(v) for v in b])} for b in col_boxes], page_w
        )
        our_cols = columns.merge_column_boxes(col_boxes, page_w)
        assert len(ref_cols) == len(our_cols), f"trial {trial}"
        for rc, oc in zip(ref_cols, our_cols):
            assert rc["index"] == oc["index"]
            assert rc["center"] == oc["center"]
            assert (rc["bbox"].x0, rc["bbox"].y0, rc["bbox"].x1, rc["bbox"].y1) == (
                oc["x0"], oc["y0"], oc["x1"], oc["y1"])
        if len(ref_cols) <= 1:
            continue
        # block -> column assignment + final ordering parity
        n_blocks = int(rng.integers(1, 12))
        blk_boxes = _rand_boxes(rng, n_blocks)
        ref_blocks = sorter._sort_by_columns(_ref_blocks(blk_boxes), ref_cols)
        ref_ranks = {}
        for blk in ref_blocks:
            key = (blk.bbox.x0, blk.bbox.y0, blk.bbox.x1, blk.bbox.y1)
            ref_ranks.setdefault(key, []).append((blk.order, blk.column_index))
        our_idx = columns.assign_block_columns(blk_boxes, our_cols)
        order = np.lexsort((blk_boxes[:, 0], blk_boxes[:, 1], our_idx))
        ranks = np.empty(n_blocks, dtype=int)
        ranks[order] = np.arange(n_blocks)
        for i, b in enumerate(blk_boxes):
            key = tuple(int(v) for v in b)
            assert (int(ranks[i]), int(our_idx[i])) in ref_ranks[key], f"trial {trial}"


def test_layoutreader_line_split_parity():
    import pipeline.layout.ordering.mineru.layoutreader as lr

    from vlm_ocr_pipeline_spark.functions import layoutreader

    sorter = lr.MinerULayoutReaderSorter.__new__(lr.MinerULayoutReaderSorter)
    rng = np.random.default_rng(41)
    for trial in range(300):
        n = int(rng.integers(1, 10))
        boxes = _rand_boxes(rng, n)
        types = [
            ["text", "title", "image", "table", "plain text"][i]
            for i in rng.integers(0, 5, n)
        ]
        refs = _ref_blocks(boxes, types)
        ref_lh = sorter._estimate_line_height(refs)
        ours_blocks = [
            {"type": types[i], "x0": int(boxes[i][0]), "y0": int(boxes[i][1]),
             "x1": int(boxes[i][2]), "y1": int(boxes[i][3])}
            for i in range(n)
        ]
        assert layoutreader.estimate_line_height(ours_blocks) == ref_lh
        ref_lines = sorter._split_blocks_into_lines(refs, ref_lh, 10_000, 10_000)
        our_lines = layoutreader.split_blocks_into_lines(ours_blocks, ref_lh)
        assert [(l["block_idx"], l["bbox"]) for l in ref_lines] == [
            (idx, bb) for bb, idx in our_lines
        ], f"trial {trial}"


def test_pymupdf4llm_renderer_byte_parity():
    """Our render_markdown_pymupdf4llm vs the reference's
    blocks_to_markdown_with_fonts (io/output/markdown/pymupdf4llm.py)
    on 400 randomized block/span layouts — byte equality, covering
    header-level mapping, IoU matching, type fallbacks, unranked-last
    ordering and the consecutive-header blank line."""
    from pipeline.io.output.markdown import pymupdf4llm as ref

    from vlm_ocr_pipeline_spark.functions.rendering import (
        render_markdown_pymupdf4llm,
    )

    rng = np.random.default_rng(404)
    texts_pool = [
        "Chapter one", "- item", "a | b", "$$x$$", "x^2",
        "plain text here", "", "* starred", "1. numbered", None,
    ]
    size_pool = [8.0, 10.0, 12.0, 14.0, 24.0, 36.0]
    for trial in range(400):
        n = int(rng.integers(0, 8))
        m = int(rng.integers(0, 8))
        boxes = _rand_boxes(rng, n) if n else np.zeros((0, 4), dtype=np.int64)
        blocks, ref_blocks = [], []
        for i in range(n):
            t = _TYPES[rng.integers(0, len(_TYPES))]
            text = texts_pool[rng.integers(0, len(texts_pool))]
            corrected = (text + "!") if (text and rng.random() < 0.3) else None
            order = int(rng.integers(0, 10)) if rng.random() < 0.7 else None
            x0, y0, x1, y1 = (int(v) for v in boxes[i])
            blocks.append({"type": t, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                           "text": text, "corrected_text": corrected,
                           "order": order})
            ref_blocks.append({"type": t, "bbox": [x0, y0, x1 - x0, y1 - y0],
                               "text": text, "corrected_text": corrected,
                               "order": order})
        sboxes = _rand_boxes(rng, m) if m else np.zeros((0, 4), dtype=np.int64)
        sizes = [float(size_pool[rng.integers(0, len(size_pool))]) for _ in range(m)]
        spans = [{"x0": int(b[0]), "y0": int(b[1]), "x1": int(b[2]),
                  "y1": int(b[3]), "size": s} for b, s in zip(sboxes, sizes)]
        ref_spans = [{"bbox": [int(b[0]), int(b[1]), int(b[2]), int(b[3])],
                      "size": s} for b, s in zip(sboxes, sizes)]
        ours = render_markdown_pymupdf4llm(blocks, spans)
        theirs = ref.blocks_to_markdown_with_fonts(
            ref_blocks, {"text_spans": ref_spans}
        )
        assert ours == theirs, (trial, ours, theirs)


def test_block_type_maps_full_parity():
    """Every detector vocabulary map matches BlockTypeMapper.map_type
    for every key it defines, plus unknown-label passthrough — all 5
    reference maps (types/block.py:80-186) are present."""
    from pipeline.types.block import BlockTypeMapper

    from vlm_ocr_pipeline_spark.functions.block_types import (
        DETECTOR_TYPE_MAPS, map_type,
    )

    ref_maps = {
        "doclayout-yolo": BlockTypeMapper.DOCLAYOUT_YOLO_MAP,
        "mineru-doclayout-yolo": BlockTypeMapper.MINERU_DOCLAYOUT_YOLO_MAP,
        "mineru-vlm": BlockTypeMapper.MINERU_VLM_MAP,
        "olmocr-vlm": BlockTypeMapper.OLMOCR_VLM_MAP,
        "paddleocr-doclayout-v2": BlockTypeMapper.PADDLEOCR_DOCLAYOUT_V2_MAP,
    }
    for det, ref_map in ref_maps.items():
        assert det in DETECTOR_TYPE_MAPS, det
        for label in ref_map:
            assert map_type(label, det) == BlockTypeMapper.map_type(label, det), (
                det, label,
            )
            # case-insensitivity parity
            assert map_type(label.upper(), det) == BlockTypeMapper.map_type(
                label.upper(), det
            )
        assert map_type("no_such_label", det) == "no_such_label"


def test_detector_type_maps_match_reference():
    """All five reference detector-vocabulary maps (block.py:83-166)
    are present verbatim; map_type falls back like block.py:183-186."""
    from pipeline.types.block import BlockTypeMapper

    from vlm_ocr_pipeline_spark.functions.block_types import (
        DETECTOR_TYPE_MAPS,
        map_type,
    )

    ref_maps = {
        "doclayout-yolo": BlockTypeMapper.DOCLAYOUT_YOLO_MAP,
        "mineru-doclayout-yolo": BlockTypeMapper.MINERU_DOCLAYOUT_YOLO_MAP,
        "mineru-vlm": BlockTypeMapper.MINERU_VLM_MAP,
        "olmocr-vlm": BlockTypeMapper.OLMOCR_VLM_MAP,
        "paddleocr-doclayout-v2": BlockTypeMapper.PADDLEOCR_DOCLAYOUT_V2_MAP,
    }
    for det, ref in ref_maps.items():
        assert DETECTOR_TYPE_MAPS[det] == {k: str(v) for k, v in ref.items()}, det
        for label, want in ref.items():
            assert map_type(label.upper(), det) == str(want)
            assert BlockTypeMapper.map_type(label, det) == map_type(label, det)
    # unknown labels pass through on both sides
    assert map_type("mystery", "mineru-vlm") == "mystery"
    assert BlockTypeMapper.map_type("mystery", "mineru-vlm") == "mystery"
