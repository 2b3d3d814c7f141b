"""GIF codec correctness: a hand-computed LZW bit-stream vector,
encode/decode round-trips across palettes/offsets/disposal/interlace/
transparency, cross-check against the PNG codec (both lossless), and
the Spark frame-sampling integration on real animated bytes."""

from __future__ import annotations

import numpy as np
import pytest

from vlm_ocr_pipeline_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from vlm_ocr_pipeline_spark.functions.png_codec import decode_png

PAL4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


# ---------------------------------------------------------------- LZW


def test_lzw_hand_vector():
    # pixels [1,1,1,2,2] @ min_code_size=2: codes (clear=4,1,6,2 | 3 bits)
    # then (2,end=5 | 4 bits) after the width grows between the 4th and
    # 5th emitted codes -> LSB-first packing 0x5258C -> 8C 25 05.
    # Worked by hand from the spec's width-growth rule.
    pixels = bytes([1, 1, 1, 2, 2])
    assert lzw_encode(2, pixels) == b"\x8c\x25\x05"
    assert lzw_decode(2, b"\x8c\x25\x05", 5) == pixels


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = np.random.default_rng(7 * mcs)
    for n in [1, 2, 100, 5000]:
        pixels = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
        assert lzw_decode(mcs, lzw_encode(mcs, pixels), n) == pixels


def test_lzw_roundtrip_table_overflow():
    # de Bruijn-ish varied data long enough to blow past 4096 entries
    # and force the mid-stream clear path.
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=120_000, dtype=np.uint8).tobytes()
    assert lzw_decode(8, lzw_encode(8, pixels), len(pixels)) == pixels


def test_lzw_roundtrip_repetitive():
    # long runs grow the dictionary fastest (kwkwk pattern exercises
    # the code == len(table) branch).
    pixels = (b"\x01" * 4000) + (b"\x02\x01" * 2000)
    assert lzw_decode(2, lzw_encode(2, pixels), len(pixels)) == pixels


def test_lzw_truncation_raises():
    data = lzw_encode(2, bytes([1, 2, 3] * 50))
    with pytest.raises(ValueError):
        lzw_decode(2, data[:2], 150)


# ------------------------------------------------------ single frame


def grid_indices(h, w, ncolors, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)


def test_single_frame_roundtrip():
    idx = grid_indices(13, 17, 4, seed=1)
    gif = encode_gif((17, 13), [{"indices": idx}], global_palette=PAL4)
    d = decode_gif(gif)
    assert (d["width"], d["height"], d["n_frames"]) == (17, 13, 1)
    frame = d["frames"][0]
    assert frame.shape == (13, 17, 4)
    np.testing.assert_array_equal(frame[:, :, :3], PAL4[idx])
    assert (frame[:, :, 3] == 255).all()


def test_interlaced_roundtrip():
    idx = grid_indices(16, 9, 4, seed=2)
    gif = encode_gif(
        (9, 16), [{"indices": idx, "interlace": True}], global_palette=PAL4
    )
    np.testing.assert_array_equal(decode_gif(gif)["frames"][0][:, :, :3], PAL4[idx])


def test_local_palette_wins_over_global():
    local = np.array([[9, 9, 9], [200, 100, 50]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    gif = encode_gif(
        (2, 2),
        [{"indices": idx, "local_palette": local}],
        global_palette=PAL4,
    )
    np.testing.assert_array_equal(decode_gif(gif)["frames"][0][:, :, :3], local[idx])


def test_256_color_roundtrip():
    pal = np.arange(256 * 3, dtype=np.uint32).reshape(256, 3) % 256
    pal = pal.astype(np.uint8)
    idx = grid_indices(20, 20, 256, seed=3)
    gif = encode_gif((20, 20), [{"indices": idx}], global_palette=pal)
    np.testing.assert_array_equal(decode_gif(gif)["frames"][0][:, :, :3], pal[idx])


# -------------------------------------------------------- animation


def test_animation_compositing_and_disposal_none():
    # frame 2 is a sub-rect painted over frame 1 (disposal 0 = keep)
    base = np.full((4, 4), 1, dtype=np.uint8)
    patch = np.full((2, 2), 2, dtype=np.uint8)
    gif = encode_gif(
        (4, 4),
        [
            {"indices": base, "delay_cs": 10},
            {"indices": patch, "left": 1, "top": 2, "delay_cs": 20},
        ],
        global_palette=PAL4,
    )
    d = decode_gif(gif)
    assert d["n_frames"] == 2
    assert d["delays_cs"] == [10, 20]
    f0, f1 = d["frames"]
    np.testing.assert_array_equal(f0[:, :, :3], PAL4[base])
    expected = base.copy()
    expected[2:4, 1:3] = 2
    np.testing.assert_array_equal(f1[:, :, :3], PAL4[expected])


def test_disposal_background_clears_region():
    patch = np.full((2, 2), 2, dtype=np.uint8)
    full = np.full((4, 4), 1, dtype=np.uint8)
    gif = encode_gif(
        (4, 4),
        [
            {"indices": patch, "left": 0, "top": 0, "disposal": 2},
            # second frame paints only one far pixel; the patch region
            # must have been cleared to transparent by disposal 2
            {"indices": np.array([[3]], dtype=np.uint8), "left": 3, "top": 3},
        ],
        global_palette=PAL4,
    )
    f1 = decode_gif(gif)["frames"][1]
    assert (f1[0:2, 0:2, 3] == 0).all()  # cleared to transparent
    assert tuple(f1[3, 3, :3]) == tuple(PAL4[3])


def test_disposal_previous_restores_canvas():
    base = np.full((3, 3), 1, dtype=np.uint8)
    gif = encode_gif(
        (3, 3),
        [
            {"indices": base},
            {"indices": np.array([[2]], dtype=np.uint8), "left": 1, "top": 1,
             "disposal": 3},
            {"indices": np.array([[3]], dtype=np.uint8), "left": 0, "top": 0},
        ],
        global_palette=PAL4,
    )
    d = decode_gif(gif)
    f2 = d["frames"][2]
    # the disposal-3 frame's center pixel reverted to the base color
    assert tuple(f2[1, 1, :3]) == tuple(PAL4[1])
    assert tuple(f2[0, 0, :3]) == tuple(PAL4[3])


def test_transparency_keeps_underlying_pixels():
    base = np.full((2, 2), 1, dtype=np.uint8)
    overlay = np.array([[0, 2], [0, 2]], dtype=np.uint8)  # 0 transparent
    gif = encode_gif(
        (2, 2),
        [
            {"indices": base},
            {"indices": overlay, "transparent": 0},
        ],
        global_palette=PAL4,
    )
    f1 = decode_gif(gif)["frames"][1]
    np.testing.assert_array_equal(f1[:, 0, :3], PAL4[[1, 1]])  # kept
    np.testing.assert_array_equal(f1[:, 1, :3], PAL4[[2, 2]])  # painted


def test_max_decode_frames_counts_rest_cheaply():
    frames = [{"indices": grid_indices(6, 6, 4, seed=s)} for s in range(5)]
    gif = encode_gif((6, 6), frames, global_palette=PAL4)
    d = decode_gif(gif, max_decode_frames=2)
    assert d["n_frames"] == 5
    assert len(d["frames"]) == 2


# --------------------------------------------------------- malformed


def test_malformed_inputs_raise_valueerror():
    idx = grid_indices(4, 4, 4)
    good = encode_gif((4, 4), [{"indices": idx}], global_palette=PAL4)
    for bad in [b"", b"GIF89a", good[:20], good[:-1], b"NOTGIF" + good[6:]]:
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_frame_without_any_palette_raises():
    with pytest.raises(ValueError):
        encode_gif((2, 2), [{"indices": np.zeros((2, 2), dtype=np.uint8)}])


# ---------------------------------------------- PNG cross-validation


def test_gif_to_png_frame_extraction_lossless():
    """stdlib_frame_extractor: GIF frames -> PNG payloads must decode
    back to identical RGBA pixels (both codecs are lossless)."""
    from vlm_ocr_pipeline_spark.operators.multimodal import (
        stdlib_frame_extractor,
    )

    frames = [{"indices": grid_indices(8, 5, 4, seed=s)} for s in range(3)]
    gif = encode_gif((5, 8), frames, global_palette=PAL4)
    pngs = stdlib_frame_extractor("video", gif)
    assert len(pngs) == 3
    ref = decode_gif(gif)["frames"]
    for png, expected in zip(pngs, ref):
        np.testing.assert_array_equal(decode_png(png), expected)


# ------------------------------------------------- Spark integration


def test_spark_gif_decode_and_frame_sampling(spark):
    import pandas as pd

    from vlm_ocr_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        sample_frames,
        sniff_format,
        stdlib_frame_extractor,
        stdlib_pixel_decoder,
    )

    payloads = []
    for i in range(6):
        n_fr = 1 + (i % 3) * 2  # 1, 3, 5 frames
        frames = [
            {"indices": grid_indices(7, 9, 4, seed=10 * i + s), "delay_cs": 4}
            for s in range(n_fr)
        ]
        payloads.append(encode_gif((9, 7), frames, global_palette=PAL4))
    pdf = pd.DataFrame(
        {
            "media_id": range(6),
            "kind": ["video"] * 6,
            "format": [sniff_format(p) for p in payloads],
            "payload": payloads,
            "n_bytes": [len(p) for p in payloads],
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)

    feats = (
        extract_media_features(media, decode_fn=stdlib_pixel_decoder)
        .orderBy("media_id")
        .collect()
    )
    assert [r["status"] for r in feats] == ["decoded"] * 6
    assert [r["n_frames"] for r in feats] == [1, 3, 5, 1, 3, 5]
    assert all(r["width"] == 9 and r["height"] == 7 for r in feats)
    assert all(len(r["features"]) == 16 for r in feats)

    sampled = sample_frames(
        media, every_k=2, frame_fn=stdlib_frame_extractor
    ).collect()
    by_id: dict[int, list] = {}
    for r in sampled:
        assert r["status"] == "sampled"
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # every-2nd frame of 1/3/5-frame animations -> 1/2/3 rows
    assert sorted(by_id[0]) == [0]
    assert sorted(by_id[1]) == [0, 2]
    assert sorted(by_id[2]) == [0, 2, 4]
    # each sampled payload is a valid standalone PNG of the right size
    png = [r for r in sampled if r["media_id"] == 2 and r["frame_idx"] == 2][0]
    arr = decode_png(bytes(png["payload"]))
    assert arr.shape == (7, 9, 4)
