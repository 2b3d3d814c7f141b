"""Baseline JPEG codec correctness: DCT basis identities, a
DC-only hand argument (solid color survives exactly), encode/decode
round-trips measured by PSNR across quality/subsampling/restart
settings, marker-level robustness, and the Spark integration."""

from __future__ import annotations

import numpy as np
import pytest

from vlm_ocr_pipeline_spark.functions.jpeg_codec import (
    _DCT_B,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def psnr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def gradient_image(h, w, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 2) % 256
    img = np.stack(
        [(base + 40 * c) % 256 for c in range(channels)], axis=2
    ).astype(np.float64)
    img += rng.normal(0, 4, size=img.shape)  # mild texture
    return np.clip(img, 0, 255).astype(np.uint8)


# ----------------------------------------------------------- numerics


def test_dct_basis_is_orthonormal():
    np.testing.assert_allclose(_DCT_B @ _DCT_B.T, np.eye(8), atol=1e-12)


def test_solid_gray_roundtrips_exactly():
    # a flat block is pure DC; quantization of one coefficient keeps
    # the reconstruction within one quantization step of the mean,
    # and 128 (zero after level shift) is exact at any quality.
    img = np.full((16, 16), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert out.shape == (16, 16, 1)
    np.testing.assert_array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("quality,min_psnr", [(95, 40), (85, 35), (50, 30)])
def test_grayscale_roundtrip_psnr(quality, min_psnr):
    img = gradient_image(40, 56, channels=1, seed=1)[:, :, 0]
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == (40, 56, 1)
    assert psnr(img, out[:, :, 0]) > min_psnr


def test_color_roundtrip_444():
    img = gradient_image(33, 47, seed=2)  # non-multiple-of-8 dims
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (33, 47, 3)
    assert psnr(img, out) > 33


def test_color_roundtrip_420_subsampled():
    img = gradient_image(50, 70, seed=3)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == (50, 70, 3)
    # per-pixel chroma edges survive only approximately at half
    # resolution with nearest upsampling
    assert psnr(img, out) > 25
    # but an image with FLAT chroma (R=G=B) loses nothing to the
    # subsampling itself — only to luma quantization
    gray3 = np.repeat(gradient_image(50, 70, 1, seed=3), 3, axis=2)
    out3 = decode_jpeg(encode_jpeg(gray3, quality=90, subsample=True))
    assert psnr(gray3, out3) > 34


def test_restart_intervals_roundtrip():
    img = gradient_image(64, 64, seed=4)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    with_rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
    # restart markers change only the entropy framing, not the pixels
    np.testing.assert_array_equal(plain, with_rst)


def test_higher_quality_is_closer():
    img = gradient_image(40, 40, seed=5)
    p_lo = psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    p_hi = psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    assert p_hi > p_lo


def test_single_pixel_and_tiny_images():
    for h, w in [(1, 1), (3, 5), (8, 8), (9, 17)]:
        img = gradient_image(h, w, seed=h * 31 + w)
        out = decode_jpeg(encode_jpeg(img, quality=92))
        assert out.shape == (h, w, 3)
        assert psnr(img, out) > 25


# --------------------------------------------------------- malformed


def test_malformed_inputs_raise():
    img = gradient_image(16, 16, seed=6)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # dies inside the marker walk
    # arithmetic-coded SOF -> NotImplementedError (stubbed, not failed)
    arith = bytearray(good)
    sof_at = bytes(arith).index(b"\xff\xc0")
    arith[sof_at + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))
    # a baseline stream whose SOF is merely RELABELED progressive is
    # malformed (its single scan claims the full 0-63 band with Ss=0)
    relabeled = bytearray(good)
    relabeled[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(relabeled))


def test_header_dims_agree_with_pixel_decode():
    from vlm_ocr_pipeline_spark.operators.multimodal import (
        parse_image_dimensions,
    )

    img = gradient_image(21, 34, seed=7)
    payload = encode_jpeg(img)
    assert parse_image_dimensions(payload) == (34, 21)
    assert decode_jpeg(payload).shape == (21, 34, 3)


# ------------------------------------------------- Spark integration


def test_spark_jpeg_decode_through_media_features(spark):
    import pandas as pd

    from vlm_ocr_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        sniff_format,
        stdlib_pixel_decoder,
    )

    payloads = [
        encode_jpeg(gradient_image(24, 32, seed=i), quality=80)
        for i in range(3)
    ]
    payloads.append(encode_jpeg(gradient_image(16, 16, seed=9), subsample=True))
    pdf = pd.DataFrame(
        {
            "media_id": range(4),
            "kind": ["image"] * 4,
            "format": [sniff_format(p) for p in payloads],
            "payload": payloads,
            "n_bytes": [len(p) for p in payloads],
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = (
        extract_media_features(media, decode_fn=stdlib_pixel_decoder)
        .orderBy("media_id")
        .collect()
    )
    assert [r["status"] for r in rows] == ["decoded"] * 4
    assert rows[0]["width"] == 32 and rows[0]["height"] == 24
    assert rows[3]["width"] == 16
    # real pixel features now, not nulls
    assert all(len(r["features"]) == 16 for r in rows)


# ------------------------------------------------------- progressive
# encode_jpeg_progressive carries the SAME quantized coefficients as
# the baseline encoder, so the decoded pixels must be IDENTICAL — a
# differential oracle over the whole progressive path (spectral
# selection, DC+AC successive approximation, EOB runs, refinement
# correction bits).


@pytest.mark.parametrize(
    "h,w,gray,subsample",
    [
        (37, 53, False, False),
        (37, 53, False, True),   # 4:2:0 sampling, non-multiple-of-8 dims
        (24, 24, True, False),
        (8, 8, False, False),    # single MCU
        (1, 300, False, False),  # degenerate strip
    ],
)
def test_progressive_decodes_identical_to_baseline(h, w, gray, subsample):
    img = gradient_image(h, w, channels=1 if gray else 3, seed=h + w)
    if gray:
        img = img[:, :, 0]
    base = encode_jpeg(img, quality=70, subsample=subsample)
    prog = encode_jpeg_progressive(img, quality=70, subsample=subsample)
    assert prog[:2] == b"\xff\xd8" and b"\xff\xc2" in prog
    assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_eob_runs_on_flat_image():
    # mostly-flat image -> long EOB runs across blocks (EOBn symbols
    # with n > 0) plus a couple of textured blocks to interrupt them
    img = np.full((64, 96, 3), 180, dtype=np.uint8)
    img[20:28, 40:48] = 30  # one sharp square
    img[50, :] = 250        # one sharp line
    base = encode_jpeg(img, quality=85)
    prog = encode_jpeg_progressive(img, quality=85)
    assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_refinement_on_noise():
    # high-frequency noise maximizes AC refinement activity (ZRL in
    # refinement passes, correction-bit buffering)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8).astype(np.uint8)
    for q in (30, 85, 95):
        base = encode_jpeg(img, quality=q)
        prog = encode_jpeg_progressive(img, quality=q)
        assert np.array_equal(decode_jpeg(base), decode_jpeg(prog)), q


def test_progressive_quality_matches_baseline_psnr():
    img = gradient_image(48, 64, seed=3)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    assert out.shape == (48, 64, 3)
    assert psnr(img, out) > 30.0
