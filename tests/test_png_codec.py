"""PNG codec correctness: spec-derived hand vectors for every filter
type, an INDEPENDENT forward-filter implementation driving round-trip
property tests, palette/tRNS expansion, resize kernels, and the Spark
mapInPandas integration (real decode end-to-end, no codec library)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vlm_ocr_pipeline_spark.functions.png_codec import (
    decode_png,
    encode_png,
    pixel_features,
    resize_box,
    resize_nearest,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def build_png(width, height, color_type, idat_raw, extra=b"", bit_depth=8,
              interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
                       interlace)
    return (
        SIG
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(idat_raw))
        + chunk(b"IEND", b"")
    )


# ---- independent FORWARD filter (spec §9, the encoder direction) ----
# Used to build test inputs; decode must invert it.  Written from the
# spec, not from the module under test.

def forward_filter(pixels: np.ndarray, ftypes: list[int], bpp: int) -> bytes:
    h, stride = pixels.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        recon = pixels[y].astype(np.int64)
        f = ftypes[y]
        line = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = recon[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (recon[x] - pred) % 256
        out.append(f)
        out += bytes(line.astype(np.uint8))
        prev = recon
    return bytes(out)


# ---- hand vectors: one row per filter type, grayscale ---------------

def test_decode_hand_vectors_all_filters():
    # recon rows chosen to exercise wraparound; filtered bytes computed
    # BY HAND from the spec (values in comments = the arithmetic)
    raw = bytes(
        [0, 10, 20, 30, 40]          # None
        + [1, 5, 5, 245, 4]          # Sub:  5, 10-5, 255-10, (3-255)%256
        + [2, 1, 2, 2, 197]          # Up:   6-5, 12-10, (1-255)%256, 200-3
        + [3, 97, 250, 0, 143]       # Avg:  100-3, (50-56)%256, 25-25, 255-112
        + [4, 236, 31, 32, 84]       # Paeth: 80-100, 81-50, 82-50, (83-255)%256
    )
    png = build_png(4, 5, 0, raw)
    got = decode_png(png)
    expected = np.array(
        [
            [10, 20, 30, 40],
            [5, 10, 255, 3],
            [6, 12, 1, 200],
            [100, 50, 25, 255],
            [80, 81, 82, 83],
        ],
        dtype=np.uint8,
    )[:, :, None]
    assert got.shape == (5, 4, 1)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("ch,color_type", [(1, 0), (2, 4), (3, 2), (4, 6)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_against_independent_forward_filter(ch, color_type, seed):
    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(1, 9)), int(rng.randint(1, 9))
    pixels = rng.randint(0, 256, size=(h, w * ch)).astype(np.uint8)
    ftypes = [int(rng.randint(0, 5)) for _ in range(h)]
    raw = forward_filter(pixels, ftypes, bpp=ch)
    png = build_png(w, h, color_type, raw)
    got = decode_png(png)
    np.testing.assert_array_equal(got, pixels.reshape(h, w, ch))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_encode_decode_roundtrip(ch):
    rng = np.random.RandomState(7 + ch)
    arr = rng.randint(0, 256, size=(11, 6, ch)).astype(np.uint8)
    out = decode_png(encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def test_encode_2d_gray_and_1x1():
    arr = np.array([[0, 255], [128, 7]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(arr))[:, :, 0], arr)
    one = np.array([[[9, 8, 7]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(one)), one)


def test_palette_and_trns_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1, 2, 0] + [0, 1, 2, 1, 0])  # 2 rows of 4 indexes, filter 0
    png = build_png(4, 2, 3, raw, extra=chunk(b"PLTE", plte))
    got = decode_png(png)
    assert got.shape == (2, 4, 3)
    np.testing.assert_array_equal(got[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(got[1, 0], [0, 255, 0])
    # tRNS: entry 0 transparent -> RGBA
    png_a = build_png(
        4, 2, 3, raw, extra=chunk(b"PLTE", plte) + chunk(b"tRNS", bytes([0]))
    )
    got_a = decode_png(png_a)
    assert got_a.shape == (2, 4, 4)
    assert got_a[0, 0, 3] == 0 and got_a[0, 1, 3] == 255


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    # corrupt a CRC byte
    bad = bytearray(good)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # truncated IDAT payload length claim
    with pytest.raises(ValueError):
        decode_png(good[:-8])
    # bit-depth out of scope -> NotImplementedError; a 1x1 Adam7 image
    # is pass 1 only (same bytes as non-interlaced) and decodes
    raw = bytes([0, 1])
    assert decode_png(build_png(1, 1, 0, raw, interlace=1)).shape == (1, 1, 1)
    with pytest.raises(NotImplementedError):
        decode_png(build_png(1, 1, 0, raw, bit_depth=16))


def test_resize_kernels():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    same = resize_nearest(arr, 4, 4)
    np.testing.assert_array_equal(same, arr)
    # box 4x4 -> 2x2: each cell = mean of its 2x2 block
    box = resize_box(arr, 2, 2)
    np.testing.assert_array_equal(
        box[:, :, 0], np.array([[2, 4], [10, 12]], dtype=np.uint8)
    )
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8, 1)
    assert up[0, 0, 0] == arr[0, 0, 0] and up[7, 7, 0] == arr[3, 3, 0]


def test_pixel_features_shape_and_determinism():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    f1, f2 = pixel_features(arr), pixel_features(arr)
    assert f1 == f2 and len(f1) == 16
    assert abs(sum(f1[8:]) - 1.0) < 1e-6  # histogram fractions sum to 1
    flat = np.full((4, 4), 128, dtype=np.uint8)
    ff = pixel_features(flat)
    assert ff[1] == 0.0  # zero std on a constant image


# ---- Spark integration: real decode through mapInPandas -------------

def test_spark_stdlib_decode_and_resize(spark):
    from vlm_ocr_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        MEDIA_SCHEMA,
        extract_media_features,
        resize_media,
        sniff_format,
        stdlib_pixel_decoder,
        stdlib_png_resizer,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(6):
        arr = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        payload = encode_png(arr)
        rows.append((i, "image", sniff_format(payload), payload, len(payload)))
    rows.append((6, "audio", "ogg", b"OggS\x00junk", 9))
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    feats = extract_media_features(media, decode_fn=stdlib_pixel_decoder)
    got = {r["media_id"]: r for r in feats.collect()}
    for i in range(6):
        assert got[i]["status"] == "decoded"
        assert (got[i]["width"], got[i]["height"]) == (8, 8)
        assert len(got[i]["features"]) == 16
    assert got[6]["status"] == "stubbed:no_codec"

    resized = resize_media(media, 4, 4, resize_fn=stdlib_png_resizer)
    out = {r["media_id"]: r for r in resized.collect()}
    for i in range(6):
        assert out[i]["status"] == "resized"
        arr = decode_png(bytes(out[i]["payload"]))
        assert arr.shape == (4, 4, 3)
    assert out[6]["status"] == "stubbed:no_codec"


# --------------------------------------------------------------- Adam7


@pytest.mark.parametrize("h,w,ch", [
    (16, 16, 3), (13, 7, 1), (9, 33, 4), (1, 1, 3), (2, 3, 2), (8, 1, 1),
])
def test_adam7_interlaced_roundtrip(h, w, ch):
    """encode(interlace=True) -> decode recovers the exact pixels for
    every pass-geometry edge (dims smaller than the 8x8 pass grid,
    single row/column, all channel counts)."""
    rng = np.random.default_rng(h * 100 + w * 10 + ch)
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.uint8)
    blob = encode_png(img, interlace=True)
    out = decode_png(blob)
    np.testing.assert_array_equal(out, img)
    # and the interlaced encoding is a genuinely different byte stream
    assert blob != encode_png(img)


def test_adam7_truncated_pass_raises():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img, interlace=True))
    # rebuild the IDAT with one byte chopped off the decompressed
    # stream: the pass walk must detect the shortfall, not misalign
    import struct as _s
    import zlib as _z

    # locate IDAT chunk, shrink its decompressed content by one byte
    i = 8
    while True:
        (ln,) = _s.unpack(">I", bytes(blob[i : i + 4]))
        ctype = bytes(blob[i + 4 : i + 8])
        if ctype == b"IDAT":
            raw = _z.decompress(bytes(blob[i + 8 : i + 8 + ln]))
            short = _z.compress(raw[:-1], 6)
            new = (
                _s.pack(">I", len(short)) + b"IDAT" + short
                + _s.pack(">I", _z.crc32(b"IDAT" + short) & 0xFFFFFFFF)
            )
            blob = blob[:i] + bytearray(new) + blob[i + 12 + ln :]
            break
        i += 12 + ln
    with pytest.raises(ValueError):
        decode_png(bytes(blob))
