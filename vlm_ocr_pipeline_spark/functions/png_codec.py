"""Pure-stdlib PNG codec: real pixel decode/encode with zlib + numpy.

The container has no PIL/ffmpeg, but PNG needs neither — the format is
zlib-compressed scanlines behind five byte-level predictors (RFC 2083 /
PNG spec 3rd ed. §7-§9).  This module implements enough of the spec to
make the multimodal decode/resize stages REAL for PNG payloads instead
of injectable stubs (reference analog: the decode step the reference
delegates to PIL in `pipeline/` image handling; here it is codec-free
by construction):

- decode: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); filters 0-4 (None/Sub/Up/Average/Paeth);
  both non-interlaced and Adam7-interlaced layouts (7 sub-images,
  per-pass filtering).  Only bit depths != 8 still raise
  NotImplementedError -> the Spark stage records a status row, never
  aborts the job.
- encode: filter 0 (None) scanlines, one IDAT, CRC via zlib.crc32;
  optional Adam7 layout (the interlaced decoder's test-vector twin).
- resize: nearest-neighbour and box-average via numpy indexing.

Scale shape: decode happens INSIDE mapInPandas Arrow batches
(multimodal.extract_media_features / resize_media) — payload bytes
never leave the executor, and per-image work is O(pixels) with the
sequential part (Average/Paeth unfilter) bounded per scanline; Sub is
vectorized as a per-channel-lane cumsum.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(p: bytes):
    """Yield (type, data) for each chunk; validates lengths + CRC."""
    i = 8
    n = len(p)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", p[i : i + 4])
        ctype = p[i + 4 : i + 8]
        end = i + 8 + length
        if end + 4 > n:
            raise ValueError("truncated PNG chunk")
        data = p[i + 8 : end]
        (crc,) = struct.unpack(">I", p[end : end + 4])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        i = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline predictors.  ``raw`` is the decompressed
    stream: height rows of (1 filter byte + stride pixel bytes).

    Filter math is mod-256 byte arithmetic (uint8 wraparound IS the
    spec's arithmetic).  Sub (1) has an in-row recurrence but it is a
    prefix sum per channel lane; Average (3) and Paeth (4) stay
    per-pixel along x (prior row is already reconstructed)."""
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        line = raw[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] -> lane prefix sum
            for k in range(bpp):
                line[k::bpp] = (
                    np.cumsum(line[k::bpp], dtype=np.uint64) & 0xFF
                ).astype(np.uint8)
        elif f == 2:  # Up
            line += prev
        elif f == 3:  # Average: + floor((left + up) / 2)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line
        prev = line
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C in {1, 2, 3, 4}; palette
    images expand to RGB / RGBA when a tRNS chunk is present).

    Raises ValueError on malformed bytes and NotImplementedError on
    spec features out of scope (bit depth != 8, Adam7 interlace) — the
    Spark stages map both to non-aborting status rows.
    """
    p = bytes(payload)
    if p[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    for ctype, data in _chunks(p):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"bit depth {bit_depth} (only 8 supported)")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid color type {color_type}")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:
        px = _deinterlace_adam7(raw, width, height, ch)
    else:
        if raw.size != height * (1 + stride):
            raise ValueError(
                f"IDAT size {raw.size} != expected {height * (1 + stride)}"
            )
        px = _unfilter(raw.copy(), height, stride, ch).reshape(
            height, width, ch
        )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        if idx.max() >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full((height, width, 1), 255, dtype=np.uint8)
            lim = min(len(trns), len(palette))
            alpha[:, :, 0] = np.where(idx < lim, trns[np.minimum(idx, lim - 1)], 255)
            return np.concatenate([rgb, alpha], axis=2)
        return rgb
    return px


# Adam7 pass grid: (x origin, y origin, x step, y step).  The
# decompressed stream is the 7 reduced sub-images in order, each with
# its own filter byte per scanline and filtering scoped to the pass
# (the previous row is the pass's previous row, never the image's).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _deinterlace_adam7(
    raw: np.ndarray, width: int, height: int, ch: int
) -> np.ndarray:
    """Decode the 7 Adam7 sub-images and scatter them onto the full
    grid (PNG spec 3rd ed. §8.2).  Empty passes (dimension rounds to
    zero) contribute NO bytes, not even filter bytes."""
    out = np.zeros((height, width, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * ch
        need = ph * (1 + stride)
        if pos + need > raw.size:
            raise ValueError("IDAT too short for Adam7 passes")
        sub = _unfilter(raw[pos : pos + need].copy(), ph, stride, ch)
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        pos += need
    if pos != raw.size:
        raise ValueError(f"IDAT size {raw.size} != Adam7 expected {pos}")
    return out


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W[, C]) uint8 array -> PNG bytes (filter 0, single IDAT).

    C = 1 -> grayscale, 2 -> gray+alpha, 3 -> RGB, 4 -> RGBA.
    ``interlace`` writes the Adam7 layout (7 filter-0 sub-images) —
    the test-vector twin of :func:`_deinterlace_adam7`.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    height, width, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            ph, pw = sub.shape[:2]
            lines = np.zeros((ph, 1 + pw * ch), dtype=np.uint8)
            lines[:, 1:] = sub.reshape(ph, pw * ch)
            parts.append(lines.tobytes())
        idat = zlib.compress(b"".join(parts), 6)
    else:
        # prepend the filter-0 byte per scanline
        lines = np.zeros((height, 1 + width * ch), dtype=np.uint8)
        lines[:, 1:] = a.reshape(height, width * ch)
        idat = zlib.compress(lines.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via integer index maps (pixel-center
    convention: src = floor((dst + 0.5) * scale))."""
    if width < 1 or height < 1:
        raise ValueError("target dims must be >= 1")
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def resize_box(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Box-average downsample when the target divides the source evenly
    on both axes (the training-thumbnail fast path); falls back to
    nearest otherwise."""
    h, w = arr.shape[:2]
    if h % height == 0 and w % width == 0:
        fy, fx = h // height, w // width
        a = arr.reshape(height, fy, width, fx, -1).astype(np.uint32)
        return (a.sum(axis=(1, 3)) // (fy * fx)).astype(np.uint8)
    return resize_nearest(arr, width, height)


def pixel_features(arr: np.ndarray, n_bins: int = 8) -> list[float]:
    """Deterministic 16-dim feature vector from REAL pixels: per-channel
    mean/std over up to 4 channels (8 slots, missing channels 0), then
    an 8-bin luminance histogram (fractions).  All values are computed
    in integer space then divided once — engine-stable."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, ch = a.shape
    n = h * w
    feats: list[float] = []
    flat = a.reshape(n, ch).astype(np.int64)
    for c in range(4):
        if c < ch:
            col = flat[:, c]
            mean = float(col.sum()) / n / 255.0
            var = float((col * col).sum()) / n - (float(col.sum()) / n) ** 2
            feats += [mean, float(np.sqrt(max(var, 0.0))) / 255.0]
        else:
            feats += [0.0, 0.0]
    # integer-weighted luminance (ITU-R 601 scaled by 1000)
    if ch >= 3:
        lum = (299 * flat[:, 0] + 587 * flat[:, 1] + 114 * flat[:, 2]) // 1000
    else:
        lum = flat[:, 0]
    hist, _ = np.histogram(lum, bins=n_bins, range=(0, 256))
    feats += [float(c) / n for c in hist]
    return [float(np.float32(v)) for v in feats]
