"""Pure-numpy baseline JPEG codec: real huffman + IDCT pixel decode.

The third image container the multimodal stage can now decode with no
codec library (after PNG and GIF): baseline sequential JPEG (SOF0 and
the extended-sequential SOF1, which shares the baseline decode path)
is huffman-coded quantized DCT blocks — all of it expressible with
struct parsing, a bit reader, and two 8x8 matmuls per block
(reference analog: the JPEG open the reference delegates to PIL).

- decode: SOF0/SOF1, multiple DQT/DHT tables, any h/v sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1), restart intervals, 1- and
  3-component images (grayscale / YCbCr->RGB BT.601).  Progressive
  (SOF2), arithmetic coding, and 12-bit precision raise
  NotImplementedError -> 'stubbed' status rows, never job aborts.
- encode (test-vector factory): 4:4:4 or subsampled chroma, Annex K
  quantization tables scaled by a quality factor, Annex K huffman
  tables, restart-interval support.

Scale shape: the entropy scan is inherently sequential per image
(huffman recurrence), so cost is O(coded symbols) Python-loop work
per payload inside the Arrow batch; the numeric half (dequantize,
IDCT, upsample, color convert) is vectorized over ALL blocks of a
component at once (einsum-free two-matmul IDCT).  Parallelism comes
from Spark partitioning over payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: B[k, n] = c(k) cos((2n+1)k pi/16)
_DCT_B = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _DCT_B[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical huffman tables: (BITS counts per length 1..16, values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# ------------------------------------------------------------ huffman


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """{symbol -> (code, length)}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over an entropy-coded segment.  The caller
    hands in bytes with 0xFF00 stuffing REMOVED; restart markers are
    handled by the scan loop re-aligning to the next segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """DCT coefficient sign extension (spec F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> tuple[int, int]:
    """Inverse of EXTEND for the encoder: value -> (size, raw bits)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    raw = v if v > 0 else v + (1 << t) - 1
    return t, raw


# ------------------------------------------------------------- decode


def _split_entropy_segments(p: bytes, i: int) -> tuple[list[bytes], int]:
    """From SOS data start: entropy bytes with FF00 unstuffed, split at
    restart markers; returns (segments, offset of the terminating
    marker's 0xFF)."""
    segments = []
    cur = bytearray()
    n = len(p)
    while i < n:
        b = p[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated entropy stream")
        m = p[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next real marker ends the scan
            segments.append(bytes(cur))
            return segments, i
    raise ValueError("entropy stream missing terminating marker")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, C) uint8, C = 1 (grayscale) or
    3 (RGB).  Raises ValueError on malformed bytes, NotImplementedError
    on progressive/arithmetic/12-bit variants."""
    p = bytes(payload)
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i, n = 2, len(p)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while i + 4 <= n:
        if p[i] != 0xFF:
            raise ValueError("desynced marker stream")
        marker = p[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        seglen = int.from_bytes(p[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError("bad segment length")
        seg = p[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2")
                    j += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(tbl) != 64:
                    raise ValueError("short DQT table")
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl.astype(np.int64)
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError("short DHT table")
                htables[(tc, th)] = _build_decode_table(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 — baseline decode
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
            segments, _end = _split_entropy_segments(p, i)
            return _decode_scan(
                frame, scan_sel, qtables, htables, segments, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(frame, scan_sel, qtables, htables, segments,
                 restart_interval) -> np.ndarray:
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    if width == 0 or height == 0:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        if c["id"] not in scan_sel:
            raise NotImplementedError("multi-scan JPEG (component missing)")
        c["dc_t"], c["ac_t"] = scan_sel[c["id"]]
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
        if c["tq"] not in qtables:
            raise ValueError(f"missing DQT {c['tq']}")

    n_mcus = mcus_x * mcus_y
    seg_idx = 0
    reader = _BitReader(segments[0])
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcus_x)
        for c in comps:
            dc_tbl = htables.get((0, c["dc_t"]))
            ac_tbl = htables.get((1, c["ac_t"]))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("missing DHT table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int64)
                    t = reader.read_symbol(dc_tbl)
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk

    # numeric half, vectorized per component over all blocks at once
    planes = []
    for c in comps:
        # coefficients are in zigzag order; map to natural order then
        # dequantize with the natural-order table
        nat = np.zeros_like(c["coef"])
        nat[:, _ZIGZAG] = c["coef"]
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        blocks *= qtables[c["tq"]][None, :, :]
        spat = _DCT_B.T @ blocks @ _DCT_B + 128.0
        spat = np.clip(np.round(spat), 0, 255).astype(np.uint8)
        # stitch blocks into the component plane
        plane = (
            spat.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0][:, :, None]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


def _encode_blocks(writer, blocks, q, dc_enc, ac_enc, pred):
    """Forward DCT + quantize + entropy-code a (n, 8, 8) block array
    (per-block Python loop only for the huffman half)."""
    coefs = _DCT_B @ (blocks - 128.0) @ _DCT_B.T
    quant = np.round(coefs / q[None, :, :]).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        t, raw = _category(diff)
        code, length = dc_enc[t]
        writer.write(code, length)
        if t:
            writer.write(raw, t)
        run = 0
        last_nz = int(np.max(np.nonzero(row)[0])) if np.any(row[1:]) else 0
        for k in range(1, 64):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_enc[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s, raw = _category(v)
            code, length = ac_enc[(run << 4) | s]
            writer.write(code, length)
            writer.write(raw, s)
            run = 0
        if last_nz < 63:
            code, length = ac_enc[0x00]  # EOB
            writer.write(code, length)
    return pred


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 -> baseline JFIF bytes.  C = 1 grayscale,
    C = 3 RGB (encoded YCbCr 4:4:4, or 4:2:0 with ``subsample``)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    height, width, ncomp = a.shape
    if height == 0 or width == 0:
        raise ValueError("zero-dimension image")
    gray = ncomp == 1
    ql = _scale_q(_Q_LUMA.reshape(8, 8), quality)
    qc = _scale_q(_Q_CHROMA.reshape(8, 8), quality)

    if gray:
        planes = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            eh, ew = -(-height // 2) * 2, -(-width // 2) * 2
            cbp = np.pad(cb, ((0, eh - height), (0, ew - width)), mode="edge")
            crp = np.pad(cr, ((0, eh - height), (0, ew - width)), mode="edge")
            cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    padded = []
    for plane, (h, v) in zip(planes, samp):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        pp = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        padded.append(pp)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tq, table):
        zz = table.reshape(64)[_ZIGZAG]
        return (
            b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq])
            + bytes(int(x) for x in zz)
        )

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)

    ncomps = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, height, width, ncomps)
    for ci in range(ncomps):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA)
    if not gray:
        out += dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomps])
    for ci in range(ncomps):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_build_encode_table(*_HT_DC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_DC_CHROMA)] * 2
    )
    enc_ac = [_build_encode_table(*_HT_AC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_AC_CHROMA)] * 2
    )
    qs = [ql.astype(np.float64)] + ([] if gray else [qc.astype(np.float64)] * 2)

    writer = _BitWriter()
    preds = [0] * ncomps
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomps
        my, mx = divmod(mcu, mcus_x)
        for ci in range(ncomps):
            h, v = samp[ci]
            blocks = []
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    blocks.append(padded[ci][y0 : y0 + 8, x0 : x0 + 8])
            preds[ci] = _encode_blocks(
                writer,
                np.stack(blocks),
                qs[ci],
                enc_dc[ci],
                enc_ac[ci],
                preds[ci],
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
