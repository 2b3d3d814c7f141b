"""Pure-stdlib WAV (RIFF/WAVE) codec: real PCM decode + deterministic
audio features.

WAV is the one audio container that needs no codec at all — RIFF chunk
framing plus raw PCM — so the multimodal audio path gets a REAL decode
stage in this container (reference analog: the audio load step a
training pipeline delegates to librosa/ffmpeg; here it is struct +
numpy).  Supported: PCM u8 / s16 / s24 / s32, IEEE float32/float64,
WAVE_FORMAT_EXTENSIBLE wrapping either, any channel count.

Features are 16 floats computed from the mono mix of a bounded
analysis window (first ``_ANALYSIS_CAP`` samples): time-domain stats
(rms, peak, zero-crossing rate, silence fraction, mean abs, crest),
8 octave-ish band energy fractions from one rFFT, spectral centroid
and 85% rolloff (both normalized by Nyquist).  Bounded window + fixed
reduction order keeps them deterministic across partitionings — the
payload is decoded whole, but O(FFT) work is capped per row.
"""

from __future__ import annotations

import struct

import numpy as np

_ANALYSIS_CAP = 1 << 17  # samples of mono mix fed to the FFT (~3 s @ 44.1k)

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> dict:
    """WAV bytes -> ``{"sample_rate", "n_channels", "n_samples",
    "bits", "samples"}`` where ``samples`` is (n_samples, n_channels)
    float32 in [-1, 1].

    Raises ValueError on malformed bytes and NotImplementedError on
    compressed formats (ADPCM, mu-law, ...) — mapped by the Spark
    stages to ``failed:*`` / ``stubbed:no_codec`` status rows.
    """
    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(p)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = p[i : i + 4]
        (clen,) = struct.unpack("<I", p[i + 4 : i + 8])
        body = p[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is not None and data is not None:
            break
    if fmt is None or len(fmt) < 16:
        raise ValueError("missing or short fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    audio_format, n_channels, sample_rate, _brate, block_align, bits = (
        struct.unpack("<HHIIHH", fmt[:16])
    )
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
        # SubFormat GUID: first two bytes carry the real format tag
        (audio_format,) = struct.unpack("<H", fmt[24:26])
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("bad channel count / sample rate")

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 8:
            raw = np.frombuffer(data, dtype=np.uint8)
            samples = (raw.astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
            samples = raw.astype(np.float32) / 32768.0
        elif bits == 24:
            usable = len(data) - len(data) % 3
            b = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            samples = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(data[: len(data) & ~3], dtype="<i4")
            samples = raw.astype(np.float32) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            samples = np.frombuffer(data[: len(data) & ~3], dtype="<f4")
            samples = samples.astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(data[: len(data) & ~7], dtype="<f8")
            samples = samples.astype(np.float32)
        else:
            raise NotImplementedError(f"float bit depth {bits}")
    else:
        raise NotImplementedError(f"WAV format tag 0x{audio_format:04x}")

    usable = len(samples) - len(samples) % n_channels
    samples = samples[:usable].reshape(-1, n_channels)
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(samples.shape[0]),
        "bits": int(bits),
        "samples": samples,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n, channels) float array in [-1, 1] -> PCM WAV bytes (the test
    fixture factory; 8/16/32-bit PCM and 32-bit float)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be 1-D or (n, channels)")
    n_channels = a.shape[1]
    a = np.clip(a, -1.0, 1.0)
    if bits == 8:
        fmt_tag, raw = _WAVE_FORMAT_PCM, (
            np.round(a * 127.0) + 128
        ).astype(np.uint8).tobytes()
    elif bits == 16:
        fmt_tag, raw = _WAVE_FORMAT_PCM, np.round(
            a * 32767.0
        ).astype("<i2").tobytes()
    elif bits == 32:
        fmt_tag, raw = _WAVE_FORMAT_PCM, np.round(
            a * float((1 << 31) - 1)
        ).astype("<i4").tobytes()
    elif bits == -32:  # float32 convention for tests
        fmt_tag, bits, raw = (
            _WAVE_FORMAT_IEEE_FLOAT,
            32,
            a.astype("<f4").tobytes(),
        )
    else:
        raise ValueError(f"unsupported bits {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        fmt_tag,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
        + (b"\x00" if len(raw) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(decoded: dict, n_bands: int = 8) -> list[float]:
    """16 deterministic floats from a decoded WAV (see module doc).

    Layout: [rms, peak, zcr, silence_frac, mean_abs, crest/10,
    centroid_norm, rolloff85_norm, band_frac_0..7]."""
    samples = decoded["samples"]
    if samples.size == 0:
        return [0.0] * (8 + n_bands)
    mono = samples.astype(np.float64).mean(axis=1)[:_ANALYSIS_CAP]
    n = mono.shape[0]
    abs_m = np.abs(mono)
    rms = float(np.sqrt(np.dot(mono, mono) / n))
    peak = float(abs_m.max())
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
    silence = float(np.count_nonzero(abs_m < 0.01)) / n
    mean_abs = float(abs_m.mean())
    crest = min(peak / rms, 10.0) / 10.0 if rms > 0 else 0.0

    spec = np.abs(np.fft.rfft(mono))
    power = spec * spec
    total = float(power.sum())
    nyq = len(power) - 1
    if total <= 0.0 or nyq < 1:
        centroid = rolloff = 0.0
        bands = [0.0] * n_bands
    else:
        freqs = np.arange(len(power), dtype=np.float64)
        centroid = float((freqs * power).sum() / total) / nyq
        cum = np.cumsum(power)
        rolloff = float(np.searchsorted(cum, 0.85 * total)) / nyq
        # octave-ish bands: geometric edges from nyq/2^n_bands up to nyq
        edges = [0] + [
            max(1, int(nyq * (2.0 ** (k - n_bands)))) for k in range(1, n_bands)
        ] + [len(power)]
        bands = [
            float(power[edges[k] : edges[k + 1]].sum()) / total
            for k in range(n_bands)
        ]
    feats = [rms, peak, zcr, silence, mean_abs, crest, centroid, rolloff] + bands
    return [float(np.float32(v)) for v in feats]
