"""WAV codec correctness: header/PCM decode across bit depths and
channel counts, hand-built byte fixtures, feature determinism and
separating power, and the Spark audio-decode integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vlm_ocr_pipeline_spark.functions.wav_codec import (
    audio_features,
    decode_wav,
    encode_wav,
)


def sine(freq, sr=8000, seconds=0.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


# ----------------------------------------------------------- decode


def test_hand_built_pcm16_bytes():
    # one channel, 8000 Hz, 3 samples: 0, +max, -max — built by hand,
    # no encoder involved.
    data = struct.pack("<hhh", 0, 32767, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    d = decode_wav(wav)
    assert (d["sample_rate"], d["n_channels"], d["n_samples"], d["bits"]) == (
        8000, 1, 3, 16,
    )
    np.testing.assert_allclose(
        d["samples"][:, 0], [0.0, 32767 / 32768, -1.0], atol=1e-7
    )


@pytest.mark.parametrize("bits,tol", [(8, 1 / 127), (16, 1 / 32767), (32, 1e-6), (-32, 1e-7)])
def test_roundtrip_bit_depths(bits, tol):
    x = sine(440, seconds=0.05)
    d = decode_wav(encode_wav(x, 8000, bits=bits))
    assert d["n_samples"] == len(x)
    np.testing.assert_allclose(d["samples"][:, 0], x, atol=2 * tol)


def test_roundtrip_stereo():
    x = np.stack([sine(440, seconds=0.03), sine(880, seconds=0.03)], axis=1)
    d = decode_wav(encode_wav(x, 8000, bits=16))
    assert d["n_channels"] == 2
    np.testing.assert_allclose(d["samples"], x, atol=1e-4)


def test_pcm24_decode():
    # hand-pack three 24-bit samples: 0, +2^23-1, -2^23
    vals = [0, (1 << 23) - 1, -(1 << 23)]
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_allclose(
        decode_wav(wav)["samples"][:, 0],
        [0.0, ((1 << 23) - 1) / (1 << 23), -1.0],
        atol=1e-7,
    )


def test_extensible_format_unwraps_subformat():
    x = sine(300, seconds=0.02)
    wav = bytearray(encode_wav(x, 8000, bits=16))
    # rewrite fmt chunk as WAVE_FORMAT_EXTENSIBLE with PCM subformat
    fmt_off = wav.index(b"fmt ") + 8
    base = bytes(wav[fmt_off : fmt_off + 16])
    # cbSize=22, validbits=16, channel mask u32, subformat GUID (tag=PCM)
    ext = struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + b"\x00" * 14
    new_fmt = struct.pack("<H", 0xFFFE) + base[2:] + ext
    rest = bytes(wav[fmt_off + 16 :])
    head = bytes(wav[: fmt_off - 4])
    wav2 = head + struct.pack("<I", len(new_fmt)) + new_fmt + rest
    # patch RIFF size
    wav2 = b"RIFF" + struct.pack("<I", len(wav2) - 8) + wav2[8:]
    d = decode_wav(wav2)
    np.testing.assert_allclose(d["samples"][:, 0], x, atol=1e-4)


def test_extra_chunks_skipped_and_word_alignment():
    x = sine(200, seconds=0.01)
    wav = encode_wav(x, 8000, bits=16)
    # splice an odd-length LIST chunk (padded) before fmt
    fmt_at = wav.index(b"fmt ")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = wav[:12] + extra + wav[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["n_samples"] == len(x)


def test_malformed_and_unsupported():
    x = sine(200, seconds=0.01)
    good = encode_wav(x, 8000, bits=16)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        decode_wav(good[:16])  # no fmt/data
    # ADPCM format tag -> NotImplementedError (stubbed, not failed)
    bad = bytearray(good)
    fmt_off = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off, 0x0011)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


# ---------------------------------------------------------- features


def test_features_shape_and_determinism():
    d = decode_wav(encode_wav(sine(440), 8000, bits=16))
    f1, f2 = audio_features(d), audio_features(d)
    assert len(f1) == 16
    assert f1 == f2
    total_band = sum(f1[8:])
    assert total_band == pytest.approx(1.0, abs=1e-3)


def test_features_separate_tone_from_noise_and_silence():
    sr = 8000
    tone = audio_features(decode_wav(encode_wav(sine(440, sr), sr)))
    rng = np.random.default_rng(5)
    noise = audio_features(
        decode_wav(encode_wav(rng.uniform(-0.5, 0.5, 4000), sr))
    )
    silence = audio_features(
        decode_wav(encode_wav(np.zeros(4000), sr))
    )
    # silence: zero rms, full silence fraction
    assert silence[0] == 0.0 and silence[3] == 1.0
    # a 440 Hz tone concentrates energy in low bands; noise spreads it
    assert tone[6] < noise[6]  # spectral centroid
    assert tone[15] < noise[15]  # top band fraction
    # tone zcr ~ 2*f/sr, far below uniform noise's
    assert tone[2] < noise[2]


def test_tone_band_peak_tracks_frequency():
    sr = 8000
    low = audio_features(decode_wav(encode_wav(sine(100, sr), sr)))
    high = audio_features(decode_wav(encode_wav(sine(3500, sr), sr)))
    assert int(np.argmax(low[8:])) < int(np.argmax(high[8:]))


# ------------------------------------------------- Spark integration


def test_spark_wav_decode_through_media_features(spark):
    import pandas as pd

    from vlm_ocr_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        sniff_format,
        stdlib_pixel_decoder,
    )

    payloads = [
        encode_wav(sine(440, 8000, 0.1), 8000, bits=16),
        encode_wav(
            np.stack([sine(200, 16000, 0.05), sine(300, 16000, 0.05)], axis=1),
            16000,
            bits=16,
        ),
        b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8,  # truncated -> failed
    ]
    pdf = pd.DataFrame(
        {
            "media_id": range(3),
            "kind": ["audio"] * 3,
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
    assert rows[0]["status"] == "decoded"
    assert rows[0]["width"] == 8000 and rows[0]["height"] == 1
    assert rows[0]["n_frames"] == 800
    assert len(rows[0]["features"]) == 16
    assert rows[1]["width"] == 16000 and rows[1]["height"] == 2
    assert rows[2]["status"].startswith("failed:")
