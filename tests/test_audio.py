"""Analytic pins for the audio spectral operator (operators/audio.py).

Pure tones, silence, stereo cancellation, 8-bit PCM, and malformed
payloads — every expectation is closed-form, no audio library anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from aml_feature_store_spark.operators import audio
from aml_feature_store_spark.operators.multimodal import _parse_wav

RATE, N = 8000, 2000  # rFFT bin width = RATE/N = 4 Hz


def _tone(f0: float, amp: float = 0.5, rate: int = RATE, n: int = N):
    t = np.arange(n) / rate
    return np.round(amp * 32767.0 * np.sin(2 * np.pi * f0 * t)).astype("<i2")


def test_wav_roundtrip_parse():
    samples = _tone(1000.0)
    rate, nch, x, bits = _parse_wav(audio.encode_wav(samples, RATE))
    assert (rate, nch, bits) == (RATE, 1, 16)
    assert np.array_equal(x.astype("<i2"), samples)


def test_pure_tone_bin_aligned():
    """1000 Hz = bin 250 exactly: dominant/centroid/rolloff all 1000,
    bandwidth ~0, RMS = amp/sqrt(2), ZCR = 2*f0 crossings/s."""
    feat = audio._analyze(audio.encode_wav(_tone(1000.0), RATE))
    (rate, n, dur, rms, zcr, dom, centroid, bandwidth, rolloff) = feat
    assert (rate, n, dur) == (RATE, N, 0.25)
    assert dom == 1000.0
    assert abs(centroid - 1000.0) < 0.1  # leakage only from int16 rounding
    assert bandwidth < 20.0  # quantization noise floor, vs 4 kHz Nyquist
    assert rolloff == 1000.0
    assert abs(rms - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(zcr - 2 * 1000.0) < 8.0  # +-1 crossing per period boundary


def test_two_tone_centroid_between():
    strong, weak = _tone(500.0, amp=0.45), _tone(2000.0, amp=0.15)
    mix = (strong.astype(np.int32) + weak.astype(np.int32)).astype("<i2")
    feat = audio._analyze(audio.encode_wav(mix, RATE))
    _, _, _, _, _, dom, centroid, bandwidth, rolloff = feat
    assert dom == 500.0
    assert 500.0 < centroid < 2000.0
    # magnitude-weighted: (500*3a + 2000*a)/4a = 875 with a=weak amplitude
    assert abs(centroid - 875.0) < 10.0
    assert bandwidth > 100.0
    assert rolloff == 2000.0  # 85% mass needs part of the 2 kHz line


def test_silence_reports_zeros_not_nan():
    feat = audio._analyze(audio.encode_wav(np.zeros(N, dtype="<i2"), RATE))
    assert feat[3:] == (0.0,) * 6


def test_stereo_mixdown_cancels():
    tone = _tone(800.0)
    interleaved = np.empty(2 * N, dtype="<i2")
    interleaved[0::2], interleaved[1::2] = tone, -tone
    feat = audio._analyze(audio.encode_wav(interleaved, RATE, nch=2))
    assert feat[1] == N  # frames, not raw samples
    assert feat[3] < 1e-4  # L/R cancel after mean mixdown


def test_8bit_pcm_path():
    t = np.arange(N) / RATE
    x8 = (128.0 + 100.0 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.uint8)
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, RATE, RATE, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(x8)) + x8.tobytes()
    )
    feat = audio._analyze(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert feat[0] == RATE and feat[5] == 1000.0


def test_malformed_payload_returns_none():
    assert audio._analyze(b"not audio at all") is None
    assert audio._analyze(b"RIFF\x00\x00\x00\x00JUNK") is None


def test_spark_spectral_features_end_to_end(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    out = audio.spectral_features(audio.synthesize_wav_payloads(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6
    for i in range(6):
        f0 = 252.0 + 48.0 * (i % 32)
        assert rows[i]["dominant_freq_hz"] == pytest.approx(f0, abs=1e-9)
        assert rows[i]["sample_rate"] == RATE
        assert rows[i]["duration_s"] == 0.25


def test_spark_null_row_on_garbage(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"garbage")), (2, bytearray(audio.encode_wav(_tone(500.0), RATE)))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio.spectral_features(df).collect()}
    assert rows[1]["rms"] is None and rows[1]["sample_rate"] is None
    assert rows[2]["dominant_freq_hz"] == 500.0


def test_wav_parse_property_random_pcm():
    """Random 8/16-bit PCM, 1-3 channels: encode->parse must reproduce
    the sample stream exactly (16-bit) and the header fields always."""
    rng = np.random.default_rng(23)
    for trial in range(10):
        nch = int(rng.integers(1, 4))
        n = int(rng.integers(1, 500)) * nch
        rate = int(rng.choice([8000, 16000, 44100]))
        x = rng.integers(-32768, 32767, n).astype("<i2")
        rate2, nch2, parsed, bits = _parse_wav(audio.encode_wav(x, rate, nch=nch))
        assert (rate2, nch2, bits) == (rate, nch, 16)
        assert np.array_equal(parsed.astype("<i2"), x)


def test_analyze_handles_odd_lengths_and_extremes():
    for n in (1, 2, 3, 7):
        feat = audio._analyze(audio.encode_wav(np.ones(n, dtype="<i2"), 8000))
        assert feat is not None and feat[1] == n
    # full-scale square wave: rms ~ 1.0
    sq = np.tile(np.array([32767, -32768], dtype="<i2"), 1000)
    feat = audio._analyze(audio.encode_wav(sq, 8000))
    assert abs(feat[3] - 1.0) < 1e-3
    assert abs(feat[5] - 4000.0) < 4.1  # +-1/-1 alternation = Nyquist


def test_zcr_closed_form_all_query_tone_classes():
    """The audio_spectral_features oracle pins zcr_per_s = 2·f0 − 4
    exactly: crossings are integer-side (signbit flips of the int16
    samples), and a bin-aligned tone of f0/2 whole half-cycles over
    0.25 s flips f0/2 − 1 times (the t=0 endpoint is not a
    sample-to-sample flip). Verify the law over ALL 32 tone classes the
    query synthesizes — any change to the synthesis or the crossing
    count that would redden the driver's oracle check reddens here
    first."""
    for m in range(32):
        f0 = 252.0 + 48.0 * m
        feat = audio._analyze(audio.encode_wav(_tone(f0), RATE))
        zcr = feat[4]
        assert zcr == 2.0 * f0 - 4.0, (m, f0, zcr)
