"""Audio spectral analysis over WAV binary columns (X5 audio path).

Real signal processing with zero audio libraries: the RIFF/PCM parse is
shared with `operators/multimodal.py`, the analysis is numpy rFFT over
the channel-mixed, full-scale-normalized sample stream. Per payload:
duration, RMS level, zero-crossing rate, dominant frequency, spectral
centroid / bandwidth / 85% rolloff — the standard lightweight feature
set a data-curation pipeline thresholds on (clipped/silent/tonal junk
detection) before expensive ASR or embedding passes.

Execution shape: one `mapInPandas` pass (Arrow-batched, one FFT per
payload, vectorized inside the batch), no shuffle at all — scales
linearly with the number of payload partitions, same as the image
decoders (multimodal.py). Undecodable payloads yield a NULL-feature
row rather than failing the task (same contract as decode_features).

Reference parity note: the reference has no audio surface at all; this
module exists for the multimodal-column mandate (BASELINE.json X5 /
SURVEY §2.11), with semantics pinned by analytic pytest fixtures
(pure tones, silence, stereo cancellation) in tests/test_audio.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, types as T

from .multimodal import _parse_wav

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr_per_s", T.DoubleType()),
        T.StructField("dominant_freq_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("spectral_bandwidth_hz", T.DoubleType()),
        T.StructField("rolloff85_hz", T.DoubleType()),
    ]
)


def _analyze(b: bytes):
    """Feature tuple for one WAV payload, or None if undecodable.

    Normalization: 16-bit /32768, 8-bit /128 (full scale -> [-1, 1));
    channels mixed by arithmetic mean. Spectral moments use rFFT
    magnitude with the DC bin excluded (a constant offset is level, not
    pitch); rolloff is the lowest frequency below which 85% of the
    magnitude mass lies. All-zero audio reports 0.0 for every spectral
    feature rather than NaN.
    """
    import numpy as np

    parsed = _parse_wav(bytes(b))
    if parsed is None:
        return None
    rate, nch, x, bits = parsed
    n = len(x) // nch
    if n == 0 or rate == 0:
        return (int(rate), 0) + (0.0,) * 7
    mono = x[: n * nch].reshape(n, nch).mean(axis=1)
    mono = mono / (32768.0 if bits == 16 else 128.0)
    dur = n / float(rate)
    rms = float(np.sqrt(np.mean(mono * mono)))
    crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    zcr = crossings / dur

    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    mag[0] = 0.0
    total = float(mag.sum())
    if total <= 0.0:
        dom = centroid = bandwidth = rolloff = 0.0
    else:
        dom = float(freqs[int(np.argmax(mag))])
        centroid = float((freqs * mag).sum() / total)
        bandwidth = float(
            np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total)
        )
        rolloff = float(freqs[int(np.searchsorted(np.cumsum(mag), 0.85 * total))])
    return (
        int(rate),
        int(n),
        round(dur, 6),
        round(rms, 6),
        round(zcr, 6),
        round(dom, 6),
        round(centroid, 6),
        round(bandwidth, 6),
        round(rolloff, 6),
    )


def spectral_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload audio feature rows (see :func:`_analyze`)."""
    import pandas as pd

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_SCHEMA.fields[1:]]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    feat = _analyze(payload)
                except Exception:
                    feat = None
                rows.append(
                    (int(doc_id),) + (feat if feat is not None else (None,) * 9)
                )
            yield pd.DataFrame(rows, columns=["doc_id"] + cols)

    return df.select("doc_id", payload_col).mapInPandas(_batch, schema=AUDIO_SCHEMA)


def encode_wav(x, rate: int, nch: int = 1) -> bytes:
    """Minimal RIFF writer for 16-bit PCM (`x` = int16 array, interleaved
    when nch > 1). Inverse of the shared parse; used by the payload
    synthesizer and the round-trip tests."""
    import struct

    import numpy as np

    data = np.asarray(x, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_wav_payloads(
    docs: DataFrame, rate: int = 8000, n: int = 2000
) -> DataFrame:
    """Deterministic pure-tone WAV per document: f0 = 252 + 48·(doc_id
    mod 32) Hz (bin-aligned for the default rate/n so the tone occupies
    exactly one rFFT bin), amplitude 0.5, 16-bit mono. Gives the
    spectral pass genuine audio bytes with analytically known answers.
    """
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n) / float(rate)
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                f0 = 252.0 + 48.0 * (int(doc_id) % 32)
                samples = np.round(
                    0.5 * 32767.0 * np.sin(2.0 * np.pi * f0 * t)
                ).astype("<i2")
                rows.append((int(doc_id), encode_wav(samples, rate)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(_make, schema=schema)
