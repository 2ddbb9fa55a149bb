"""Pins for the pure-Python baseline JPEG codec (operators/jpeg.py).

Layered: DCT/Huffman/bit-layer round trips in isolation; encode→decode
round trips bounded by the quantization step; and decoder-only checks
against streams assembled BY HAND in this file from the T.81 spec (so
the decoder cannot share a compensating bug with the encoder) — 4:4:4,
4:2:0 subsampled, and restart-marker variants.
"""

from __future__ import annotations

import struct

import numpy as np

from aml_feature_store_spark.operators import jpeg
from aml_feature_store_spark.operators.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _C,
    canonical_codes,
    _decode_table,
)


def test_dct_matrix_orthonormal_roundtrip():
    rng = np.random.default_rng(7)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64)
    coef = _C @ block @ _C.T
    back = _C.T @ coef @ _C
    assert np.max(np.abs(back - block)) < 1e-9
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_zigzag_is_standard_order():
    # first and last few entries of the canonical scan
    assert list(ZIGZAG[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_huffman_canonical_known_codes():
    """T.81 Annex K DC luminance: category 0 -> 00 (len 2), 5 -> 110
    (len 3), 6 -> 1110 (len 4); AC luminance EOB -> 1010 (len 4)."""
    dc = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    assert dc[0] == (0b00, 2)
    assert dc[5] == (0b110, 3)
    assert dc[6] == (0b1110, 4)
    ac = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    assert ac[0x00] == (0b1010, 4)  # EOB
    assert ac[0x01] == (0b00, 2)
    assert ac[0xF0] == (0b11111111001, 11)  # ZRL


def test_bit_layer_roundtrip_with_stuffing():
    w = _BitWriter()
    pattern = [(0xFF, 8), (0b1, 1), (0b0, 1), (0x3FFF, 14), (0xAB, 8)]
    for code, length in pattern:
        w.write(code, length)
    w.flush()
    data = bytes(w.out) + b"\xff\xd9"
    assert b"\xff\x00" in data  # stuffing happened
    r = _BitReader(data, 0)
    for code, length in pattern:
        assert r.take(length) == code


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + struct.pack(">H", len(body) + 2) + body


def _hand_stream(h, w, comps_sof, comps_sos, entropy, dri=None, q=1):
    """Assemble a baseline JPEG container by hand (test-side, not via
    the encoder): unit/flat quant table, Annex-K lum Huffman tables."""
    out = b"\xff\xd8"
    out += _seg(b"\xff\xdb", bytes([0]) + bytes([q] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps_sof))
    for cid, hv in comps_sof:
        sof += bytes([cid, hv, 0])
    out += _seg(b"\xff\xc0", sof)
    out += _seg(
        b"\xff\xc4", bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    )
    out += _seg(
        b"\xff\xc4", bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    )
    if dri is not None:
        out += _seg(b"\xff\xdd", struct.pack(">H", dri))
    sos = bytes([len(comps_sos)])
    for cid in comps_sos:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(b"\xff\xda", sos)
    return out + entropy + b"\xff\xd9"


def test_decode_hand_assembled_grayscale():
    """Constant 8x8 gray block at value 130, q=1: DC = 8*(130-128) = 16,
    category 5 -> DC code 110 + bits 10000, then EOB 1010; 12 bits padded
    with 1s -> bytes D0 AF. Every layer hand-derived from the spec."""
    entropy = bytes([0b11010000, 0b10101111])
    b = _hand_stream(8, 8, [(1, 0x11)], [1], entropy)
    px = jpeg.decode_jpeg(b)
    assert px is not None and px.shape == (8, 8, 1)
    assert np.all(px == 130)


def _write_constant_blocks(writer, n_blocks, dc_value, dc_codes, ac_codes, pred=0):
    """Entropy-encode n constant blocks (DC-only) via the public tables."""
    for _ in range(n_blocks):
        diff = dc_value - pred
        pred = dc_value
        s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return pred


def test_decode_hand_driven_420_subsampling():
    """16x16 3-component 4:2:0 stream assembled in the test: Y=2x2
    blocks DC=16 (value 130), Cb/Cr 1 block each DC=0 (neutral 128)
    -> constant gray RGB(130,130,130) after upsampling."""
    dc = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    w = _BitWriter()
    # MCU: 4 Y blocks (first DC diff 16, then 0), then Cb, Cr (diff 0)
    pred = _write_constant_blocks(w, 4, 16, dc, ac)
    _write_constant_blocks(w, 1, 0, dc, ac)
    _write_constant_blocks(w, 1, 0, dc, ac)
    w.flush()
    b = _hand_stream(
        16, 16, [(1, 0x22), (2, 0x11), (3, 0x11)], [1, 2, 3], bytes(w.out)
    )
    px = jpeg.decode_jpeg(b)
    assert px is not None and px.shape == (16, 16, 3)
    assert np.all(px == 130)


def test_decode_restart_markers_reset_predictors():
    """Two 8x8 MCUs with DRI=1: each begins from a fresh DC predictor,
    so both encode diff=16 and an RST0 sits between them."""
    dc = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    w1 = _BitWriter()
    _write_constant_blocks(w1, 1, 16, dc, ac)
    w1.flush()
    w2 = _BitWriter()
    _write_constant_blocks(w2, 1, 16, dc, ac)
    w2.flush()
    entropy = bytes(w1.out) + b"\xff\xd0" + bytes(w2.out)
    b = _hand_stream(8, 16, [(1, 0x11)], [1], entropy, dri=1)
    px = jpeg.decode_jpeg(b)
    assert px is not None and px.shape == (8, 16, 1)
    assert np.all(px == 130)


def test_roundtrip_smooth_gradient_rgb():
    yy, xx = np.mgrid[0:24, 0:32]
    px = np.stack(
        [(yy * 5 + 20) % 256, (xx * 4 + 10) % 256, ((yy + xx) * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95))
    assert out is not None and out.shape == (24, 32, 3)
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.mean() < 4.0 and err.max() <= 40


def test_roundtrip_constant_color_near_exact():
    px = np.full((8, 8, 3), [200, 64, 32], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 2  # only YCbCr round-trip rounding


def test_roundtrip_noise_and_nonmultiple_of_8():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (13, 10, 3)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=97))
    assert out is not None and out.shape == (13, 10, 3)
    # noise has full-scale high-frequency content; quality 97 keeps the
    # quantization denominators small, so error stays bounded
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 16


def test_roundtrip_grayscale():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=98))
    assert out is not None and out.shape == (16, 16, 1)
    assert np.abs(out[..., 0].astype(int) - px.astype(int)).mean() < 12


def test_decoder_rejects_progressive_and_garbage():
    assert jpeg.decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x00" * 11) is None
    assert jpeg.decode_jpeg(b"not a jpeg") is None
    assert jpeg.decode_jpeg(b"") is None
    # truncated entropy segment must not raise; it either bails (None) or
    # returns a best-effort uint8 image (the mutation-robustness contract)
    full = jpeg.encode_jpeg(np.full((8, 8), 130, dtype=np.uint8))
    out = jpeg.decode_jpeg(full[: len(full) // 2])
    assert out is None or out.dtype == np.uint8


def test_decode_features_jpeg_on_spark(spark):
    from aml_feature_store_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], ["doc_id", "text"]
    )
    out = multimodal.decode_features(
        multimodal.synthesize_jpeg_payloads(docs)
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["format"] == "jpeg"
        assert (r["width"], r["height"], r["channels"]) == (16, 16, 3)
        assert r["mean_val"] is not None and 0.0 <= r["mean_val"] <= 255.0


def test_decode_never_raises_on_mutations():
    """Garbage robustness (same contract as the PNG codec's property
    test):random byte mutations of a valid stream must yield an array or
    None, never an exception escaping decode_jpeg."""
    rng = np.random.default_rng(5)
    base = bytearray(
        jpeg.encode_jpeg(
            rng.integers(0, 256, (16, 16, 3)).astype(np.uint8), quality=85
        )
    )
    for trial in range(200):
        mutated = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        out = jpeg.decode_jpeg(bytes(mutated))
        assert out is None or out.dtype == np.uint8
    # pure noise with the SOI magic prepended
    for trial in range(50):
        blob = b"\xff\xd8" + bytes(rng.integers(0, 256, 300).astype(np.uint8))
        out = jpeg.decode_jpeg(blob)
        assert out is None or out.dtype == np.uint8


def test_video_pipeline_samples_then_decodes(spark):
    """8 MJPEG frames, stride 4 -> frames 0 and 4 decoded per doc; the
    +7k pixel shift makes later frames measurably brighter (mod wrap
    aside), and every decoded frame reports jpeg 16x16x3."""
    from aml_feature_store_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "video test alpha"), (2, "video test beta")], ["doc_id", "text"]
    )
    rows = multimodal.video_features(
        multimodal.synthesize_mjpeg_payloads(docs), every_k=4
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id in (1, 2):
        frames = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in frames] == [0, 4]
        for f in frames:
            assert f["format"] == "jpeg"
            assert (f["width"], f["height"], f["channels"]) == (16, 16, 3)
        # frames differ: the +7k shift moved the mean
        assert frames[0]["mean_val"] != frames[1]["mean_val"]


def test_huffman_tables_are_prefix_free():
    """Canonical codes from every Annex-K table must be prefix-free —
    a violated prefix property would make some decode ambiguous."""
    from aml_feature_store_spark.operators.jpeg import (
        AC_CHROM_BITS,
        AC_CHROM_VALS,
        DC_CHROM_BITS,
        DC_CHROM_VALS,
    )

    for bits, vals in (
        (DC_LUM_BITS, DC_LUM_VALS),
        (AC_LUM_BITS, AC_LUM_VALS),
        (DC_CHROM_BITS, DC_CHROM_VALS),
        (AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        codes = [
            format(code, f"0{length}b")
            for code, length in canonical_codes(bits, vals).values()
        ]
        assert len(set(codes)) == len(codes)
        for a in codes:
            for b in codes:
                if a is not b:
                    assert not b.startswith(a) or a == b


def test_roundtrip_property_random_images():
    """Hypothesis-style sweep without Spark: random dims/content/quality
    round-trip within a quality-dependent error envelope."""
    rng = np.random.default_rng(17)
    for trial in range(12):
        h = int(rng.integers(1, 25))
        w = int(rng.integers(1, 25))
        gray = bool(rng.integers(0, 2))
        quality = int(rng.choice([70, 85, 95]))
        shape = (h, w) if gray else (h, w, 3)
        if rng.integers(0, 2):
            px = rng.integers(0, 256, shape).astype(np.uint8)  # noise
            bound = 160  # worst-case high-frequency content, low quality
        else:
            base = rng.integers(0, 200)
            px = (np.zeros(shape) + base + rng.integers(0, 40)).astype(np.uint8)
            bound = 8  # near-constant blocks survive any quality
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))
        assert out is not None, (h, w, gray, quality)
        assert out.shape[:2] == (h, w)
        err = np.abs(out[..., 0 if gray else slice(None)].astype(int)
                     - px.astype(int))
        assert err.max() <= bound, (h, w, gray, quality, err.max())


# --- progressive (SOF2) ----------------------------------------------------


def test_progressive_roundtrip_matches_baseline_exactly():
    """Progressive encode -> decode must yield the SAME pixels as
    baseline encode -> decode (identical quantized coefficients; the
    scan structure is the only difference)."""
    rng = np.random.default_rng(23)
    for shape in [(8, 8), (16, 24), (24, 16, 3), (13, 19, 3), (40, 56, 3)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        for quality in (60, 90):
            for al in (1, 2):
                base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))
                prog = jpeg.decode_jpeg(
                    jpeg.encode_jpeg_progressive(px, quality=quality, al=al)
                )
                assert prog is not None, (shape, quality, al)
                assert np.array_equal(base, prog), (shape, quality, al)


def test_progressive_eobrun_spanning_blocks():
    """Smooth / constant images make entire AC bands zero across many
    blocks, forcing multi-block EOB runs (and their buffered correction
    bits) through both encoder and decoder."""
    grad = np.linspace(40, 200, 64 * 64).reshape(64, 64).astype(np.uint8)
    flat = np.full((48, 48), 77, np.uint8)
    for px in (grad, flat):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, quality=85))
        assert prog is not None and np.array_equal(base, prog)


def test_decode_hand_assembled_progressive_sa():
    """Successive-approximation stream assembled scan by scan IN THE
    TEST (T.81 Annex G rules applied by hand), so the decoder is pinned
    independently of encode_jpeg_progressive. One 8x8 grayscale block,
    unit quant table, target zigzag coefficients
    zz0=-5, zz1=3, zz4=-2, zz20=1:

      scan 1  DC first  Al=1: value -5>>1 = -3, category 2, bits 00
      scan 2  AC first 1-63 Al=1: (0,1)+'1' for zz1 (3>>1=1),
              (2,1)+'0' for zz4 (-2 -> -1), EOB  (zz20 invisible yet)
      scan 3  DC refine Al=0: one bit, (-5)&1 = 1  (-6|1 = -5)
      scan 4  AC refine 1-63 Al=0: ZRL (17 pending zero-history zeros)
              with correction bits [1,0] for zz1/zz4 riding behind it,
              then (1,1)+sign for newly-significant zz20, then EOB
    """
    from aml_feature_store_spark.operators.jpeg import (
        AC_FLAT_BITS,
        AC_FLAT_VALS,
        DC_LUM_BITS,
        DC_LUM_VALS,
        _BitWriter,
        canonical_codes,
    )

    dc = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac = canonical_codes(AC_FLAT_BITS, AC_FLAT_VALS)

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(b"\xff\xdb", bytes([0]) + bytes([1] * 64))  # unit quant
    out += seg(b"\xff\xc2", struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(b"\xff\xc4", bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(
        b"\xff\xc4",
        bytes([0x12])
        + bytes(AC_FLAT_BITS)
        + bytes(AC_FLAT_VALS),
    )

    def sos(ss, se, ah, al):
        return seg(b"\xff\xda", bytes([1, 1, 0x02 if ss else 0x00, ss, se, (ah << 4) | al]))

    # scan 1: DC first, Al=1 (diff = -3 -> category 2, bits 00)
    w = _BitWriter()
    c, ln = dc[2]
    w.write(c, ln)
    w.write(0b00, 2)
    w.flush()
    out += sos(0, 0, 0, 1) + bytes(w.out)
    # scan 2: AC first 1-63, Al=1
    w = _BitWriter()
    c, ln = ac[0x01]
    w.write(c, ln)  # run 0, size 1 -> zz1 = +1
    w.write(1, 1)
    c, ln = ac[0x21]
    w.write(c, ln)  # run 2, size 1 -> zz4 = -1
    w.write(0, 1)
    c, ln = ac[0x00]
    w.write(c, ln)  # EOB
    w.flush()
    out += sos(1, 63, 0, 1) + bytes(w.out)
    # scan 3: DC refine, Ah=1 Al=0 -> bit (-5) & 1 = 1
    w = _BitWriter()
    w.write(1, 1)
    w.flush()
    out += sos(0, 0, 1, 0) + bytes(w.out)
    # scan 4: AC refine 1-63, Ah=1 Al=0
    w = _BitWriter()
    c, ln = ac[0xF0]
    w.write(c, ln)  # ZRL: 16 zero-history positions
    w.write(1, 1)   # correction for zz1 (3 & 1)
    w.write(0, 1)   # correction for zz4 (2 & 1 = 0)
    c, ln = ac[0x11]
    w.write(c, ln)  # run 1, newly-significant
    w.write(1, 1)   # sign: positive -> zz20 = +1
    c, ln = ac[0x00]
    w.write(c, ln)  # EOB for the trailing zeros
    w.flush()
    out += sos(1, 63, 1, 0) + bytes(w.out)
    out += b"\xff\xd9"

    px = jpeg.decode_jpeg(out)
    assert px is not None and px.shape == (8, 8, 1)

    zz = np.zeros(64, np.int64)
    zz[0], zz[1], zz[4], zz[20] = -5, 3, -2, 1
    nat = np.zeros(64)
    nat[jpeg.ZIGZAG] = zz  # unit quant table: dequant is identity
    expected = jpeg._C.T @ nat.reshape(8, 8) @ jpeg._C + 128.0
    expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)
    assert np.array_equal(px[..., 0], expected)


def test_decode_progressive_subsampled_dc_only():
    """Hand-built 4:2:0 progressive stream: interleaved DC-first scan
    (4 Y blocks + Cb + Cr in one MCU) at Al=1 plus a DC refinement scan.
    No AC scans at all - a legal progressive stream; AC stays zero."""
    from aml_feature_store_spark.operators.jpeg import (
        DC_LUM_BITS,
        DC_LUM_VALS,
        _BitWriter,
        canonical_codes,
    )

    dc = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(b"\xff\xdb", bytes([0]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(b"\xff\xc2", sof)
    out += seg(b"\xff\xc4", bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    # DC first scan, all three components, Al=1: Y DC=16 -> 8, Cb/Cr 0
    w = _BitWriter()
    pred = 0
    for dcv in (8, 8, 8, 8):  # four Y blocks, shifted DC 8 (diffs 8,0,0,0)
        diff = dcv - pred
        pred = dcv
        s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        c, ln = dc[s]
        w.write(c, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    for _ in (2, 3):  # Cb, Cr: DC diff 0 (per-component predictors)
        c, ln = dc[0]
        w.write(c, ln)
    w.flush()
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01])
    out += seg(b"\xff\xda", sos) + bytes(w.out)
    # DC refine scan: one bit per block (16 & 1 = 0 for Y, 0 for Cb/Cr)
    w = _BitWriter()
    for _ in range(6):
        w.write(0, 1)
    w.flush()
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10])
    out += seg(b"\xff\xda", sos) + bytes(w.out)
    out += b"\xff\xd9"

    px = jpeg.decode_jpeg(out)
    assert px is not None and px.shape == (16, 16, 3)
    # Y DC=16 -> luma 130, neutral chroma -> gray (130, 130, 130)
    assert np.all(px == 130)


def test_progressive_truncated_is_robust():
    """Truncating a progressive stream mid-scan must never crash - the
    decode contract returns None (or a valid uint8 array for cuts that
    land after a complete scan)."""
    px = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    full = jpeg.encode_jpeg_progressive(px, quality=85)
    for frac in (0.3, 0.5, 0.7, 0.9):
        out = jpeg.decode_jpeg(full[: int(len(full) * frac)])
        assert out is None or out.dtype == np.uint8
