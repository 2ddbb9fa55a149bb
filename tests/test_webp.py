"""VP8L (WebP lossless) codec pins.

Three independent layers, mirroring tests/test_jpeg.py's strategy:
(1) unit round-trips of the bit-io / canonical-Huffman / LZ77-ladder
layers, (2) encode→decode round trips (lossless ⇒ pixel-exact), and
(3) streams hand-assembled bit-by-bit with a LOCAL writer (not the
module's) pinning the decoder's simple-code, color-cache, distance-map,
predictor, cross-color and palette-bundling paths — so the decoder and
encoder cannot share a compensating bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aml_feature_store_spark.operators import webp
from aml_feature_store_spark.operators.webp import (
    DIST_MAP,
    _BitReader,
    _huffman_lengths,
    canonical_codes,
    decode_webp,
    encode_webp_lossless,
    lz77_decode_value,
    lz77_encode_value,
)


class HandWriter:
    """Independent LSB-first bit writer (deliberately NOT the module's)."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:  # LSB-first field
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def code(self, value: int, n: int) -> None:  # prefix code, MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def payload(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i : i + 8]):
                byte |= b << j
            out.append(byte)
        return b"\x2f" + bytes(out)


def riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def simple_code(w: HandWriter, syms: list[int]) -> None:
    """Write a simple prefix code declaring the given 1-2 symbols."""
    w.put(1, 1)
    w.put(len(syms) - 1, 1)
    if syms[0] >= 2:
        w.put(1, 1)
        w.put(syms[0], 8)
    else:
        w.put(0, 1)
        w.put(syms[0], 1)
    if len(syms) == 2:
        w.put(syms[1], 8)


def header(w: HandWriter, width: int, height: int) -> None:
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version


# --- layer 1: unit round-trips ---------------------------------------------


def test_lz77_ladder_roundtrip():
    for v in list(range(1, 200)) + [512, 1000, 3072, 4095, 4096]:
        code, extra, ebits = lz77_encode_value(v)
        assert 0 <= code < 24
        w = webp._BitWriter()
        w.write(extra, ebits)
        br = _BitReader(w.flush() or b"\x00", 0)
        assert lz77_decode_value(br, code) == v


def test_huffman_lengths_complete_and_limited():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 300))
        freqs = [int(f) for f in rng.integers(0, 1000, size=n)]
        if sum(1 for f in freqs if f) < 2:
            freqs[0] += 1
            freqs[-1] += 1
        lengths = _huffman_lengths(freqs, 15)
        used = [l for f, l in zip(freqs, lengths) if f]
        assert all(1 <= l <= 15 for l in used)
        assert sum(2 ** (15 - l) for l in used) == 2**15  # complete code
        assert all(l == 0 for f, l in zip(freqs, lengths) if not f)


def test_canonical_codes_prefix_free():
    lengths = [3, 3, 3, 3, 3, 2, 4, 4]
    codes = canonical_codes(lengths)
    seen = set()
    for sym, (code, ln) in codes.items():
        bits = format(code, f"0{ln}b")
        for other in seen:
            assert not bits.startswith(other) and not other.startswith(bits)
        seen.add(bits)


def test_distance_map_matches_spec():
    assert len(DIST_MAP) == 120
    assert len(set(DIST_MAP)) == 120
    # first 16 entries exactly as listed in the spec
    assert DIST_MAP[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    # spot pins deeper in (spec rows 5, 7, 13)
    assert DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert DIST_MAP[74:80] == [(1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1)]
    assert DIST_MAP[-4:] == [(5, 7), (-5, 7), (7, 5), (-7, 5)]


# --- layer 2: encode -> decode round trips (lossless => exact) -------------


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("use_lz77", [False, True])
def test_roundtrip_random_rgba(subtract_green, use_lz77):
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    out = decode_webp(
        encode_webp_lossless(px, subtract_green=subtract_green, use_lz77=use_lz77)
    )
    assert out is not None and np.array_equal(out, px)


def test_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(4, 9, 3), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(rgb))
    assert np.array_equal(out[..., :3], rgb) and (out[..., 3] == 255).all()
    gray = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(gray))
    for c in range(3):
        assert np.array_equal(out[..., c], gray)


def test_roundtrip_constant_and_two_color():
    # constant image: one literal + LZ77 runs; simple codes everywhere
    px = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(px))[..., :3], px)
    # two-color checkerboard: 2-symbol simple codes, no runs
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[::2, 1::2] = 200
    px[1::2, ::2] = 200
    assert np.array_equal(decode_webp(encode_webp_lossless(px))[..., :3], px)


def test_roundtrip_gradient_64():
    y, x = np.mgrid[0:64, 0:64]
    px = np.stack([(x * 4) % 256, (y * 4) % 256, (x + y) % 256], axis=-1).astype(
        np.uint8
    )
    out = decode_webp(encode_webp_lossless(px, subtract_green=True))
    assert np.array_equal(out[..., :3], px)


def test_roundtrip_translucent_alpha():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
    px[..., 3] = np.where(px[..., 3] > 128, 255, 17)
    assert np.array_equal(decode_webp(encode_webp_lossless(px)), px)


# --- layer 3: hand-assembled streams pin the decoder alone -----------------


def test_hand_simple_codes_literals():
    w = HandWriter()
    header(w, 2, 1)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no meta prefix
    w.put(0, 1)  # no color cache
    simple_code(w, [2, 5])  # green
    simple_code(w, [1])  # red
    simple_code(w, [3])  # blue
    simple_code(w, [255])  # alpha
    simple_code(w, [0])  # distance
    w.put(0, 1)  # pixel 0: green 2 (first listed -> code 0)
    w.put(1, 1)  # pixel 1: green 5
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [[[1, 2, 3, 255], [1, 5, 3, 255]]]


def _write_green_code_two_len1(w: HandWriter, sym_a: int, sym_b: int) -> None:
    """Normal (code-length-coded) green code: two symbols at length 1,
    everything else 0 — written with the 17/18 zero-run tokens and an
    explicit max_symbol so trailing zeros are implicit."""
    assert sym_a < sym_b
    w.put(0, 1)  # normal code
    # CL code: lengths {1: 1, 17: 2, 18: 2}; order starts 17, 18, 0, 1
    w.put(0, 4)  # num_code_lengths = 4
    for ln in (2, 2, 0, 1):  # order positions 17, 18, 0, 1
        w.put(ln, 3)
    # token plan: zeros to sym_a, "1", zeros to sym_b, "1"
    tokens = []
    gap1 = sym_a
    while gap1 >= 11:
        take = min(gap1, 138)
        tokens.append(("18", take))
        gap1 -= take
    while gap1 >= 3:
        take = min(gap1, 10)
        tokens.append(("17", take))
        gap1 -= take
    assert gap1 == 0, "pick sym_a reachable by 17/18 runs"
    tokens.append(("lit", 1))
    gap2 = sym_b - sym_a - 1
    while gap2 >= 11:
        take = min(gap2, 138)
        tokens.append(("18", take))
        gap2 -= take
    while gap2 >= 3:
        take = min(gap2, 10)
        tokens.append(("17", take))
        gap2 -= take
    assert gap2 == 0, "pick sym_b reachable by 17/18 runs"
    tokens.append(("lit", 1))
    # explicit max_symbol = number of tokens
    w.put(1, 1)
    w.put(1, 3)  # length_nbits = 2 + 2*1 = 4
    w.put(len(tokens) - 2, 4)  # max_symbol = 2 + field
    # canonical CL codes: sym 1 -> 0 (len 1); 17 -> 10, 18 -> 11 (len 2)
    for kind, val in tokens:
        if kind == "lit":
            w.code(0b0, 1)
        elif kind == "17":
            w.code(0b10, 2)
            w.put(val - 3, 3)
        else:
            w.code(0b11, 2)
            w.put(val - 11, 7)


def test_hand_color_cache():
    # one literal green pixel, then two color-cache hits
    cache_bits = 1
    px = (255 << 24) | (0 << 16) | (7 << 8) | 0  # ARGB of the literal
    key = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = HandWriter()
    header(w, 3, 1)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no meta
    w.put(1, 1)  # color cache present
    w.put(cache_bits, 4)
    _write_green_code_two_len1(w, 7, 280 + int(key))  # literal 7 + cache sym
    simple_code(w, [0])  # red
    simple_code(w, [0])  # blue
    simple_code(w, [255])  # alpha
    simple_code(w, [0])  # distance
    w.code(0, 1)  # literal g=7 (lower symbol -> canonical code 0)
    w.code(1, 1)  # cache hit
    w.code(1, 1)  # cache hit
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [[[0, 7, 0, 255]] * 3]


def test_hand_lz77_distance_map():
    # 2x3 image: three literals, then copy(length=3, dist code 1 -> (0,1))
    w = HandWriter()
    header(w, 3, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    _write_green_code_two_len1(w, 9, 256 + 2)  # literal 9 + length-code 2 (len 3)
    simple_code(w, [0])  # red
    simple_code(w, [0])  # blue
    simple_code(w, [255])  # alpha
    simple_code(w, [0])  # distance: prefix sym 0 -> value 1 -> DIST_MAP[0]=(0,1)
    for _ in range(3):
        w.code(0, 1)  # literals g=9
    w.code(1, 1)  # length symbol 258 -> length 3; distance code consumes 0 bits
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [[[0, 9, 0, 255]] * 3] * 2


def test_hand_predictor_transform():
    # 2x2 image, predictor transform, one 4x4 block with mode 2 (top);
    # (0,0) is forced mode 0, row 0 forced mode 1, col 0 forced mode 2
    w = HandWriter()
    header(w, 2, 2)
    w.put(1, 1)  # transform present
    w.put(0, 2)  # predictor
    w.put(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 subimage
    # subimage (1 pixel): green=mode=2, others 0; no cache
    w.put(0, 1)  # no color cache in subimage
    simple_code(w, [2])  # green = mode 2
    simple_code(w, [0])  # red
    simple_code(w, [0])  # blue
    simple_code(w, [0])  # alpha
    simple_code(w, [0])  # distance
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no meta
    w.put(0, 1)  # no cache
    # residuals: P00=(a0 r10 g20 b30), others zero
    simple_code(w, [0, 20])  # green
    simple_code(w, [0, 10])  # red
    simple_code(w, [0, 30])  # blue
    simple_code(w, [0])  # alpha residual 0 everywhere
    simple_code(w, [0])  # distance
    # P00: g=20 (second listed -> code 1), r=10, b=30
    w.put(1, 1)
    w.put(1, 1)
    w.put(1, 1)
    for _ in range(3):  # P01, P10, P11: all-zero residuals
        w.put(0, 1)
        w.put(0, 1)
        w.put(0, 1)
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [[[10, 20, 30, 255]] * 2] * 2


def test_hand_cross_color_transform():
    # single pixel, cross-color with green_to_red=16: delta=(16*64)>>5=32
    w = HandWriter()
    header(w, 1, 1)
    w.put(1, 1)  # transform present
    w.put(1, 2)  # cross-color
    w.put(0, 3)  # size_bits = 2
    # transform subimage 1x1: blue=g2r=16, green=g2b=0, red=r2b=0
    w.put(0, 1)  # no cache
    simple_code(w, [0])  # green (g2b)
    simple_code(w, [0])  # red (r2b)
    simple_code(w, [16])  # blue (g2r)
    simple_code(w, [0])  # alpha
    simple_code(w, [0])  # distance
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no meta
    w.put(0, 1)  # no cache
    simple_code(w, [64])  # green
    simple_code(w, [100])  # red (residual)
    simple_code(w, [50])  # blue
    simple_code(w, [255])  # alpha
    simple_code(w, [0])  # distance
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [[[132, 64, 50, 255]]]  # red = (100 + 32) & 255


def test_hand_palette_with_bundling():
    # 4x1 image, 2-entry palette -> 1-bit indices packed 8/byte (xbits=3)
    w = HandWriter()
    header(w, 4, 1)
    w.put(1, 1)  # transform present
    w.put(3, 2)  # color indexing
    w.put(1, 8)  # palette size 2
    # palette subimage 2x1: entry0=(a255 r10 g20 b30), entry1 delta=(0,1,2,3)
    w.put(0, 1)  # no cache
    simple_code(w, [20, 2])  # green
    simple_code(w, [10, 1])  # red
    simple_code(w, [30, 3])  # blue
    simple_code(w, [255, 0])  # alpha
    simple_code(w, [0])  # distance
    for _ in range(4):  # entry0: first-listed symbols on all four channels
        pass
    w.put(0, 1)  # g=20
    w.put(0, 1)  # r=10
    w.put(0, 1)  # b=30
    w.put(0, 1)  # a=255
    w.put(1, 1)  # g=2 (delta)
    w.put(1, 1)  # r=1
    w.put(1, 1)  # b=3
    w.put(1, 1)  # a=0
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no meta
    w.put(0, 1)  # no cache
    # packed main image: 1x1, green byte = indices 0,1,1,0 -> 0b0110
    simple_code(w, [6])  # green
    simple_code(w, [0])  # red
    simple_code(w, [0])  # blue
    simple_code(w, [0])  # alpha
    simple_code(w, [0])  # distance
    out = decode_webp(riff(w.payload()))
    assert out is not None
    assert out.tolist() == [
        [[10, 20, 30, 255], [11, 22, 33, 255], [11, 22, 33, 255], [10, 20, 30, 255]]
    ]


# --- robustness + container ------------------------------------------------


def test_malformed_streams_return_none():
    px = np.full((3, 3, 3), 9, dtype=np.uint8)
    full = encode_webp_lossless(px)
    assert decode_webp(full[: len(full) // 2]) is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_webp(b"") is None
    # lossy VP8 chunk: honestly gated
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    assert decode_webp(lossy) is None
    # bad VP8L signature byte
    bad = bytearray(full)
    bad[bad.index(b"VP8L") + 8] = 0x30
    assert decode_webp(bytes(bad)) is None


def test_vp8x_container_walk():
    px = np.full((2, 2, 3), 5, dtype=np.uint8)
    full = encode_webp_lossless(px)
    vp8l_at = full.index(b"VP8L")
    vp8l_chunk = full[vp8l_at:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk)) + b"WEBP" + vp8x + vp8l_chunk
    out = decode_webp(wrapped)
    assert out is not None and (out[..., :3] == 5).all()


def test_decode_features_dispatch(spark):
    from aml_feature_store_spark.operators.multimodal import decode_features

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    blob = encode_webp_lossless(px)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    row = decode_features(df).collect()[0]
    assert row.format == "webp"
    assert (row.width, row.height, row.channels) == (4, 6, 3)
    assert row.mean_val == pytest.approx(float(px.astype(np.float64).mean()))
