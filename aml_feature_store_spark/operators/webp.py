"""WebP lossless (VP8L) codec in pure Python + numpy (SURVEY §2.11 X5).

Closes the WebP half of the last codec gate in the multimodal family:
BMP/PPM/WAV (struct+numpy), PNG (stdlib zlib), GIF (pure-Python LZW) and
baseline+progressive JPEG (`operators/jpeg.py`) already decode natively;
this module adds the public "WebP Lossless Bitstream Specification"
(VP8L) — the RIFF container walk, the LSB-first bit reader with
DEFLATE-convention canonical prefix codes, both the simple and the
code-length-coded ("normal") prefix-code headers, meta prefix-code
groups, the color cache, LZ77 backward references with the 120-entry 2D
distance map, and all four inverse transforms (predictor ×14 modes,
cross-color, subtract-green, color-indexing with sub-byte pixel
bundling).  Lossy VP8 streams return None (honestly gated — VP8 is a
full intra-frame video codec, out of scope like 12-bit JPEG).

Encoder: a REAL general VP8L encoder, not a fixture generator — per-image
Huffman codes built from channel histograms (length-limited to the
spec's 15-bit cap with an exact-Kraft completion pass), emitted through
the code-length code with 16/17/18 run tokens, optional subtract-green
transform, optional LZ77 run-length tokens (distance 1) through the
length/distance prefix ladder, and the simple-code path when a channel
plane has ≤2 distinct values.  Lossless: encode→decode round-trips are
bit-exact for any uint8 image.

Correctness is pinned three ways in tests/test_webp.py, mirroring the
JPEG/PNG strategy: (1) the Huffman / bit-io / LZ77-ladder layers
round-trip in isolation, (2) encode→decode round trips are pixel-exact
across channel shapes and transform combinations, and (3) streams
hand-assembled bit-by-bit in the test (an independent writer, not this
encoder) pin the decoder's color-cache, distance-map, predictor and
palette-bundling paths — so decoder and encoder cannot share a
compensating bug.

Scale shape: like the other codecs this runs inside Arrow-batched
`mapInPandas` kernels (`operators/multimodal.py:decode_features`), one
Python call per payload, no shuffle — codec throughput scales with
partition count, which is the only axis that matters at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 2D distance map (spec §4.2.2) -----------------------------------------
# The first 120 LZ77 distance codes address a 2D pixel neighbourhood.  The
# table is exactly the set of offsets (dx, dy) with dy in [0, 8],
# dx in [-8, 8], (dy, dx) != (0, non-positive), and dx^2 + dy^2 <= 74,
# ordered by squared distance, then larger dy first, then smaller |dx|,
# then positive dx first — which reproduces the spec's published list
# (tests/test_webp.py pins the first 16 and the tail against the spec).


def _build_distance_map() -> list[tuple[int, int]]:
    cand = [
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if (dy > 0 or dx > 0) and dx * dx + dy * dy <= 74
    ]
    cand.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], abs(p[0]), p[0] < 0))
    assert len(cand) == 120
    return cand


DIST_MAP = _build_distance_map()

_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


# --- bit io (LSB-first within bytes; prefix codes MSB-of-code-first) --------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated VP8L stream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """Write n bits of value, LSB first (raw header fields / extra bits)."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Write a prefix code MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# --- canonical prefix codes -------------------------------------------------


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length), DEFLATE canonical assignment."""
    maxlen = max(lengths, default=0)
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (maxlen + 2)
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side prefix code: either 0-bit single-symbol or a
    (length, code) -> symbol map walked one bit at a time."""

    __slots__ = ("single", "table", "maxlen")

    def __init__(self, lengths: list[int] | None, single: int | None = None):
        if single is not None:
            self.single = single
            self.table = None
            self.maxlen = 0
            return
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if len(used) == 1:
            self.single = used[0][0]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        codes = canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.maxlen = max(ln for _, ln in used)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bits(1):  # simple code
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            first = br.bits(8)
        else:
            first = br.bits(1)
        if num_symbols == 1:
            return _PrefixCode(None, single=first)
        second = br.bits(8)
        lengths = [0] * alphabet_size
        lengths[first] = 1
        lengths[second] = 1
        # canonical over {first, second}: smaller symbol gets code 0 —
        # but the spec assigns code 0 to the FIRST listed symbol.  With
        # two 1-bit symbols canonical assignment is by symbol value, so
        # emit through an explicit table to honour listing order.
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = None
        pc.table = {(1, 0): first, (1, 1): second}
        pc.maxlen = 1
        return pc
    num_code_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif s == 17:
            sym += 3 + br.bits(3)
        else:
            sym += 11 + br.bits(7)
    return _PrefixCode(lengths)


# --- LZ77 prefix ladder (shared by lengths and distances, spec §4.2.2) ------


def lz77_decode_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def lz77_encode_value(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix code, extra bits value, extra bit count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    code = 2 * nbits + ((v >> (nbits - 1)) & 1)
    extra = nbits - 1
    offset = (2 + (code & 1)) << extra
    return code, value - offset - 1, extra


# --- decoder ---------------------------------------------------------------


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_image_data(
    br: _BitReader, xsize: int, ysize: int, level0: bool
) -> tuple[np.ndarray, list]:
    """Decode one entropy-coded image; returns (pixels[y, x] uint32 ARGB,
    transforms) — transforms only populated at level 0 (spec §5)."""
    transforms: list = []
    seen_types: set[int] = set()
    cur_x = xsize
    if level0:
        while br.bits(1):
            ttype = br.bits(2)
            if ttype in seen_types:
                raise ValueError("duplicate VP8L transform")
            seen_types.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                size_bits = br.bits(3) + 2
                bw = (cur_x + (1 << size_bits) - 1) >> size_bits
                bh = (ysize + (1 << size_bits) - 1) >> size_bits
                data, _ = _decode_image_data(br, bw, bh, False)
                transforms.append((ttype, size_bits, data, cur_x))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, cur_x))
            else:  # color indexing
                pal_size = br.bits(8) + 1
                pal_img, _ = _decode_image_data(br, pal_size, 1, False)
                pal = pal_img[0].copy()
                # palette entries are stored component-delta-coded
                for i in range(1, pal_size):
                    a = ((pal[i] >> 24) + (pal[i - 1] >> 24)) & 0xFF
                    r = ((pal[i] >> 16) + (pal[i - 1] >> 16)) & 0xFF
                    g = ((pal[i] >> 8) + (pal[i - 1] >> 8)) & 0xFF
                    b = (pal[i] + pal[i - 1]) & 0xFF
                    pal[i] = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                xbits = 3 if pal_size <= 2 else 2 if pal_size <= 4 else 1 if pal_size <= 16 else 0
                transforms.append((3, xbits, pal, cur_x))
                cur_x = (cur_x + (1 << xbits) - 1) >> xbits
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.bits(1):  # meta prefix codes
        meta_bits = br.bits(3) + 2
        mw = (cur_x + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _decode_image_data(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, 256 + 24 + cache_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    cache = [0] * cache_size
    n = cur_x * ysize
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, cur_x)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        s = g[0].read(br)
        if s < 256:  # literal: G, R, B, A
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = lz77_decode_value(br, s - 256)
            dist_code = lz77_decode_value(br, g[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * cur_x + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:  # color cache hit
            if not cache_size:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(ysize, cur_x), transforms


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, left, top, topleft, topright) -> np.ndarray:
    """One of the 14 spatial predictors (spec §4.2.1); args/result are
    length-4 int arrays [A, R, G, B]."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        p = left.astype(np.int32) + top.astype(np.int32) - topleft.astype(np.int32)
        p_left = int(np.abs(p - left).sum())
        p_top = int(np.abs(p - top).sum())
        return left if p_left < p_top else top
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(
            left.astype(np.int32) + top.astype(np.int32) - topleft.astype(np.int32),
            0,
            255,
        )
    if mode == 13:  # ClampAddSubtractHalf (C truncation toward zero)
        ave = _avg2(left, top)
        delta = ave - topleft.astype(np.int32)
        half = np.where(delta >= 0, delta // 2, -((-delta) // 2))
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"invalid predictor mode {mode}")


def _split_channels(img: np.ndarray) -> np.ndarray:
    """uint32 [h, w] -> int32 [h, w, 4] as A, R, G, B."""
    return np.stack(
        [(img >> 24) & 0xFF, (img >> 16) & 0xFF, (img >> 8) & 0xFF, img & 0xFF],
        axis=-1,
    ).astype(np.int32)


def _join_channels(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.uint32) & 0xFF
    return (c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]


def _inverse_predictor(img: np.ndarray, size_bits: int, pred_img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    res = _split_channels(img)
    out = np.zeros_like(res)
    modes = ((pred_img >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _predict(0, None, None, None, None)
            elif y == 0:
                pred = _predict(1, out[0, x - 1], None, None, None)
            elif x == 0:
                pred = _predict(2, None, out[y - 1, 0], None, None)
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                left = out[y, x - 1]
                top = out[y - 1, x]
                topleft = out[y - 1, x - 1]
                # top-right of the last column is the first pixel of the
                # current row (rows are contiguous in the spec's model)
                topright = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict(mode, left, top, topleft, topright)
            out[y, x] = (res[y, x] + pred) & 0xFF
    return _join_channels(out)


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: int8 product, arithmetic >> 5."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inverse_color_transform(img: np.ndarray, size_bits: int, cti: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ch = _split_channels(img)
    g2r = (cti & 0xFF).astype(np.int64)
    g2b = ((cti >> 8) & 0xFF).astype(np.int64)
    r2b = ((cti >> 16) & 0xFF).astype(np.int64)
    for y in range(h):
        by = y >> size_bits
        for x in range(w):
            bx = x >> size_bits
            green = int(ch[y, x, 2])
            red = int(ch[y, x, 1]) + _ctd(int(g2r[by, bx]), green)
            red &= 0xFF
            blue = int(ch[y, x, 3]) + _ctd(int(g2b[by, bx]), green) + _ctd(
                int(r2b[by, bx]), red
            )
            ch[y, x, 1] = red
            ch[y, x, 3] = blue & 0xFF
    return _join_channels(ch)


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    ch = _split_channels(img)
    ch[..., 1] = (ch[..., 1] + ch[..., 2]) & 0xFF
    ch[..., 3] = (ch[..., 3] + ch[..., 2]) & 0xFF
    return _join_channels(ch)


def _inverse_color_indexing(
    img: np.ndarray, xbits: int, pal: np.ndarray, full_width: int
) -> np.ndarray:
    h = img.shape[0]
    out = np.zeros((h, full_width), dtype=np.uint32)
    bpp = 8 >> xbits if xbits else 8
    mask = (1 << bpp) - 1 if xbits else 0xFF
    greens = ((img >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        for x in range(full_width):
            if xbits:
                packed = int(greens[y, x >> xbits])
                idx = (packed >> ((x & ((1 << xbits) - 1)) * bpp)) & mask
            else:
                idx = int(greens[y, x])
            out[y, x] = pal[idx] if idx < len(pal) else 0
    return out


def decode_vp8l(payload: bytes) -> np.ndarray | None:
    """Decode a raw VP8L payload (after the RIFF chunk header) to an
    RGBA uint8 array [h, w, 4], or None if malformed."""
    try:
        if not payload or payload[0] != 0x2F:
            return None
        br = _BitReader(payload, 1)
        width = br.bits(14) + 1
        height = br.bits(14) + 1
        br.bits(1)  # alpha hint
        if br.bits(3) != 0:  # version must be 0
            return None
        img, transforms = _decode_image_data(br, width, height, True)
        for ttype, p1, p2, xsize_before in reversed(transforms):
            if ttype == 0:
                img = _inverse_predictor(img, p1, p2)
            elif ttype == 1:
                img = _inverse_color_transform(img, p1, p2)
            elif ttype == 2:
                img = _inverse_subtract_green(img)
            else:
                img = _inverse_color_indexing(img, p1, p2, xsize_before)
        ch = _split_channels(img).astype(np.uint8)
        # ARGB -> RGBA
        return ch[..., [1, 2, 3, 0]]
    except (ValueError, IndexError, struct.error):
        return None


def decode_webp(b: bytes) -> np.ndarray | None:
    """Decode a WebP file.  Lossless (VP8L) decodes natively; lossy (VP8)
    and animation return None (gated).  Walks the RIFF chunk list so
    VP8X-extended containers holding a VP8L chunk decode too."""
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None


# --- encoder ---------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Code lengths for a complete canonical prefix code, length-limited
    to max_len with an exact-Kraft completion pass (sum 2^-l == 1)."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    lengths = [0] * n
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    import heapq

    heap: list[tuple[int, int, tuple]] = []
    for i, s in enumerate(used):
        heapq.heappush(heap, (freqs[s], i, ("leaf", s)))
    tiebreak = len(used)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, tiebreak, ("node", n1, n2)))
        tiebreak += 1
    stack = [(heap[0][2], 0)]
    while stack:
        node, depth = stack.pop()
        if node[0] == "leaf":
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[1], depth + 1))
            stack.append((node[2], depth + 1))
    # length-limit, then restore exact Kraft sum == 2^max_len
    for s in used:
        if lengths[s] > max_len:
            lengths[s] = max_len
    scale = 1 << max_len
    kraft = sum(scale >> lengths[s] for s in used)
    while kraft > scale:  # over-subscribed: lengthen cheapest short codes
        s = min((s for s in used if lengths[s] < max_len), key=lambda s: freqs[s])
        kraft -= scale >> lengths[s]
        lengths[s] += 1
        kraft += scale >> lengths[s]
    if kraft < scale:  # incomplete: shorten the longest codes greedily
        for s in sorted(used, key=lambda s: (-lengths[s], freqs[s])):
            while lengths[s] > 1 and kraft + (scale >> lengths[s]) <= scale:
                kraft += scale >> lengths[s]
                lengths[s] -= 1
            if kraft == scale:
                break
    assert kraft == scale, "incomplete prefix code"
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code header; returns symbol -> (code, length)."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if len(used) <= 2 and all(s < 256 for s in used):
        syms = used if used else [0]
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] >= 2:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) <= 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal: code-length-coded
    # run-length tokenize the lengths array with 16/17/18
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra value, extra bits)
    i = 0
    n = len(lengths)
    prev_nonzero = 8
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                tokens.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                tokens.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                tokens.append((0, 0, 0))
        else:
            tokens.append((ln, 0, 0))
            prev_nonzero = ln
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                tokens.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                tokens.append((ln, 0, 0))
        i += run
    cl_freq = [0] * 19
    for sym, _, _ in tokens:
        cl_freq[sym] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    if sum(1 for ln in cl_lengths if ln) == 1:
        # a single-symbol CL code would be 0-bit on the decoder side;
        # pad with a second 1-bit symbol so both sides agree on widths
        other = 0 if cl_lengths[0] == 0 else 1
        cl_lengths[other] = 1
        only = next(s for s, ln in enumerate(cl_lengths) if ln and s != other)
        cl_lengths[only] = 1
    # number of CL slots to transmit (in _CODE_LENGTH_ORDER positions)
    last = 0
    for i, sym in enumerate(_CODE_LENGTH_ORDER):
        if cl_lengths[sym]:
            last = i
    num_cl = max(4, last + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = canonical_codes(cl_lengths)
    for sym, extra, ebits in tokens:
        code, ln = cl_codes[sym]
        bw.write_code(code, ln)
        if ebits:
            bw.write(extra, ebits)
    return canonical_codes(lengths)


def encode_webp_lossless(
    px: np.ndarray, subtract_green: bool = False, use_lz77: bool = True
) -> bytes:
    """Encode an image losslessly as WebP VP8L.  Accepts [h, w] grayscale,
    [h, w, 3] RGB or [h, w, 4] RGBA uint8."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=-1)
    if px.shape[2] == 3:
        alpha = np.full(px.shape[:2], 255, dtype=np.uint8)
        px = np.concatenate([px, alpha[..., None]], axis=-1)
    h, w = px.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    r = px[..., 0].astype(np.int32)
    g = px[..., 1].astype(np.int32)
    b = px[..., 2].astype(np.int32)
    a = px[..., 3].astype(np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    argb = (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    ).ravel()
    # tokenize: literals + distance-1 runs (run-length LZ77)
    tokens: list[tuple] = []
    n = argb.size
    i = 0
    while i < n:
        if use_lz77 and i > 0 and argb[i] == argb[i - 1]:
            run = 1
            while i + run < n and argb[i + run] == argb[i - 1] and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run))
                i += run
                continue
        v = int(argb[i])
        tokens.append(("lit", (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))
        i += 1
    green_freq = [0] * 280
    red_freq = [0] * 256
    blue_freq = [0] * 256
    alpha_freq = [0] * 256
    dist_freq = [0] * 40
    dist_code_1 = lz77_encode_value(121)[0]  # plain distance 1 -> value 121
    for t in tokens:
        if t[0] == "lit":
            alpha_freq[t[1]] += 1
            red_freq[t[2]] += 1
            green_freq[t[3]] += 1
            blue_freq[t[4]] += 1
        else:
            lcode = lz77_encode_value(t[1])[0]
            green_freq[256 + lcode] += 1
            dist_freq[dist_code_1] += 1
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((px[..., 3] != 255).any())), 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no meta prefix codes
    bw.write(0, 1)  # no color cache
    gc = _write_prefix_code(bw, _huffman_lengths(green_freq, 15))
    rc = _write_prefix_code(bw, _huffman_lengths(red_freq, 15))
    bc = _write_prefix_code(bw, _huffman_lengths(blue_freq, 15))
    ac = _write_prefix_code(bw, _huffman_lengths(alpha_freq, 15))
    dc = _write_prefix_code(bw, _huffman_lengths(dist_freq, 15))
    for t in tokens:
        if t[0] == "lit":
            bw.write_code(*gc[t[3]])
            bw.write_code(*rc[t[2]])
            bw.write_code(*bc[t[4]])
            bw.write_code(*ac[t[1]])
        else:
            lcode, lextra, lebits = lz77_encode_value(t[1])
            bw.write_code(*gc[256 + lcode])
            if lebits:
                bw.write(lextra, lebits)
            dcode, dextra, debits = lz77_encode_value(121)
            bw.write_code(*dc[dcode])
            if debits:
                bw.write(dextra, debits)
    payload = b"\x2f" + bw.flush()
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
