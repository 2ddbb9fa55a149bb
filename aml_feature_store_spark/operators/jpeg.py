"""Baseline JPEG codec in pure Python + numpy (X5 compressed decode).

Closes the last codec-library gate in the multimodal family: BMP/PPM/WAV
(struct+numpy), PNG (stdlib zlib), GIF (pure-Python LZW) already decode
natively; this module adds ITU-T T.81 baseline sequential JPEG with the
public Annex-K quantization and Huffman tables.

Encoder: RGB/grayscale → JFIF YCbCr → 8×8 orthonormal DCT (one numpy
matmul pair per block batch) → IJG quality-scaled Annex-K quantization →
zigzag → DC-difference + AC run-length → Annex-K Huffman, 0xFF byte
stuffing; 4:4:4 (no subsampling), so every pixel survives at the chosen
quality. Decoder: full marker walk (DQT/DHT/SOF0/SOS/DRI), canonical
Huffman reconstruction from BITS/HUFFVAL, interleaved MCU scan with
arbitrary 1-2× sampling factors (4:4:4, 4:2:2 and 4:2:0 streams all
decode), restart-marker DC-predictor resets, dequant → inverse zigzag →
IDCT → YCbCr→RGB. Progressive (SOF2) streams decode natively too —
spectral-selection bands, successive approximation (DC/AC first and
refinement scans, EOB runs, buffered correction bits, T.81 Annex G) —
and a progressive encoder with a full SA scan script exists for
round-trip pinning. Arithmetic/lossless/hierarchical/12-bit streams
return None (honestly gated, same contract as the other decoders).

Correctness is pinned three ways in tests/test_jpeg.py: (1) the DCT /
Huffman / bit-stuffing layers round-trip bit-exactly in isolation,
(2) encode→decode round trips bound pixel error by the quantization
step, and (3) a grayscale JPEG hand-assembled in the test from the
T.81 spec (markers and Huffman codes written out by hand, not via this
encoder) decodes to the exact expected block — so decoder and encoder
cannot share a compensating bug.

Scale shape: like the PNG/GIF codecs this runs inside Arrow-batched
`mapInPandas` kernels (`operators/multimodal.py:decode_features`), one
Python call per payload, no shuffle — codec throughput scales with
partition count, which is the only axis that matters at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K.1 quantization tables (luminance / chrominance) ---------------

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order: ZIGZAG[i] = raster index of the i-th zigzag element
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# --- Annex K.3 Huffman tables: (BITS[1..16], HUFFVAL) ----------------------

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward F = C @ B @ C.T
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 (canonical assignment)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in canonical_codes(bits, vals).items()
    }


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs FF00, stops at markers
    (exposing RSTn so the MCU loop can reset DC predictors)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        if self.pos >= len(self.data) - 1:
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller handles
                return False
            else:
                return False  # EOI or other marker
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def take(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # pad with 1-bits past the segment end (final-byte padding)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2  # FF Dn

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.take(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude bits to a signed
    coefficient value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - ((1 << size) - 1)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JFIF encode of an (h, w[, 3]) uint8 array, 4:4:4."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(QT_LUM, quality)
    qc = _quality_scale(QT_CHROM, quality)

    ph, pw = -h % 8, -w % 8  # edge-replicate to block multiples
    if gray:
        planes = [np.pad(px.astype(np.float64), ((0, ph), (0, pw)), mode="edge")]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        padded = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        planes = [padded[..., i] for i in range(3)]

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for tq, tbl in [(0, qy)] + ([(1, qc)] if not gray else []):
        body = bytes([tq]) + bytes(int(tbl[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht_segment(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += _dht_segment(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_lum = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chrom = canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chrom = canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    writer = _BitWriter()
    preds = [0] * ncomp
    # interleaved 4:4:4 MCU = one block per component, raster order
    for by in range(0, planes[0].shape[0], 8):
        for bx in range(0, planes[0].shape[1], 8):
            for ci in range(ncomp):
                q = (qy if ci == 0 else qc).reshape(8, 8).astype(np.float64)
                block = planes[ci][by : by + 8, bx : bx + 8] - 128.0
                coef = _C @ block @ _C.T
                zz = (
                    np.round(coef / q).astype(np.int64).reshape(64)[ZIGZAG]
                )
                dcc, acc_ = (dc_lum, ac_lum) if ci == 0 else (dc_chrom, ac_chrom)
                preds[ci] = _write_block(zz, dcc, acc_, writer, preds[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_block(zz, dc_codes, ac_codes, writer: _BitWriter, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            writer.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        writer.write(c, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        writer.write(c, ln)
    return dc


# --- decoder ----------------------------------------------------------------


MAX_PIXELS = 1 << 26  # 64M px decode guard — a corrupted SOF header must
# not trigger a multi-GB allocation inside a mapInPandas task


def decode_jpeg(b: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG; returns
    an (h, w, ncomp) uint8 array or None if the payload is arithmetic/
    lossless/hierarchical/12-bit (or its declared dimensions exceed
    MAX_PIXELS)."""
    try:
        return _decode_jpeg_strict(bytes(b))
    except Exception:
        return None


def _decode_jpeg_strict(b: bytes):
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    store = None  # progressive: per-component zigzag coefficient arrays
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", b, pos + 2)[0]
        body = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = vals
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                return None
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {
                "h": height,
                "w": width,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = {}
            order = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0xF)
                order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(
                    b, pos + 2 + seg_len, frame, scan, qtables, htables,
                    restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if store is None:
                store = _prog_alloc(frame)
                if store is None:
                    return None
            pos = _decode_prog_scan(
                b, pos + 2 + seg_len, frame, store, order, scan,
                ss, se, ahal >> 4, ahal & 0xF, htables, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive") and store is not None:
        return _prog_reconstruct(frame, store, qtables)
    return None


def _decode_scan(b, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if mcux * mcuy * 64 * hmax * vmax > MAX_PIXELS:
        return None
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64) for c in comps
    ]
    reader = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                # byte-align and consume the RSTn marker
                reader.nbits = 0
                reader.acc = 0
                while reader.data[reader.pos] != 0xFF or not (
                    0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 1
                reader.skip_restart()
                preds = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tbl, ac_tbl = htables[(0, td)], htables[(1, ta)]
                q = qtables[c["tq"]].reshape(8, 8).astype(np.float64)
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = reader.huff(dc_tbl)
                        diff = _extend(reader.take(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.take(s), s)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * q.reshape(64)[ZIGZAG]
                        block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[..., None]
    if len(out_planes) == 3:
        return _ycbcr_to_rgb(*out_planes)
    return None


# --- progressive (SOF2) decoding -------------------------------------------
# T.81 Annex G: DC/AC spectral-selection scans with successive
# approximation. Coefficients accumulate across scans in per-component
# zigzag-order arrays; dequant + IDCT happen once at EOI.


def _prog_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _prog_alloc(frame):
    geo = _prog_geometry(frame)
    if geo is None:
        return None
    hmax, vmax, mcux, mcuy = geo
    if mcux * mcuy * 64 * hmax * vmax > MAX_PIXELS:
        return None
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _noninterleaved_blocks(frame, c, hmax, vmax):
    """Block grid of one component in a non-interleaved scan
    (T.81 A.1.1: component dims are ceil(w·h_i/hmax) × ceil(h·v_i/vmax),
    then ceil-divided into 8×8 blocks)."""
    cw = -(-(frame["w"] * c["h"]) // hmax)
    ch = -(-(frame["h"] * c["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _refine_nonzero(reader, coef, k, p1):
    """Apply one correction bit to an already-nonzero coefficient
    (T.81 G.1.2.3: magnitude grows by p1 only if the bit is 1 and the
    p1 bit is not already set)."""
    if reader.take(1) and (int(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else -p1


def _decode_ac_refine(reader, ac_tbl, coef, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block; returns the
    updated EOB run. Follows T.81 G.1.2.3 exactly: newly-significant
    coefficients arrive as (run, 1) symbols with a sign bit; every
    already-nonzero coefficient passed over consumes a correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.take(r)
                    break
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                newval = p1 if reader.take(1) else -p1
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(reader, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(reader, coef, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    b, pos, frame, store, order, scan, ss, se, ah, al, htables,
    restart_interval,
):
    """Decode one progressive scan into the coefficient store; returns
    the stream position where the scan's entropy data ended."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _prog_geometry(frame)
    cidx = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(b, pos)
    eobrun = 0
    if ss == 0:  # DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = {cs: 0 for cs in order}
        # restart_interval counts MCUs (interleaved) / blocks (single-comp)
        mcus = []  # each MCU: list of (cs, by, bx)
        if len(order) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for cs in order:
                        c = comps[cidx[cs]]
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                mcu.append(
                                    (cs, my * c["v"] + vy, mx * c["h"] + vx)
                                )
                    mcus.append(mcu)
        else:
            cs = order[0]
            c = comps[cidx[cs]]
            bw, bh = _noninterleaved_blocks(frame, c, hmax, vmax)
            mcus = [
                [(cs, by, bx)] for by in range(bh) for bx in range(bw)
            ]
        count = 0
        for mcu in mcus:
            if restart_interval and count == restart_interval:
                _prog_restart(reader)
                preds = {k: 0 for k in preds}
                count = 0
            for cs, by, bx in mcu:
                coef = store[cidx[cs]][by, bx]
                if ah == 0:
                    dc_tbl = htables[(0, scan[cs][0])]
                    s = reader.huff(dc_tbl)
                    preds[cs] += _extend(reader.take(s), s)
                    coef[0] = preds[cs] << al
                else:
                    coef[0] = int(coef[0]) | (reader.take(1) << al)
            count += 1
        return reader.pos
    # AC scan: always non-interleaved, single component
    if len(order) != 1:
        raise ValueError("AC scan must have one component")
    cs = order[0]
    c = comps[cidx[cs]]
    ci = cidx[cs]
    ac_tbl = htables[(1, scan[cs][1])]
    bw, bh = _noninterleaved_blocks(frame, c, hmax, vmax)
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and count == restart_interval:
                _prog_restart(reader)
                eobrun = 0
                count = 0
            coef = store[ci][by, bx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.huff(ac_tbl)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.take(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index out of band")
                        coef[k] = _extend(reader.take(s), s) << al
                        k += 1
            else:
                eobrun = _decode_ac_refine(
                    reader, ac_tbl, coef, ss, se, al, eobrun
                )
            count += 1
    return reader.pos


def _prog_restart(reader):
    reader.acc = 0
    reader.nbits = 0
    while reader.data[reader.pos] != 0xFF or not (
        0xD0 <= reader.data[reader.pos + 1] <= 0xD7
    ):
        reader.pos += 1
    reader.skip_restart()


def _prog_reconstruct(frame, store, qtables):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks per component) and assemble the image like the
    baseline tail: upsample subsampled planes, crop, color-convert."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]].astype(np.float64)  # natural order
        qzz = q[ZIGZAG]  # zigzag order to match the store
        by, bx, _ = store[ci].shape
        deq = store[ci].astype(np.float64) * qzz[None, None, :]
        nat = np.zeros((by, bx, 64))
        nat[:, :, ZIGZAG] = deq
        blocks = nat.reshape(by, bx, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[..., None]
    if len(out_planes) == 3:
        return _ycbcr_to_rgb(*out_planes)
    return None


# --- progressive (SOF2) encoder --------------------------------------------
# Spectral selection + one level of successive approximation, mirroring
# the decode paths above. Annex-K AC tables lack the EOBn symbols
# progressive scans need, so AC scans use a flat 8/9-bit canonical table
# (all 256 symbols, Kraft sum 0.75, the all-ones code unused as T.81
# requires; a DHT BITS byte caps at 255, hence the two-length split).

AC_FLAT_BITS = [0] * 7 + [128, 128] + [0] * 7
AC_FLAT_VALS = list(range(256))


def _mag_shift(v: int, al: int) -> int:
    """T.81 G.1.2.2 point transform for AC: magnitude shift toward zero,
    sign preserved."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _EobState:
    """EOB-run + buffered-correction-bit bookkeeping shared by the AC
    scan encoders (the dual of the decoder's eobrun handling)."""

    def __init__(self, writer, ac_codes):
        self.writer = writer
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_pending(self):
        for bit in self.pending:
            self.writer.write(bit, 1)
        self.pending = []

    def flush_eob(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[nbits << 4]
            self.writer.write(code, ln)
            if nbits:
                self.writer.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.flush_pending()

    def bump(self):
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _enc_ac_first_block(zz, ss, se, al, state):
    vals = [_mag_shift(int(zz[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        state.bump()
        return
    state.flush_eob()
    w, codes = state.writer, state.ac_codes
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = codes[0xF0]
            w.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = codes[(run << 4) | s]
        w.write(c, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < len(vals) - 1:
        state.bump()


def _enc_ac_refine_block(zz, ss, se, al, state):
    """Dual of _decode_ac_refine (T.81 G.1.2.3): newly-significant
    coefficients emit (run, 1) + sign; already-significant ones emit a
    correction bit. The current block's correction bits (``br``) ride
    immediately behind the next symbol emitted IN this block, while bits
    from whole blocks absorbed into an EOB run (``state.pending``) ride
    behind the EOB-run symbol — two separate buffers, exactly the
    decoder's read order."""
    vals = [int(zz[k]) for k in range(ss, se + 1)]
    absv = [_mag_shift(abs(v), al) for v in vals]
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = i  # index of the last newly-significant coefficient
    w, codes = state.writer, state.ac_codes
    run = 0
    br: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            state.flush_eob()
            c, ln = codes[0xF0]
            w.write(c, ln)
            run -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if a > 1:  # already significant at this level: correction bit
            br.append(a & 1)
            continue
        state.flush_eob()
        c, ln = codes[(run << 4) | 1]
        w.write(c, ln)
        w.write(1 if vals[i] >= 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        state.pending.extend(br)
        state.bump()


def encode_jpeg_progressive(px: np.ndarray, quality: int = 90, al: int = 1) -> bytes:
    """Progressive (SOF2) JFIF encode of an (h, w[, 3]) uint8 array,
    4:4:4: one interleaved DC-first scan at successive-approximation
    level ``al``, per-component AC-first band scans (1-5, 6-63) at
    ``al``, then DC- and AC-refinement scans down to level 0. Decoding
    this stream exercises every progressive decode path; pixels must
    match the baseline encoder's at the same quality (same quantized
    coefficients — pytest-pinned)."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(QT_LUM, quality)
    qc = _quality_scale(QT_CHROM, quality)
    ph, pw = -h % 8, -w % 8
    if gray:
        planes = [np.pad(px.astype(np.float64), ((0, ph), (0, pw)), mode="edge")]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        padded = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        planes = [padded[..., i] for i in range(3)]
    ncomp = len(planes)
    bh, bw = planes[0].shape[0] // 8, planes[0].shape[1] // 8
    zzs = []
    for ci in range(ncomp):
        q = (qy if ci == 0 else qc).reshape(8, 8).astype(np.float64)
        grid = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _C @ block @ _C.T
                grid[by, bx] = np.round(coef / q).astype(np.int64).reshape(64)[ZIGZAG]
        zzs.append(grid)

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for tq, tbl in [(0, qy)] + ([(1, qc)] if not gray else []):
        body = bytes([tq]) + bytes(int(tbl[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
    out += _dht_segment(1, 2, AC_FLAT_BITS, AC_FLAT_VALS)

    dc_codes = [
        canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
        if ci == 0
        else canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
        for ci in range(ncomp)
    ]
    ac_flat = canonical_codes(AC_FLAT_BITS, AC_FLAT_VALS)

    def sos_header(comp_specs, ss, se, ah, al_):
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # scan 1: interleaved DC first at level al
    out += sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, al
    )
    wtr = _BitWriter()
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                v = int(zzs[ci][by, bx, 0]) >> al  # DC: arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                c, ln = dc_codes[ci][s]
                wtr.write(c, ln)
                if s:
                    wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out

    bands = [(1, 5), (6, 63)]
    # AC first scans at level al, per component
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([(ci + 1, 0, 2)], ss, se, 0, al)
            wtr = _BitWriter()
            state = _EobState(wtr, ac_flat)
            for by in range(bh):
                for bx in range(bw):
                    _enc_ac_first_block(zzs[ci][by, bx], ss, se, al, state)
            state.flush_eob()
            wtr.flush()
            out += wtr.out
    # refinement levels al-1 .. 0
    for lvl in range(al - 1, -1, -1):
        out += sos_header(
            [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, lvl + 1, lvl
        )
        wtr = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                for ci in range(ncomp):
                    wtr.write((int(zzs[ci][by, bx, 0]) >> lvl) & 1, 1)
        wtr.flush()
        out += wtr.out
        for ci in range(ncomp):
            for ss, se in bands:
                out += sos_header([(ci + 1, 0, 2)], ss, se, lvl + 1, lvl)
                wtr = _BitWriter()
                state = _EobState(wtr, ac_flat)
                for by in range(bh):
                    for bx in range(bw):
                        _enc_ac_refine_block(zzs[ci][by, bx], ss, se, lvl, state)
                state.flush_eob()
                wtr.flush()
                out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
