"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11 X5).

Convention: multimodal payloads are opaque ``binary`` columns travelling
next to typed metadata columns (modality, byte size, content digest,
format header). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row
objects. Decode is REAL for the library-free formats — uncompressed BMP,
binary PPM/PGM, and integer-PCM WAV are parsed with pure struct+numpy
(`decode_features`) — PLUS compressed PNG, decoded natively with stdlib
zlib + numpy (`_parse_png_pixels`: chunk walk, DEFLATE inflate, the five
scanline filters inverted) and compressed GIF, decoded with a
pure-Python LZW + palette parser (`_parse_gif_pixels`), baseline +
progressive JPEG via the native codec (`operators/jpeg.py`) and
lossless WebP via the native VP8L codec (`operators/webp.py`). Only
lossy-VP8 WebP remains gated behind a PIL import;
`extract_image_features` remains the deterministic fake featurizer for
pipeline tests that want format-independent output.

Scale notes: payloads skew partition sizes — repartition by a digest
prefix before decode so one executor doesn't get all the large blobs;
keep ``spark.sql.files.maxPartitionBytes`` small for blob-heavy scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal-shaped table: the UTF-8
    payload plays the opaque blob; metadata columns are first-class."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("header_hex"),
        F.md5(payload).alias("payload_md5"),
    )


def extract_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched fake 'decode': byte stats + header-derived fake
    dimensions per payload. Replace `_decode_batch`'s body with a real
    codec (PIL/libvips) when available — the Spark-side plumbing
    (mapInPandas, schema, batch shape) is identical either way."""

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    # deterministic fake dimensions from the first bytes —
                    # stands in for a real header parse
                    "width": payloads.map(
                        lambda b: int(b[0]) % 64 + 1 if len(b) else 0
                    ).astype("int32"),
                    "height": payloads.map(
                        lambda b: int(b[1]) % 64 + 1 if len(b) > 1 else 0
                    ).astype("int32"),
                }
            )
            yield out

    return df.select("doc_id", payload_col).mapInPandas(
        _decode_batch, schema=FEATURE_SCHEMA
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_val", T.DoubleType()),
        T.StructField("std_val", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _decode_bmp(b: bytes):
    """Uncompressed BI_RGB 24/32-bit BMP — pure struct/numpy parse
    (BITMAPINFOHEADER; rows bottom-up, 4-byte padded)."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    off, hsize = struct.unpack_from("<II", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    (comp,) = struct.unpack_from("<I", b, 30)
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    nch = bpp // 8
    height = abs(h)
    stride = (w * nch + 3) & ~3
    need = off + stride * height
    if len(b) < need:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=off)
    px = rows.reshape(height, stride)[:, : w * nch].astype(np.float64)
    if h > 0:
        # positive height = rows stored bottom-up; flip to top-down. Pure
        # orientation hygiene HERE (this function only emits mean/std,
        # which are row-order-invariant) — kept so the two BMP decoders
        # stay line-for-line consistent with _parse_bmp_pixels, where the
        # flip IS observable (resize row picks; pytest-pinned there).
        px = px[::-1]
    return ("bmp", w, height, nch, None, None, float(px.mean()), float(px.std()))


def _decode_ppm(b: bytes):
    """Binary PPM (P6) / PGM (P5) — ASCII header + raw samples."""
    import numpy as np

    if len(b) < 2 or b[:2] not in (b"P5", b"P6"):
        return None
    nch = 3 if b[:2] == b"P6" else 1
    # header: magic, width, height, maxval separated by whitespace/comments
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(b[start:pos])
    if len(fields) < 3:
        return None
    w, h, maxval = (int(f) for f in fields)
    pos += 1  # single whitespace after maxval
    if maxval > 255 or w <= 0 or h <= 0 or len(b) < pos + w * h * nch:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * nch, offset=pos).astype(
        np.float64
    )
    return ("ppm" if nch == 3 else "pgm", w, h, nch, None, None,
            float(px.mean()), float(px.std()))


def _parse_wav(b: bytes):
    """RIFF/WAVE with 8/16-bit integer PCM — pure struct/numpy parse.

    Returns ``(rate, nch, x, bits)`` where ``x`` is the interleaved
    sample stream as float64 (16-bit: raw counts; 8-bit: centered at 0
    by subtracting 128), or None if the payload is not integer-PCM WAV.
    Shared by :func:`_decode_wav` (summary stats) and
    `operators/audio.py` (spectral analysis).
    """
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, csize = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or nch == 0 or bits not in (8, 16):
        return None
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.float64)
    else:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    return rate, nch, x, bits


def _decode_wav(b: bytes):
    """WAV summary stats row for :func:`decode_features`."""
    parsed = _parse_wav(b)
    if parsed is None:
        return None
    rate, nch, x, _bits = parsed
    n = len(x) // nch
    return ("wav", None, None, nch, rate, n, float(x.mean()) if n else 0.0,
            float(x.std()) if n else 0.0)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png_pixels(b: bytes):
    """(width, height, channels, HxWxC uint8 array) for non-interlaced
    8-bit-depth PNGs (grayscale / RGB / palette / gray+alpha / RGBA), or
    None. Pure stdlib-zlib + numpy — PNG is DEFLATE-compressed filtered
    scanlines, so no codec library is needed: walk the chunk stream
    (IHDR / PLTE / IDAT / IEND), inflate the concatenated IDAT payload,
    and invert the five per-row filters (None/Sub/Up/Average/Paeth).
    Sub inverts as a per-channel cumsum mod 256 (vectorized); Average and
    Paeth carry a genuine per-byte data dependency and run sequentially.
    Interlaced (Adam7) and 16-bit images return None (PIL fallback)."""
    import struct
    import zlib

    import numpy as np

    if len(b) < 8 + 25 or b[:8] != _PNG_SIG:
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (clen,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if (depth != 8 or comp != 0 or filt != 0 or interlace != 0
            or color not in _PNG_CHANNELS or w == 0 or h == 0):
        return None
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    try:
        inflated = zlib.decompress(b"".join(idat))
    except zlib.error:  # corrupt DEFLATE stream -> undecodable, not an error
        return None
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if len(raw) < h * (stride + 1):
        return None
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        row = rows[y, 1:].astype(np.int32)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-nch] -> cumsum mod 256
            rec = (np.cumsum(row.reshape(w, nch), axis=0) & 0xFF).reshape(stride)
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average
            rec = row
            for i in range(stride):
                left = rec[i - nch] if i >= nch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = row
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                up = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    if color == 3:  # palette-indexed: map through PLTE to RGB
        if plte is None or len(plte) % 3:
            return None
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(table):
            return None
        return w, h, 3, table[idx]
    return w, h, nch, out.reshape(h, w, nch)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _encode_png(px) -> bytes:
    """Encode an HxW (grayscale) or HxWxC (C in 1/2/3/4) uint8 array as a
    non-interlaced 8-bit PNG — stdlib zlib DEFLATE, filter 0 rows."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = px.reshape(h, w * nch)
    scan = np.zeros((h, w * nch + 1), dtype=np.uint8)
    scan[:, 1:] = flat
    idat = zlib.compress(scan.tobytes(), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def _decode_png(b: bytes):
    import numpy as np

    parsed = _parse_png_pixels(b)
    if parsed is None:
        return None
    w, h, nch, px = parsed
    x = px.astype(np.float64)
    return ("png", w, h, nch, None, None, float(x.mean()), float(x.std()))


def _decode_jpeg(b: bytes):
    """Baseline JPEG via the native pure-Python codec (operators/jpeg.py)."""
    if len(b) < 2 or b[:2] != b"\xff\xd8":
        return None
    import numpy as np

    from .jpeg import decode_jpeg

    px = decode_jpeg(b)
    if px is None:
        return None
    x = px.astype(np.float64)
    h, w, nch = px.shape
    return ("jpeg", w, h, nch, None, None, float(x.mean()), float(x.std()))


def _decode_webp(b: bytes):
    """WebP lossless (VP8L) via the native pure-Python codec
    (operators/webp.py); lossy VP8 returns None here and falls through
    to the PIL gate below."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    import numpy as np

    from .webp import decode_webp

    px = decode_webp(bytes(b))
    if px is None:
        return None
    nch = 4 if (px[..., 3] != 255).any() else 3
    x = px[..., :nch].astype(np.float64)
    h, w = px.shape[:2]
    return ("webp", w, h, nch, None, None, float(x.mean()), float(x.std()))


def _decode_any(b: bytes):
    """Dispatch on magic bytes; pure-numpy for uncompressed formats,
    stdlib zlib+numpy for PNG, pure-Python LZW for GIF, pure-Python
    Huffman+IDCT for baseline AND progressive (SOF2) JPEG, and a
    pure-Python VP8L decoder for lossless WebP; PIL (if installed) for
    the remaining compressed formats (lossy VP8 WebP), else None."""
    for dec in (_decode_bmp, _decode_ppm, _decode_wav, _decode_png,
                _decode_gif, _decode_jpeg, _decode_webp):
        try:
            got = dec(b)
        except Exception:
            # a payload matching the magic bytes but with a malformed body
            # (e.g. non-numeric PPM header tokens) must yield a NULL row,
            # not fail the whole mapInPandas task — decode_features'
            # documented contract for unrecognized payloads
            got = None
        if got is not None:
            return got
    try:  # compressed images need a codec library — gate, don't require
        import io

        import numpy as np
        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(bytes(b)))
        arr = np.asarray(img, dtype=np.float64)
        nch = 1 if arr.ndim == 2 else arr.shape[2]
        return (
            (img.format or "img").lower(), img.width, img.height, nch,
            None, None, float(arr.mean()), float(arr.std()),
        )
    except Exception:
        return None


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL multimodal decode over opaque binary payloads: BMP / PPM / PGM
    / WAV-PCM are parsed with pure struct+numpy and PNG with stdlib
    zlib+numpy (no codec library needed); the remaining compressed image
    formats go through PIL when installed; unrecognized payloads
    yield a (doc_id, format=NULL, ..., n_bytes) row rather than failing
    the batch. Arrow-batched mapInPandas — payload bytes stay in columnar
    buffers, one Python call per batch, not per blob."""
    import numpy as np

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(raw) if raw is not None else b""
                got = _decode_any(b)
                if got is None:
                    rows.append((doc_id, None, None, None, None, None, None,
                                 None, None, len(b)))
                else:
                    fmt, w, h, nch, rate, ns, mean, std = got
                    rows.append((doc_id, fmt, w, h, nch, rate, ns, mean, std,
                                 len(b)))
            # object dtype end-to-end: None stays a NULL through Arrow
            # (a float64 column would smuggle NaN instead)
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA], dtype=object
            )

    return df.select("doc_id", payload_col).mapInPandas(
        _batch, schema=DECODE_SCHEMA
    )


PX_CONTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_sq_sum", T.LongType()),
        T.StructField("roundtrip_fixpoint", T.BooleanType()),
    ]
)


def decode_pixel_contract(
    df: DataFrame,
    codec: str,
    payload_col: str = "payload",
    extra_key: str | None = None,
) -> DataFrame:
    """Validation-contract decode (r8): run the REAL native parser over
    each payload and emit facts an oracle can check independently —
    integer pixel sums (exact, order-invariant, and recomputable by
    DuckDB from the planted source bytes without any codec) plus an
    encode→decode fixpoint boolean (re-encode the decoded array, decode
    again, require pixel-exact equality). A parse failure emits NULLs,
    which the oracle comparison turns red — so the codec path itself is
    driver-certifiable, the same idiom as the sketch validation
    contracts. Arrow-batched mapInPandas; no shuffle."""
    import numpy as np

    parse = {
        "png": _parse_png_pixels,
        "bmp": _parse_bmp_pixels,
        "jpeg": _parse_jpeg_pixels,
    }[codec]
    encode = {
        "png": _encode_png,
        "bmp": _encode_bmp,
        # quality 100 scales every Annex-K quant entry to 1, and on the
        # flat-block planted images the DCT round trip is pixel-EXACT
        # (pytest-pinned over all 256 gray levels) — which is what makes
        # a LOSSY codec admissible under the fixpoint contract
        "jpeg": _encode_jpeg_q100,
    }[codec]
    keys = ["doc_id"] + ([extra_key] if extra_key else [])
    schema = T.StructType(
        ([T.StructField(extra_key, T.IntegerType())] if extra_key else [])
        + list(PX_CONTRACT_SCHEMA)
    )
    colnames = [f.name for f in schema]

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            extras = pdf[extra_key] if extra_key else [None] * len(pdf)
            for doc_id, ex, raw in zip(pdf["doc_id"], extras, pdf[payload_col]):
                b = bytes(raw) if raw is not None else b""
                got = parse(b)
                if got is None:
                    row = (doc_id, None, None, None, None, None, None, None)
                else:
                    w, h, nch, px = got
                    flat = np.asarray(px, dtype=np.int64)
                    s = int(flat.sum())
                    sq = int((flat * flat).sum())
                    again = parse(encode(np.asarray(px, dtype=np.uint8)))
                    fix = again is not None and np.array_equal(
                        np.asarray(again[3]), np.asarray(px)
                    )
                    row = (doc_id, codec, w, h, nch, s, sq, bool(fix))
                rows.append(((ex,) if extra_key else ()) + (row[0],) + row[1:])
            yield pd.DataFrame(rows, columns=colnames, dtype=object)

    return df.select(*keys, payload_col).mapInPandas(_batch, schema=schema)


def _parse_jpeg_pixels(b: bytes):
    """(width, height, channels, HxWxC uint8 array) via the native JPEG
    decoder (operators/jpeg.py), or None."""
    from .jpeg import decode_jpeg

    px = decode_jpeg(b)
    if px is None:
        return None
    h, w, nch = px.shape
    return w, h, nch, px


def _encode_jpeg_q100(px) -> bytes:
    from .jpeg import encode_jpeg

    return encode_jpeg(px, quality=100)


def synthesize_block_jpeg_payloads(
    docs: DataFrame, n_frames: int | None = None
) -> DataFrame:
    """Deterministic 16×16 quality-100 baseline JPEGs whose four 8×8
    blocks carry the exactly-representable content class: gray level
    base_b (byte b mod n of the document's UTF-8 bytes) plus, for still
    images, an AC ripple a_b·s_x along the block rows, where
    s = (+1,−1,−1,+1,+1,−1,−1,+1) is the scaled u=4 DCT-II basis
    (√2·cos((2x+1)π/4)) and a_b = min(byte_{b+4} mod 8, base_b,
    255−base_b) keeps pixels in range. The 8×8 DCT of such a block has
    EXACTLY two nonzero coefficients — DC = 8·(base−128) and
    C(u=4,v=0) = 8·a, both integers — so at quality 100 (every Annex-K
    quantizer scales to 1) the LOSSY pipeline is still pixel-exact
    (pinned over all 256 base levels × in-range amplitudes in
    tests/test_llm_ops.py) while now driving the AC Huffman path —
    run-length (run,size) codes, zigzag ordering, nonzero-AC dequant —
    under the oracle, not just the DC path (r10, per r9 ADVICE). The
    pixel SUM is amplitude-blind (Σ s_x = 0) but the SQUARED sum sees it
    (Σ s_x² = 8 per row ⇒ per block-channel Σp² = 64(base² + a²)), so a
    decoder that drops or mis-scales the AC reddens px_sq_sum/px_std.
    Four different blocks exercise the DC-difference Huffman path too.

    With n_frames set, builds instead a length-prefixed MJPEG container
    of n_frames FLAT-block JPEGs where frame k's block values are
    (byte_b + 7k) mod 256 — visible motion, still closed-form (the video
    contract keeps the flat class; its oracle keys on per-frame sums)."""
    import numpy as np

    from .jpeg import encode_jpeg

    _S = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)

    def _one(src: np.ndarray, shift: int, ac: bool) -> bytes:
        v = [(int(src[b % len(src)]) + shift) % 256 for b in range(4)]
        px = np.zeros((16, 16, 3), np.int64)
        corners = ((0, 0), (0, 8), (8, 0), (8, 8))
        for b, (r, c) in enumerate(corners):
            a = min(int(src[(b + 4) % len(src)]) % 8, v[b], 255 - v[b]) if ac else 0
            block = v[b] + a * _S  # varies along rows, constant along cols
            px[r : r + 8, c : c + 8] = block[:, None, None]
        return encode_jpeg(px.astype(np.uint8), quality=100)

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                src = np.frombuffer(
                    (text or " ").encode("utf-8"), dtype=np.uint8
                )
                if n_frames is None:
                    payloads.append(_one(src, 0, ac=True))
                else:
                    payloads.append(
                        pack_frame_sequence(
                            [_one(src, 7 * k, ac=False) for k in range(n_frames)]
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def synthesize_bmp_payloads(docs: DataFrame) -> DataFrame:
    """Deterministically build REAL 8×8 24-bit BMP bytes per document
    (pixels = repeating UTF-8 text bytes) — gives the decode path genuine
    format bytes to parse without shipping binary fixtures."""
    import numpy as np

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        w = h = 8
        stride = (w * 3 + 3) & ~3
        header = b"BM" + struct.pack(
            "<IHHI", 54 + stride * h, 0, 0, 54
        ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835,
                        2835, 0, 0)
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                src = np.frombuffer(
                    (text or " ").encode("utf-8"), dtype=np.uint8
                )
                px = np.resize(src, stride * h)
                payloads.append(header + px.tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def synthesize_png_payloads(docs: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Deterministically build REAL compressed RGB PNG bytes per document
    (pixels = repeating UTF-8 text bytes, DEFLATE-compressed scanlines) —
    exercises the native zlib decode path on genuine format bytes without
    shipping binary fixtures."""
    import numpy as np

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                src = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
                px = np.resize(src, h * w * 3).reshape(h, w, 3)
                payloads.append(_encode_png(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def synthesize_jpeg_payloads(
    docs: DataFrame, w: int = 16, h: int = 16, quality: int = 92
) -> DataFrame:
    """Deterministically build REAL baseline JPEG bytes per document
    (pixels = repeating UTF-8 text bytes, DCT+Huffman entropy-coded by
    the native encoder) — exercises the pure-Python JPEG decode path on
    genuine lossy-compressed format bytes without shipping fixtures."""
    import numpy as np

    from .jpeg import encode_jpeg

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                src = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
                px = np.resize(src, h * w * 3).reshape(h, w, 3)
                payloads.append(encode_jpeg(px, quality=quality))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


# --- resize + frame sampling -------------------------------------------------


def _parse_bmp_pixels(b: bytes):
    """(width, height, channels, HxWxC uint8 array) for uncompressed
    BI_RGB 24/32-bit BMPs, or None."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    (off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    _, bpp = struct.unpack_from("<HH", b, 26)
    (comp,) = struct.unpack_from("<I", b, 30)
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    nch = bpp // 8
    height = abs(h)
    stride = (w * nch + 3) & ~3
    if len(b) < off + stride * height:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=off)
    px = rows.reshape(height, stride)[:, : w * nch].reshape(height, w, nch)
    if h > 0:  # positive height = rows stored bottom-up (spec); flip so
        px = px[::-1]  # row 0 is the TOP image row. Negative h = top-down.
    return w, height, nch, px


def _encode_bmp(px) -> bytes:
    """Re-encode an HxWxC uint8 array (C=3, row 0 = top image row) as a
    24-bit BI_RGB BMP — positive height, so file rows are written
    bottom-up per the spec (mirrors the decoder's flip)."""
    import struct

    import numpy as np

    h, w, nch = px.shape
    stride = (w * nch + 3) & ~3
    header = b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8 * nch, 0, stride * h, 2835, 2835, 0, 0
    )
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * nch] = px.reshape(h, w * nch)[::-1]
    return header + padded.tobytes()


def resize_bmp(b: bytes, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resize of a real BMP or PNG payload — pure numpy
    index sampling (the canonical GPU-free decode→resize preprocessing
    step), re-encoded in the source format."""
    import numpy as np

    is_png = b[:8] == _PNG_SIG
    try:
        parsed = _parse_png_pixels(b) if is_png else _parse_bmp_pixels(b)
    except Exception:
        parsed = None
    if parsed is None:
        return None
    w, h, nch, px = parsed
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    out = px[ys][:, xs]
    return _encode_png(out) if is_png else _encode_bmp(out)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched decode→nearest-neighbor-resize→re-encode over BMP or
    PNG payloads; undecodable payloads yield NULL (kept, so the caller
    sees the failure rate rather than silently losing rows)."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                resize_bmp(bytes(b), out_w, out_h) if b is not None else None
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return df.select("doc_id", payload_col).mapInPandas(
        _batch, schema="doc_id long, payload binary"
    )


# frame-sequence container: b"FSEQ" + u32 frame count + per frame
# (u32 byte length + payload). Length-prefixed so sampling SEEKS past
# unsampled frames without decoding them.
_FSEQ_MAGIC = b"FSEQ"


def pack_frame_sequence(frames: "list[bytes]") -> bytes:
    import struct

    out = [_FSEQ_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def sample_frames(
    df: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling over a length-prefixed frame-sequence blob (the
    video stand-in this container supports without codec libraries —
    with PyAV/decord installed, swap the parser for a real demuxer; the
    Spark-side shape is identical): emit every k-th frame as its own
    (doc_id, frame_idx, payload) row. The length prefixes let the parser
    SEEK past unsampled frames — no decode work on dropped frames,
    exactly like keyframe-seek sampling in a real demuxer."""
    import struct

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, outs = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(raw) if raw is not None else b""
                if len(b) < 8 or b[:4] != _FSEQ_MAGIC:
                    continue
                (n,) = struct.unpack_from("<I", b, 4)
                pos = 8
                for i in range(n):
                    if pos + 4 > len(b):
                        break
                    (flen,) = struct.unpack_from("<I", b, pos)
                    if i % every_k == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        outs.append(b[pos + 4 : pos + 4 + flen])
                    pos += 4 + flen
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": outs},
                dtype=object,
            )

    return df.select("doc_id", payload_col).mapInPandas(
        _batch, schema="doc_id long, frame_idx int, payload binary"
    )


def synthesize_mjpeg_payloads(
    docs: DataFrame, n_frames: int = 8, w: int = 16, h: int = 16
) -> DataFrame:
    """Deterministic MJPEG-style 'video' per document: a length-prefixed
    frame sequence whose frames are REAL baseline JPEGs (each frame's
    pixels derive from the doc text and the frame index, so motion is
    visible across frames)."""
    import numpy as np

    from .jpeg import encode_jpeg

    def _make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                src = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
                frames = []
                for k in range(n_frames):
                    px = (
                        np.resize(src, h * w * 3).reshape(h, w, 3).astype(np.int32)
                        + 7 * k
                    ) % 256
                    frames.append(encode_jpeg(px.astype(np.uint8), quality=92))
                payloads.append(pack_frame_sequence(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


VIDEO_SCHEMA = (
    "doc_id long, frame_idx int, format string, width int, height int, "
    "channels int, mean_val double, std_val double, n_bytes long"
)


def video_features(
    df: DataFrame, every_k: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """The real video-pipeline access pattern over an MJPEG-style frame
    sequence: SEEK past unsampled frames via the length prefixes (zero
    decode work on dropped frames), then decode ONLY the sampled frames
    with the native JPEG codec — per sampled frame: dimensions, channels,
    pixel mean/std. The expensive step runs on 1/every_k of the payload
    bytes by construction; undecodable frames yield NULL-feature rows."""
    sampled = sample_frames(df, every_k=every_k, payload_col=payload_col)

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, idx, raw in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["payload"]
            ):
                b = bytes(raw) if raw is not None else b""
                got = _decode_any(b)
                if got is None:
                    rows.append((doc_id, idx, None, None, None, None, None,
                                 None, len(b)))
                else:
                    fmt, w, h, nch, _rate, _ns, mean, std = got
                    rows.append((doc_id, idx, fmt, w, h, nch, mean, std,
                                 len(b)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "format", "width", "height",
                         "channels", "mean_val", "std_val", "n_bytes"],
                dtype=object,
            )

    return sampled.mapInPandas(_batch, schema=VIDEO_SCHEMA)


# --- GIF (LZW) ---------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/EOI codes,
    dictionary grows to 12 bits). Returns a list of palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None  # corrupt stream
            out.extend(entry)
            if len(out) > max_pixels:
                return out[:max_pixels]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _parse_gif_pixels(b: bytes):
    """(width, height, 3, HxWx3 uint8 array) for the FIRST frame of a
    GIF87a/GIF89a payload — pure-Python LZW + palette mapping, no codec
    library. Interlaced frames are deinterlaced; frames without any color
    table return None."""
    import struct

    import numpy as np

    if len(b) < 13 or b[:6] not in _GIF_SIGS:
        return None
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            return None
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 11 > len(b):
                return None
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(b):
                    return None
                table = np.frombuffer(
                    b, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None or w == 0 or h == 0 or pos >= len(b):
                return None
            min_code = b[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            chunks = []
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunks.append(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if idx is None or len(idx) < w * h:
                return None
            arr = np.asarray(idx[: w * h], dtype=np.uint16).reshape(h, w)
            if ipacked & 0x40:  # Adam-style 4-pass interlace
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                de = np.empty_like(arr)
                de[np.asarray(order)] = arr
                arr = de
            if int(arr.max(initial=0)) >= len(table):
                return None
            return w, h, 3, table[arr]
        elif block == 0x3B:  # trailer
            return None
        else:
            return None
    return None


def _encode_gif(px) -> bytes:
    """Encode an HxWx3 uint8 array as a single-frame GIF using the
    classic 'uncompressed LZW' trick: every pixel index is emitted as its
    own code with a CLEAR before the dictionary could force a width
    change — valid LZW, zero compression. The palette is built from the
    distinct colors (≤256 required)."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF encoder supports <= 256 distinct colors")
    depth = max(2, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    clear = 1 << depth
    eoi = clear + 1
    code_size = depth + 1
    bits: list[int] = []

    def emit(code: int) -> None:
        for i in range(code_size):
            bits.append((code >> i) & 1)

    emit(clear)
    for i, code in enumerate(inverse):
        emit(int(code))
        if (i + 1) % (clear - 2 or 1) == 0:
            emit(clear)  # keep the dictionary from growing past code_size
    emit(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        data.append(sum(bit << j for j, bit in enumerate(bits[i : i + 8])))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(depth)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def _decode_gif(b: bytes):
    import numpy as np

    parsed = _parse_gif_pixels(b)
    if parsed is None:
        return None
    w, h, nch, px = parsed
    x = px.astype(np.float64)
    return ("gif", w, h, nch, None, None, float(x.mean()), float(x.std()))
