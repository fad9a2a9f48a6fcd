"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode tiers:

- PNG payloads decode FOR REAL: a dependency-free pure-Python decoder
  (zlib inflate + scanline unfilter, all five filter types, 8-bit
  gray/RGB/RGBA) feeds true pixel statistics into the feature vector —
  and a matching minimal encoder generates the deterministic fixtures.
- GIF payloads decode FOR REAL too: full LZW (growing code widths up to
  12 bits, CLEAR/EOI, the KwKwK case), global/local color tables,
  interlaced row ordering, extension skipping; the fixture encoder emits
  valid constant-width LZW (the 'uncompressed GIF' technique).
- Other mime types remain STUBBED (no jpeg/audio/video codecs in this
  container): ``decode_image_batch`` raises NotImplementedError unless
  ``deterministic_fake=True``, in which case non-PNG payloads produce a
  seeded fake feature vector derived from the binary's bytes — the
  Spark-side plumbing (schema, Arrow batch shape, partitioning, UDF
  signature) is real and tested end-to-end while those codecs stay
  swappable.

Pattern for production: put a full decoder (PIL/torchvision/ffmpeg)
behind the same `mapInPandas` signature; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (  # matches make_media_table output (pandas ints -> bigint)
    "media_id long, mime string, width long, height long, payload binary"
)

FEATURE_DIM = 16


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal RFC-2083 PNG encoder (8-bit, filter 0, non-interlaced) for
    gray (h,w), RGB (h,w,3) or RGBA (h,w,4) uint8 arrays — the fixture
    generator's real-codec counterpart; output round-trips bit-exactly
    through decode_png (test-enforced)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Pure-Python PNG decode -> uint8 array (h, w, channels).

    Supports 8-bit depth, color types 0/2/4/6, all five scanline filters
    (None/Sub/Up/Average/Paeth per RFC 2083 §6), non-interlaced, with
    per-chunk CRC verification. Palette/16-bit/interlaced images raise —
    they are outside the fixture contract and a production codec's job."""
    data = bytes(data)
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    idat = []
    w = h = color_type = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace}); fixture contract is 8-bit "
                    "gray/RGB/RGBA non-interlaced"
                )
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0          # left
                b = prev[i]                              # up
                if f == 1:  # Sub
                    cur[i] = (line[i] + a) & 0xFF
                elif f == 3:  # Average
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    cc = prev[i - c] if i >= c else 0    # upper-left
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# GIF codec (second REAL decoder: LZW, palettes, interlace)
# ---------------------------------------------------------------------------

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list:
    """GIF-variant LZW decode (LSB-first bit packing, growing code widths
    up to 12 bits, CLEAR/EOI codes, deferred-clear tolerant) -> list of
    palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = eoi + 1
    out = []
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _gif_lzw_encode_uncompressed(indices, min_code_size: int) -> bytes:
    """Valid LZW stream that never grows the code table (the classic
    'uncompressed GIF' technique): every pixel is emitted as a literal at
    constant width min_code_size+1, with a CLEAR code re-issued before
    the decoder's table would force a width increase. Any conforming
    decoder — including _gif_lzw_decode — reproduces the indices exactly."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # decoder's next_code starts at eoi+1 and grows by 1 per literal after
    # the first; re-clearing when run hits this budget keeps next_code
    # strictly below 2^width, so the decoder never widens its codes
    budget = (1 << width) - eoi - 2
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = 0
    for idx in indices:
        if run >= budget:
            emit(clear)
            run = 0
        emit(int(idx))
        run += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a encoder: one frame, global color table, no
    extensions, non-interlaced; ``indices`` (h, w) uint8 into ``palette``
    (n, 3) uint8. Fixture-generator counterpart of decode_gif (bit-exact
    round trip is test-enforced)."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    table_size = 1 << bits
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = palette
    mcs = max(2, bits)
    lzw = _gif_lzw_encode_uncompressed(indices.ravel(), mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([mcs]) + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    """Pure-Python GIF decode -> uint8 RGB array (h, w, 3): real LZW
    (growing code widths, clear/EOI), global and local color tables,
    interlaced row ordering, extension-block skipping; first frame only
    (animation is outside the fixture contract)."""
    data = bytes(data)
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_body(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF truncated or malformed: {e}") from e


def _decode_gif_body(data: bytes) -> np.ndarray:
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos: pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            table = np.frombuffer(data, np.uint8, size * 3, pos).reshape(size, 3)
            pos += size * 3
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw.extend(data[pos + 1: pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(bytes(lzw), mcs)
        if len(idx) < iw * ih:
            raise ValueError("GIF pixel data truncated")
        rows = np.asarray(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = [y for start, step in _GIF_INTERLACE_PASSES
                     for y in range(start, ih, step)]
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        if rows.max() >= len(table):
            raise ValueError("GIF index outside color table")
        return table[rows]  # first frame
    raise ValueError("GIF contains no image block")


def gif_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL image features from a decoded GIF — same statistic layout as
    png_features (dims + global/per-channel stats), so downstream feature
    consumers are codec-agnostic."""
    px = decode_gif(payload).astype(np.float64)
    h, w, c = px.shape
    flat = px.reshape(-1, c)
    feats = [float(w), float(h), float(c),
             float(flat.mean()), float(flat.std()),
             float(flat.min()), float(flat.max())]
    for ch in range(4):
        feats.append(float(flat[:, ch].mean()) if ch < c else 0.0)
    for ch in range(4):
        feats.append(float(flat[:, ch].std()) if ch < c else 0.0)
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return np.asarray(feats, dtype=np.float64)


def media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic media rows (media_id, mime, width, height, payload
    bytes) — pure function shared by make_media_table and the driver-side
    oracle precompute. PNG rows carry REAL encoded PNGs (deterministic
    gradient+noise pixels, filter-0); GIF rows carry REAL encoded GIFs
    (seeded palette + indexed pixels through the LZW encoder); jpeg rows
    keep opaque random bytes for the disclosed fake-codec path."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(16, 256))
        h = int(rng.integers(16, 256))
        if i % 3 == 0 and i % 6 != 0:
            pw, ph = (w % 16) + 4, (h % 16) + 4
            n_colors = int(rng.integers(2, 17))
            palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
            idx = rng.integers(0, n_colors, size=(ph, pw), dtype=np.uint8)
            payload = encode_gif(idx, palette)
            rows.append((i, "image/gif", pw, ph, payload))
        elif i % 3:
            pw, ph = (w % 16) + 4, (h % 16) + 4  # small real images
            grad = (
                np.arange(ph)[:, None, None] * 7
                + np.arange(pw)[None, :, None] * 3
                + np.arange(3)[None, None, :] * 11
            )
            noise = rng.integers(0, 32, size=(ph, pw, 3))
            payload = encode_png(((grad + noise) % 256).astype(np.uint8))
            rows.append((i, "image/png", pw, ph, payload))
        else:
            payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
            rows.append((i, "image/jpeg", w, h, payload))
    return rows


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads with metadata)."""
    pdf = pd.DataFrame(
        media_rows(n, seed), columns=["media_id", "mime", "width", "height", "payload"]
    )
    return spark.createDataFrame(pdf)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-features: sha256-seeded uniform vector (the
    disclosed stub path for mime types without an in-sandbox codec)."""
    digest = hashlib.sha256(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(dim)


def png_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL image features from a decoded PNG: dimensions + global and
    per-channel pixel statistics, zero-padded to the feature width.
    Deterministic float64 — shared by the Spark stage and the oracle."""
    px = decode_png(payload).astype(np.float64)
    h, w, c = px.shape
    flat = px.reshape(-1, c)
    feats = [float(w), float(h), float(c),
             float(flat.mean()), float(flat.std()),
             float(flat.min()), float(flat.max())]
    for ch in range(4):
        feats.append(float(flat[:, ch].mean()) if ch < c else 0.0)
    for ch in range(4):
        feats.append(float(flat[:, ch].std()) if ch < c else 0.0)
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return np.asarray(feats, dtype=np.float64)


def media_features(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Feature vector for one payload: REAL decode for PNG signatures,
    the seeded fake for other mimes (when allowed)."""
    p = bytes(payload)
    if p.startswith(PNG_SIGNATURE):
        return png_features(p)
    if p[:6] in GIF_SIGNATURES:
        return gif_features(p)
    if not deterministic_fake:
        raise NotImplementedError(
            "only PNG and GIF decode in this container (pure-Python "
            "codecs); other mimes need PIL/opencv/ffmpeg — run with "
            "deterministic_fake=True or swap in a codec"
        )
    return _fake_features(p)


def decode_image_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list:
    """Decode a batch of image binaries to feature vectors: PNGs through
    the real pure-Python decoder, everything else through the disclosed
    deterministic-fake stub (or an error when fakes are not allowed)."""
    return [media_features(p, deterministic_fake) for p in payloads]


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", deterministic_fake: bool = True
) -> DataFrame:
    """(media_id, mime, features array<double>) via Arrow-batched decode.

    Partitioning note: media tables are wide (payload bytes dominate);
    keep maxRecordsPerBatch modest so Arrow batches stay under a few
    hundred MB at production payload sizes.
    """

    def fn(it):
        for pdf in it:
            feats = decode_image_batch(pdf[payload_col], deterministic_fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(fn, "media_id long, mime string, features array<double>")


def resize_image(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize stub with real Spark plumbing: same columns out, metadata
    updated to the target dims, payload re-emitted (a real implementation
    decodes + resamples + re-encodes inside this same batch function).

    With deterministic_fake the 'resized' payload is a length-scaled
    sha256 stream of the original — deterministic, size-plausible, and
    clearly fake."""

    def fn(it):
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real resize requires an image codec; run with "
                    "deterministic_fake=True or swap this function"
                )
            n_bytes = max(1, target_w * target_h // 8)
            out_payload = []
            for p in pdf[payload_col]:
                stream = b""
                seed = bytes(p)
                while len(stream) < n_bytes:
                    seed = hashlib.sha256(seed).digest()
                    stream += seed
                out_payload.append(stream[:n_bytes])
            out = pdf.copy()
            out["width"] = np.int32(target_w)
            out["height"] = np.int32(target_h)
            out[payload_col] = out_payload
            yield out

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(fn, ddl)


def frame_sample_stub(df: DataFrame, every_n: int = 10, max_samples: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_index) plan rows
    for every ``every_n``-th frame (0, every_n, 2*every_n, ...), capped at
    ``max_samples`` — the real sampler (which knows the true frame count
    from the decoded container) slots into the same shape."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.lit((max_samples - 1) * every_n), F.lit(every_n)
            )
        ).alias("frame_index"),
    )
