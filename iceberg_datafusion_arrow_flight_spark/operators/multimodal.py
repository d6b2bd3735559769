"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched Pandas UDFs (``mapInPandas``).

Decode comes in three tiers:

- **Real decode for container-less formats** (``decode_image_payloads``):
  PPM (P6) and uncompressed 24-bit BMP are parsed to actual pixel
  arrays in pure numpy — header fields, row padding, bottom-up order —
  no image library needed.  This is the genuinely-exercised path: the
  fixture generator emits real PPM/BMP bytes and tests assert
  pixel-exact statistics.
- **PNG (8-bit RGB, non-interlaced)**: REAL decode via the pure
  numpy + stdlib-zlib codec below (``_decode_png``) — chunk CRCs
  verified, all five scanline filters undone; no image library needed
  (closed r9; pixel-oracled by ``multimodal_png_decode``).
- **Remaining codec formats** (jpeg/webp): gated on Pillow, which is
  NOT installable here (no network — pip install attempts fail at the
  resolver; probed 2026-08-13..r9, see GAPS.md).  Requesting
  ``decode_mode='real'`` for these raises ``NotImplementedError``
  loudly; on a cluster with Pillow the same entry point lights up.
- **Stub decode** (``decode_payloads`` default): byte length + md5 +
  metadata passthrough — the batch-shape/partitioning scaffold.

Scale: mapInPandas streams Arrow batches per partition; payload bytes
never pass through the driver.  At 100 TB keep payloads in object-store
refs + byte-ranges (the metadata struct has a ``uri`` slot for exactly
that) and decode behind a column-pruned projection so untouched payloads
are never read.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out

DECODED_SCHEMA = ("doc_id BIGINT, fmt STRING, width INT, height INT, "
                  "n_bytes BIGINT, checksum STRING")

FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_checksum STRING"


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf8 bytes of the text,
    metadata struct (fmt, width, height, n_frames, uri) derived
    deterministically from the id.  On a real lakehouse this is how an
    image/video table looks: binary (or uri) + typed metadata."""
    did = F.col(id_col)
    return df.select(
        did,
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.when(did % 3 == 0, "png").when(did % 3 == 1, "jpeg")
            .otherwise("webp").alias("fmt"),
            (32 + (did % 8) * 16).cast("int").alias("width"),
            (32 + (did % 5) * 16).cast("int").alias("height"),
            (1 + did % 4).cast("int").alias("n_frames"),
            F.concat(F.lit("memory://doc/"), did.cast("string")).alias("uri"),
        ).alias("meta"))


def _try_real_decode(fmt: str):
    """Return a real decoder if the library exists; else None.  Raising
    path kept explicit so a cluster WITH the libs changes behavior only
    by opting in (decode_mode='real')."""
    try:
        import PIL.Image  # noqa: F401 — absent in this container
        return PIL.Image
    except ImportError:
        return None


def decode_payloads(df: DataFrame, decode_mode: str = "stub") -> DataFrame:
    """'Decode' each payload → (doc_id, fmt, width, height, n_bytes,
    checksum) via mapInPandas (Arrow batches, partition-parallel)."""
    if decode_mode == "real" and _try_real_decode("png") is None:
        raise NotImplementedError(
            "real image decode requires an image library not present in "
            "this environment; use decode_mode='stub'")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "checksum": [hashlib.md5(bytes(p)).hexdigest()
                             for p in pdf["payload"]],
            })
            yield out

    return fan_out(df).mapInPandas(decode, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Real decode: PPM (P6) / uncompressed 24-bit BMP in pure numpy
# ---------------------------------------------------------------------------

IMAGE_SCHEMA = ("doc_id BIGINT, fmt STRING, width INT, height INT, "
                "n_bytes BIGINT, sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, "
                "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, "
                "checksum STRING")


def _encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def _encode_bmp(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bpp BMP; rows padded to 4 bytes and
    stored bottom-up, pixels as BGR — the format's actual layout."""
    row_size = (width * 3 + 3) & ~3
    image_size = row_size * height
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + image_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = width.to_bytes(4, "little")
    header[22:26] = height.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    header[34:38] = image_size.to_bytes(4, "little")
    rows = bytearray()
    bgr = pixels[:, :, ::-1].astype(np.uint8)  # RGB → BGR
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return bytes(header) + bytes(rows)


def _decode_ppm(buf: bytes) -> tuple[int, int, np.ndarray]:
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:  # width, height, maxval (comments skipped)
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        end = pos
        while not buf[end:end + 1].isspace():
            end += 1
        parts.append(int(buf[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    width, height, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(buf, np.uint8, count=width * height * 3, offset=pos)
    return width, height, px.reshape(height, width, 3)


def _decode_bmp(buf: bytes) -> tuple[int, int, np.ndarray]:
    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(buf[10:14], "little")
    width = int.from_bytes(buf[18:22], "little", signed=True)
    height = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    row_size = (width * 3 + 3) & ~3
    out = np.empty((abs(height), width, 3), np.uint8)
    bottom_up = height > 0
    height = abs(height)
    for y in range(height):
        row = np.frombuffer(buf, np.uint8, count=width * 3,
                            offset=data_off + y * row_size)
        dest = height - 1 - y if bottom_up else y
        out[dest] = row.reshape(width, 3)[:, ::-1]  # BGR → RGB
    return width, height, out


# ---------------------------------------------------------------------------
# Real PNG codec (8-bit RGB, non-interlaced) — stdlib zlib + numpy.
# PNG needs NO image library: the container is zlib-compressed
# scanlines with five per-row byte filters (spec §6), and zlib ships
# with CPython.  This closes the "png decode needs Pillow" gap for the
# baseline truecolor profile; jpeg/webp (DCT / VP8 entropy coding)
# remain genuinely library-gated.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib
    return (len(body).to_bytes(4, "big") + tag + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big"))


def _encode_png(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Minimal truecolor PNG: 8-bit RGB, filter 0 on every scanline
    (legal and simplest; the decoder below handles all five filters)."""
    import zlib
    ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))  # depth 8, color 2 (RGB)
    raw = bytearray()
    px = pixels.astype(np.uint8)
    for y in range(height):
        raw += b"\x00" + px[y].tobytes()   # filter type 0 per row
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _decode_png(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Parse chunks, inflate IDAT, undo per-scanline filters (all five
    types: None/Sub/Up/Average/Paeth).  8-bit RGB non-interlaced only —
    raises loudly on anything else."""
    import zlib
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, idat = len(_PNG_SIG), bytearray()
    width = height = None
    while pos < len(buf):
        # Chunk lengths are untrusted input: validate against the
        # buffer before slicing so a malformed/truncated payload raises
        # the codec's loud ValueError, not an opaque zlib/numpy error
        # downstream (ADVICE r9).
        if pos + 8 > len(buf):
            raise ValueError("truncated PNG chunk header")
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        if ln > 0x7FFFFFFF or pos + 12 + ln > len(buf):
            raise ValueError(
                f"PNG chunk length {ln} overruns buffer "
                f"({len(buf)} bytes, chunk at offset {pos})")
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(buf[pos + 8 + ln:pos + 12 + ln], "big")
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if ln != 13:
                raise ValueError(f"PNG IHDR length {ln} != 13")
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color, comp, filt, interlace = body[8:13]
            # comp/filt: the spec defines only method 0 for both — a
            # nonzero value is a different (undecodable-here) stream.
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile depth={depth} "
                    f"color={color} compression={comp} filter={filt} "
                    f"interlace={interlace}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride, bpp = width * 3, 3
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG inflated size {len(raw)} != expected "
            f"{height * (stride + 1)} for {width}x{height} RGB8")
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, count=stride,
                            offset=y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:                       # None
            cur = row
        elif ftype == 2:                     # Up
            cur = (row + prev) & 0xFF
        else:                                # Sub / Average / Paeth:
            cur = np.zeros(stride, np.int32)  # left-recurrent, per byte
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:               # Sub
                    pred = a
                elif ftype == 3:             # Average
                    pred = (a + b) // 2
                elif ftype == 4:             # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) \
                        else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                cur[i] = (row[i] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, out.reshape(height, width, 3)


# ---------------------------------------------------------------------------
# Real baseline JPEG codec (SOF0 sequential, Huffman entropy coding,
# 4:4:4 / 4:2:0 / grayscale) — pure numpy + stdlib.  This closes the
# "jpeg decode needs Pillow" gap the way PNG fell in r9: the container
# is markers + Huffman-coded quantized DCT blocks, all of which are
# hand-rollable.  Progressive (SOF2), arithmetic coding, restart
# intervals, and 12-bit precision raise loudly — webp (VP8) remains
# genuinely library-gated.
#
# The color transforms are DEFINED as exact fixed-point integer
# approximations of JFIF (scale 256, floor rounding) so that a SQL
# oracle can replicate the decoded pixels of analytically-tractable
# images (constant 16x16 tiles: every AC coefficient quantizes to 0
# and the DC path is exact end-to-end — see attach_jpeg_payload).
# ---------------------------------------------------------------------------

def _jpeg_zigzag() -> np.ndarray:
    """Scan-position → raster-index map, derived (not transcribed):
    anti-diagonals d = row+col, even d walked bottom-up."""
    out = []
    for d in range(15):
        lo, hi = max(0, d - 7), min(d, 7)
        rows = range(hi, lo - 1, -1) if d % 2 == 0 else range(lo, hi + 1)
        out.extend(r * 8 + (d - r) for r in rows)
    return np.array(out, np.int64)


_JZZ = _jpeg_zigzag()

# Quant tables (quality fixed): DC step 8 makes the constant-tile DC
# path exact (|8*(v-128)| / 8 re-scales losslessly); AC step 16.
_JQ_LUMA = np.full(64, 16, np.int32)
_JQ_LUMA[0] = 8
_JQ_CHROMA = _JQ_LUMA.copy()

# Custom canonical Huffman tables (embedded in DHT, so the decoder
# reads them from the FILE — nothing depends on Annex K transcription):
# DC: 12 size categories, all 4-bit codes; AC: the 162 baseline symbols
# (EOB, ZRL, run 0-15 x size 1-10), all 8-bit codes.  Both satisfy
# Kraft with the all-ones code unused.
_JDC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JDC_VALS = list(range(12))
_JAC_VALS = sorted([0x00, 0xF0] + [(r << 4) | s
                                   for r in range(16)
                                   for s in range(1, 11)])
_JAC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_JAC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _jpeg_dct_basis() -> np.ndarray:
    import math
    m = np.empty((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_JDCT = _jpeg_dct_basis()          # block_dct = M @ block @ M.T
_JY_W = (77, 150, 29)              # fixed-point JFIF forward (scale 256)
_JCB_W = (-43, -85, 128)
_JCR_W = (128, -107, -21)


def _jpeg_rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.int64)
    g = px[..., 1].astype(np.int64)
    b = px[..., 2].astype(np.int64)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8)
    cr = 128 + ((128 * r - 107 * g - 21 * b + 128) >> 8)
    return np.stack([y, cb, cr], axis=-1)


def _jpeg_ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                       cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.int64)
    cbd = cb.astype(np.int64) - 128
    crd = cr.astype(np.int64) - 128
    r = y + ((359 * crd + 128) >> 8)
    g = y - ((88 * cbd + 183 * crd + 128) >> 8)
    b = y + ((454 * cbd + 128) >> 8)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


class _JBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:           # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)   # pad with 1s
        return bytes(self.buf)


def _jpeg_size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _jpeg_encode_block(wr: _JBitWriter, block: np.ndarray, quant: np.ndarray,
                       dc_pred: int, dc_map: dict, ac_map: dict) -> int:
    coef = _JDCT @ (block.astype(np.float64) - 128.0) @ _JDCT.T
    q = np.round(coef.reshape(-1)[_JZZ] / quant).astype(np.int64)
    dc, diff = int(q[0]), int(q[0]) - dc_pred
    size = _jpeg_size_cat(diff)
    code, ln = dc_map[size]
    wr.put(code, ln)
    if size:
        wr.put(diff if diff > 0 else diff - 1 + (1 << size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac_map[0xF0]
            wr.put(c, l)
            run -= 16
        size = _jpeg_size_cat(v)
        if size > 10:
            raise ValueError(f"AC coefficient {v} out of baseline range")
        c, l = ac_map[(run << 4) | size]
        wr.put(c, l)
        wr.put(v if v > 0 else v - 1 + (1 << size), size)
        run = 0
    if last_nz < 63:
        c, l = ac_map[0x00]            # EOB
        wr.put(c, l)
    return dc


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _encode_jpeg(width: int, height: int, pixels: np.ndarray,
                 subsample: str = "444") -> bytes:
    """Baseline sequential JFIF: 3-component YCbCr, 4:4:4 or 4:2:0,
    fixed quant tables (_JQ_*), custom canonical Huffman tables written
    to DHT.  Edge padding replicates the last row/column."""
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample}")
    ycc = _jpeg_rgb_to_ycbcr(pixels.astype(np.uint8))
    mcu = 8 if subsample == "444" else 16
    pw = (width + mcu - 1) // mcu * mcu
    ph = (height + mcu - 1) // mcu * mcu
    planes = []
    for ci in range(3):
        p = ycc[..., ci]
        p = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        if subsample == "420" and ci > 0:
            p = (p[0::2, 0::2] + p[0::2, 1::2]
                 + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2
        planes.append(p.astype(np.int64))
    dc_l = _huff_encode_map(_JDC_BITS, _JDC_VALS)
    ac_l = _huff_encode_map(_JAC_BITS, _JAC_VALS)
    wr = _JBitWriter()
    preds = [0, 0, 0]
    n_mx, n_my = pw // mcu, ph // mcu
    for my in range(n_my):
        for mx in range(n_mx):
            if subsample == "444":
                comps = [(0, planes[0], mx, my, _JQ_LUMA),
                         (1, planes[1], mx, my, _JQ_CHROMA),
                         (2, planes[2], mx, my, _JQ_CHROMA)]
                for ci, plane, bx, by, q in comps:
                    blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    preds[ci] = _jpeg_encode_block(wr, blk, q, preds[ci],
                                                   dc_l, ac_l)
            else:
                for sy in range(2):
                    for sx in range(2):
                        blk = planes[0][my * 16 + sy * 8:
                                        my * 16 + sy * 8 + 8,
                                        mx * 16 + sx * 8:
                                        mx * 16 + sx * 8 + 8]
                        preds[0] = _jpeg_encode_block(
                            wr, blk, _JQ_LUMA, preds[0], dc_l, ac_l)
                for ci in (1, 2):
                    blk = planes[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                    preds[ci] = _jpeg_encode_block(
                        wr, blk, _JQ_CHROMA, preds[ci], dc_l, ac_l)
    dqt = (_jpeg_seg(0xDB, bytes([0])
                     + bytes(int(v) for v in _JQ_LUMA))
           + _jpeg_seg(0xDB, bytes([1])
                       + bytes(int(v) for v in _JQ_CHROMA)))
    sf = (0x11, 0x11, 0x11) if subsample == "444" else (0x22, 0x11, 0x11)
    sof = _jpeg_seg(0xC0, bytes([8])
                    + height.to_bytes(2, "big") + width.to_bytes(2, "big")
                    + bytes([3,
                             1, sf[0], 0,
                             2, sf[1], 1,
                             3, sf[2], 1]))
    dht = (_jpeg_seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS)
                     + bytes(_JDC_VALS))
           + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JAC_BITS)
                       + bytes(_JAC_VALS))
           + _jpeg_seg(0xC4, bytes([0x01]) + bytes(_JDC_BITS)
                       + bytes(_JDC_VALS))
           + _jpeg_seg(0xC4, bytes([0x11]) + bytes(_JAC_BITS)
                       + bytes(_JAC_VALS)))
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xFF\xD8" + dqt + sof + dht + sos + wr.flush()
            + b"\xFF\xD9")


class _JBitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; any other
    marker inside the scan raises loudly (no restart-interval support,
    documented)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf, self.pos = buf, pos
        self.acc, self.n = 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.buf[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("JPEG entropy stream truncated at FF")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif nxt == 0xD9:      # EOI reached while padding
                    byte = 0xFF
                else:
                    raise ValueError(
                        f"unsupported marker FF{nxt:02X} in scan "
                        f"(restart intervals not supported)")
            self.acc, self.n = byte, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline sequential decoder: DQT/SOF0/DHT/SOS markers, Huffman
    entropy decode, dequantize, IDCT, chroma upsample (replication),
    fixed-point YCbCr→RGB.  Raises loudly on progressive/arithmetic/
    12-bit/restart-interval/unknown-subsampling streams."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []
    width = height = None
    scan_comps = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC0, 0xC4):
            # SOF1/2/3/5..15 (progressive, lossless, arithmetic), DAC,
            # and the reserved JPG marker are all out of baseline scope.
            raise ValueError(
                f"unsupported JPEG marker FF{marker:02X} "
                f"(baseline sequential SOF0 + Huffman only)")
        ln = int.from_bytes(buf[pos + 2:pos + 4], "big")
        body = buf[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG segment overruns buffer")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tid] = np.frombuffer(
                    body[b + 1:b + 65], np.uint8).astype(np.int64)
                b += 65
        elif marker == 0xC0:
            if body[0] != 8:
                raise ValueError(f"unsupported JPEG precision {body[0]}")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = [(body[6 + 3 * i], body[7 + 3 * i] >> 4,
                      body[7 + 3 * i] & 0xF, body[8 + 3 * i])
                     for i in range(nc)]
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                enc = _huff_encode_map(bits, vals)
                huff[(cls, tid)] = {(l, c): s for s, (c, l) in enc.items()}
                b += 17 + nv
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0xF) for i in range(ns)]
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if width is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if len(comps) == 3 and (hs, vs) not in (([1, 1, 1], [1, 1, 1]),
                                            ([2, 1, 1], [2, 1, 1])):
        raise ValueError(
            f"unsupported subsampling h={hs} v={vs} (4:4:4 / 4:2:0 only)")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mx = (width + mcu_w - 1) // mcu_w
    n_my = (height + mcu_h - 1) // mcu_h
    planes = [np.zeros((n_my * vs[i] * 8, n_mx * hs[i] * 8), np.int64)
              for i in range(len(comps))]
    rd = _JBitReader(buf, pos)
    preds = [0] * len(comps)
    idct_t = _JDCT.T
    for my in range(n_my):
        for mx in range(n_mx):
            for ci, (cid, ch, cv, qid) in enumerate(comps):
                sc = next(s for s in scan_comps if s[0] == cid)
                dct_tab = huff[(0, sc[1])]
                act_tab = huff[(1, sc[2])]
                q = quant[qid]
                for sy in range(cv):
                    for sx in range(ch):
                        zz = np.zeros(64, np.int64)
                        size = rd.huff(dct_tab)
                        diff = _jpeg_extend(rd.bits(size), size) \
                            if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = rd.huff(act_tab)
                            if sym == 0x00:
                                break
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol {sym:02X}")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _jpeg_extend(rd.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_JZZ] = (zz * q).astype(np.float64)
                        blk = idct_t @ coef.reshape(8, 8) @ _JDCT
                        out = np.clip(np.round(blk) + 128, 0, 255)
                        py = (my * cv + sy) * 8
                        px_ = (mx * ch + sx) * 8
                        planes[ci][py:py + 8, px_:px_ + 8] = \
                            out.astype(np.int64)
    if len(comps) == 1:
        y = planes[0][:height, :width]
        gray = np.clip(y, 0, 255).astype(np.uint8)
        return width, height, np.stack([gray] * 3, axis=-1)
    full = []
    for i in range(3):
        p = planes[i]
        if hs[i] < hmax or vs[i] < vmax:
            p = np.repeat(np.repeat(p, vmax // vs[i], axis=0),
                          hmax // hs[i], axis=1)
        full.append(p[:height, :width])
    return width, height, _jpeg_ycbcr_to_rgb(full[0], full[1], full[2])


def _jpeg_header(buf: bytes) -> dict:
    """Metadata-only JPEG parse: walk the marker segments up to SOS and
    return dimensions / subsampling / quant DC steps WITHOUT entropy
    decoding — the header-gate a curation pass runs before paying for
    a full decode (at 100 TB, rejecting by dimensions or chroma mode
    reads a few hundred bytes per object instead of megapixels)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    out: dict = {}
    quant: dict[int, int] = {}
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        ln = int.from_bytes(buf[pos + 2:pos + 4], "big")
        body = buf[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG segment overruns buffer")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                quant[body[b] & 0xF] = body[b + 1]   # DC step (zigzag 0)
                b += 65 if (body[b] >> 4) == 0 else 129
        elif marker == 0xC0:
            out["height"] = int.from_bytes(body[1:3], "big")
            out["width"] = int.from_bytes(body[3:5], "big")
            nc = body[5]
            sf = [(body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0xF)
                  for i in range(nc)]
            out["n_components"] = nc
            out["subsampling"] = (
                "gray" if nc == 1
                else "420" if sf[0] == (2, 2) else "444")
            out["__luma_qid"] = body[8]    # DQT may follow SOF: resolve last
        elif marker == 0xDA:
            break
        pos += 2 + ln
    if "width" not in out:
        raise ValueError("JPEG missing SOF0 header")
    out["dc_step_luma"] = quant.get(out.pop("__luma_qid"), 0)
    return out


# ---------------------------------------------------------------------------
# Real GIF codec (GIF89a: logical screen + color tables + LZW-compressed
# indexed frames, Graphic Control Extensions for animation) — pure
# stdlib + numpy, the next feasible hand-roll after PNG (r9) and JPEG
# (r10).  GIF-variant LZW: variable-width codes starting at
# min_code+1 bits, LSB-first bit packing, CLEAR/EOI codes, width bump
# when the table reaches 2^width, 12-bit cap with explicit CLEAR reset.
# Interlaced images raise loudly (a row-reorder we have no fixture
# for); local color tables and multi-frame animations are supported.
# Spec: GIF89a specification (CompuServe 1990); the LZW path is
# additionally pinned by the well-known 10x10 sample stream test
# vector in tests (see test_multimodal.py::test_gif_lzw_spec_vector).
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW compress of an index stream."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    cur = nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    s = b""
    for b in data:
        t = s + bytes([b])
        if t in table:
            s = t
            continue
        emit(table[s])
        if next_code < 4096:
            table[t] = next_code
            next_code += 1
            # decoder's table lags one entry, so it bumps width at
            # next==2^w exactly when we bump at next==2^w+1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:                       # table full: explicit reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        s = bytes([b])
    if s:
        emit(table[s])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(buf: bytes, min_code: int, n_px: int) -> bytes:
    """GIF-variant LZW decompress; raises loudly on malformed streams."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    pos = 0
    total_bits = len(buf) * 8
    out = bytearray()
    table: list[bytes] = []
    prev = b""

    def read() -> int:
        nonlocal pos
        v = 0
        for i in range(width):
            v |= ((buf[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    while len(out) < n_px:
        if pos + width > total_bits:
            raise ValueError("LZW stream underrun")
        code = read()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = b""
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("LZW code before first CLEAR")
        if not prev:                       # first code after CLEAR
            if code >= clear:
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table) and code != eoi and code != clear:
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):           # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table "
                             f"size {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_px])


def _gif_sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _encode_gif(width: int, height: int, frames: list,
                palette: np.ndarray, delay_cs: int = 10) -> bytes:
    """GIF89a with a 256-entry global color table; every frame is a
    full-canvas 8-bit indexed image.  Animations (len(frames) > 1) get
    a Graphic Control Extension per frame."""
    import struct
    out = bytearray(b"GIF89a")
    # packed: GCT present | color resolution 8 | GCT size 2^(7+1)=256
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += palette.astype(np.uint8).tobytes()            # 768 bytes
    for fr in frames:
        if len(frames) > 1:
            out += (b"\x21\xF9\x04" + bytes([0])
                    + struct.pack("<H", delay_cs) + bytes([0, 0]))
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)                                    # min LZW code
        out += _gif_sub_blocks(
            _lzw_encode(fr.astype(np.uint8).tobytes(), 8))
    out += b"\x3B"
    return bytes(out)


def _decode_gif(buf: bytes):
    """Parse a GIF87a/89a stream: returns (width, height, palette,
    frames, delays_cs) where frames are (h, w) uint8 INDEX arrays.
    Interlace raises loudly; local color tables are honored by
    materializing that frame through its own palette into the global
    index space only when identical — otherwise the per-frame palette
    is returned alongside (kept simple: we raise if an LCT differs
    from the GCT, which no fixture here produces)."""
    import struct
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(buf[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    frames, delays = [], []
    delay = 0
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:                                   # trailer
            break
        if b0 == 0x21:                                   # extension
            label = buf[pos + 1]
            pos += 2
            blocks = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                blocks += buf[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(blocks) >= 3:
                delay = int.from_bytes(blocks[1:3], "little")
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", buf[pos + 1:pos + 10])
        pos += 10
        if fpacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        pal = palette
        if fpacked & 0x80:                               # local table
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(buf[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
            if palette is None or n != len(palette) \
                    or not np.array_equal(lct, palette):
                raise ValueError("local color table differs from "
                                 "global — unsupported here")
            pal = palette
        if (left, top, fw, fh) != (0, 0, width, height):
            raise ValueError("partial-canvas GIF frame unsupported")
        min_code = buf[pos]
        pos += 1
        lzw = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            lzw += buf[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), min_code, fw * fh),
            np.uint8).reshape(fh, fw)
        if pal is not None and int(idx.max()) >= len(pal):
            raise ValueError("GIF index beyond palette")
        frames.append(idx)
        delays.append(delay)
        delay = 0
    if palette is None:
        raise ValueError("GIF without a color table")
    if not frames:
        raise ValueError("GIF with no image data")
    return width, height, palette, frames, delays


def _gif_palette() -> np.ndarray:
    """The fixture palette: entry i -> (i, 2i mod 256, 3i mod 256) —
    affine in the index so a SQL oracle derives channel values from
    the index formula alone."""
    i = np.arange(256, dtype=np.int64)
    return np.stack([i % 256, (2 * i) % 256, (3 * i) % 256],
                    axis=1).astype(np.uint8)


def _decode_gif_rgb(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Single-frame GIF -> (w, h, RGB array) for the shared decoder
    registry (moments / signatures / resize paths)."""
    w, h, pal, frames, _ = _decode_gif(buf)
    if len(frames) != 1:
        raise ValueError(f"expected single-frame GIF, got {len(frames)}")
    return w, h, pal[frames[0]]


def attach_gif_payload(df: DataFrame, id_col: str = "doc_id",
                       n_frames: int = 1) -> DataFrame:
    """Real GIF fixture: payload = genuine GIF89a bytes (LZW-compressed
    indexed frames over the affine fixture palette), built
    executor-side.  Frame f's flat index k is
    ``(7*doc_id + k + OFF[f]) % 256`` with OFF = (0, 0, 11, 29) —
    frames 0 and 1 are exact duplicates (the animation-dedup fixture),
    2 and 3 distinct shifts.  Single-frame payloads use OFF[0] only."""
    src = df.select(F.col(id_col).alias("doc_id"))
    offs = (0, 0, 11, 29)
    pal = _gif_palette()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                frames = [
                    ((7 * did + np.arange(w * h) + offs[f % 4]) % 256)
                    .astype(np.uint8).reshape(h, w)
                    for f in range(n_frames)]
                payloads.append(_encode_gif(w, h, frames, pal))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "fmt": ["gif"] * len(ws),
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


GIF_FRAME_SCHEMA = ("doc_id BIGINT, frame_idx INT, width INT, "
                    "height INT, delay_cs INT, idx_sum BIGINT, "
                    "is_dup_of_prev BOOLEAN")


def gif_frame_dedup(df: DataFrame) -> DataFrame:
    """Decode EVERY frame of each animated-GIF payload and mark exact
    duplicate-of-previous frames by full index-stream equality — the
    frame-level dedup primitive (animation loops and stills repeat
    frames; training pipelines drop them before feature extraction).
    Emits one row per frame with the exact integer index sum (pins the
    whole LZW decode) and the dup flag.  Per-batch numpy; payload
    bytes never shuffle — only (id, frame, ints) rows leave."""

    def per(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "width",
                                    "height", "delay_cs", "idx_sum",
                                    "is_dup_of_prev")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _pal, frames, delays = _decode_gif(bytes(payload))
                prev = None
                for f, (fr, dl) in enumerate(zip(frames, delays)):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(f)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["delay_cs"].append(dl)
                    rows["idx_sum"].append(int(fr.astype(np.int64).sum()))
                    rows["is_dup_of_prev"].append(
                        prev is not None and np.array_equal(fr, prev))
                    prev = fr
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(per, schema=GIF_FRAME_SCHEMA)


# --- TIFF (spec 6.0 baseline RGB: strips, none/PackBits, II+MM) ---------

def _packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9 / Apple spec): runs of >= 3 identical
    bytes become (257-n, byte) with n <= 128; everything else batches
    into literal groups of <= 128.  Real RLE — the fixture formula has
    24-byte runs precisely so this path compresses and a decoder bug
    cannot hide behind literal-only streams."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _packbits_decode(buf: bytes, expected: int) -> bytes:
    """Inverse of :func:`_packbits_encode`; loud on truncation or
    over-run (a wrong StripByteCount shows up HERE, not as garbage
    pixels downstream)."""
    out = bytearray()
    i, n = 0, len(buf)
    while i < n and len(out) < expected:
        c = buf[i]
        i += 1
        if c < 128:                      # c+1 literal bytes
            if i + c + 1 > n:
                raise ValueError("PackBits literal overruns strip")
            out += buf[i:i + c + 1]
            i += c + 1
        elif c > 128:                    # 257-c copies of next byte
            if i >= n:
                raise ValueError("PackBits run missing repeat byte")
            out += bytes([buf[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


def _encode_tiff(width: int, height: int, pixels: np.ndarray,
                 compression: int = 1, rows_per_strip: int = 4,
                 big_endian: bool = False) -> bytes:
    """Minimal-but-real baseline TIFF writer: II or MM byte order,
    8-bit RGB, multiple strips (RowsPerStrip deliberately small so the
    reader's strip assembly is actually exercised), Compression 1
    (none) or 32773 (PackBits)."""
    import struct
    bo = ">" if big_endian else "<"
    px = pixels.astype(np.uint8).reshape(height, width, 3)
    strips = []
    for r0 in range(0, height, rows_per_strip):
        raw = px[r0:r0 + rows_per_strip].tobytes()
        strips.append(_packbits_encode(raw) if compression == 32773
                      else raw)
    header_len = 8
    data_off = header_len
    offsets, counts = [], []
    for s in strips:
        offsets.append(data_off)
        counts.append(len(s))
        data_off += len(s)
    bps_off = data_off                   # 3 SHORTs = 6 bytes
    n_str = len(strips)
    arr_off = bps_off + 6
    so_off, sc_off = arr_off, arr_off + 4 * n_str
    ifd_off = sc_off + 4 * n_str

    def entry(tag, typ, cnt, val, inline_short=False):
        if inline_short:
            return struct.pack(bo + "HHI", tag, typ, cnt) + \
                struct.pack(bo + "HH", val, 0)
        return struct.pack(bo + "HHII", tag, typ, cnt, val)

    entries = [
        entry(256, 3, 1, width, inline_short=True),
        entry(257, 3, 1, height, inline_short=True),
        entry(258, 3, 3, bps_off),
        entry(259, 3, 1, compression, inline_short=True),
        entry(262, 3, 1, 2, inline_short=True),
        entry(273, 4, n_str,
              offsets[0] if n_str == 1 else so_off),
        entry(277, 3, 1, 3, inline_short=True),
        entry(278, 3, 1, rows_per_strip, inline_short=True),
        entry(279, 4, n_str,
              counts[0] if n_str == 1 else sc_off),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_off)
    for s in strips:
        out += s
    out += struct.pack(bo + "HHH", 8, 8, 8)
    out += b"".join(struct.pack(bo + "I", o) for o in offsets)
    out += b"".join(struct.pack(bo + "I", c) for c in counts)
    out += struct.pack(bo + "H", len(entries)) + b"".join(entries)
    out += struct.pack(bo + "I", 0)
    return bytes(out)


def _decode_tiff(buf: bytes) -> tuple[int, int, np.ndarray]:
    """REAL baseline TIFF decode, pure numpy+struct: both byte orders,
    IFD walk, strip assembly, Compression 1 + 32773 (PackBits).
    Everything this reader does not implement raises LOUDLY (tiles,
    planar=2, LZW/Deflate/JPEG-in-TIFF, bit depths other than 8,
    non-RGB photometric, multi-IFD) — the honest-gap contract of the
    other codecs.  Format: TIFF 6.0 spec (Adobe, 1992), public."""
    import struct
    if len(buf) < 8:
        raise ValueError("truncated TIFF header")
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic} != 42")
    n_ent, = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_ent):
        tag, typ, cnt, raw = struct.unpack_from(
            bo + "HHII", buf, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, cnt, ifd_off + 2 + 12 * i + 8, raw)
    next_ifd, = struct.unpack_from(bo + "I", buf,
                                   ifd_off + 2 + 12 * n_ent)
    if next_ifd != 0:
        raise ValueError("multi-IFD TIFF not supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported")

    def values(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"required TIFF tag {tag} missing")
            return default
        typ, cnt, vpos, raw = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"TIFF tag {tag}: unsupported type {typ}")
        fmt = "H" if typ == 3 else "I"
        pos = vpos if size * cnt <= 4 else raw
        return [struct.unpack_from(bo + fmt, buf, pos + size * j)[0]
                for j in range(cnt)]

    w, h = values(256)[0], values(257)[0]
    comp = values(259, [1])[0]
    if values(262)[0] != 2:
        raise ValueError("only RGB photometric supported")
    if values(277, [3])[0] != 3 or values(258, [8, 8, 8]) != [8, 8, 8]:
        raise ValueError("only 8-bit 3-sample TIFF supported")
    if values(284, [1])[0] != 1:
        raise ValueError("planar configuration 2 not supported")
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    rps = values(278, [h])[0]
    offs, cnts = values(273), values(279)
    if len(offs) != len(cnts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    raw = bytearray()
    for i, (o, c) in enumerate(zip(offs, cnts)):
        rows = min(rps, h - i * rps)
        strip = buf[o:o + c]
        if len(strip) != c:
            raise ValueError("strip overruns file")
        raw += (strip if comp == 1
                else _packbits_decode(strip, rows * w * 3))
    if len(raw) != w * h * 3:
        raise ValueError(
            f"strip data {len(raw)} bytes != {w * h * 3}")
    return w, h, np.frombuffer(bytes(raw),
                               dtype=np.uint8).reshape(h, w, 3)


_REAL_DECODERS = {"ppm": _decode_ppm, "bmp": _decode_bmp,
                  "png": _decode_png, "jpeg": _decode_jpeg,
                  "gif": _decode_gif_rgb, "tiff": _decode_tiff}


JPEG_HEADER_SCHEMA = ("doc_id BIGINT, width INT, height INT, "
                      "n_components INT, subsampling STRING, "
                      "dc_step_luma INT")


def jpeg_header_scan(df: DataFrame) -> DataFrame:
    """Header-only scan over JPEG payloads (see :func:`_jpeg_header`):
    emits metadata rows; payload pixel bytes are never entropy-decoded
    and never shuffle."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "n_components", "subsampling",
                                    "dc_step_luma")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = _jpeg_header(bytes(payload))
                rows["doc_id"].append(did)
                for k in ("width", "height", "n_components",
                          "subsampling", "dc_step_luma"):
                    rows[k].append(h[k])
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(scan, schema=JPEG_HEADER_SCHEMA)


def attach_image_payload(df: DataFrame, id_col: str = "doc_id",
                         fmt_period: int = 1) -> DataFrame:
    """Real multimodal fixture: payload = actual PPM/BMP bytes with
    deterministic pixels (value = (7·doc_id + flat_index) mod 256),
    built executor-side in Arrow batches — the driver never sees a
    payload byte.  ``fmt_period`` picks the container by
    ``(doc_id // fmt_period) % 2`` — the default 1 alternates per id;
    1280 makes identical-pixel ids (which differ by multiples of 1280)
    land in DIFFERENT containers, the cross-encoding dedup fixture."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts, ws, hs = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                flat = (7 * did + np.arange(w * h * 3)) % 256
                px = flat.reshape(h, w, 3)
                if (did // fmt_period) % 2 == 0:
                    fmts.append("ppm")
                    payloads.append(_encode_ppm(w, h, px))
                else:
                    fmts.append("bmp")
                    payloads.append(_encode_bmp(w, h, px))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fmt": fmts,
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


def decode_image_payloads(df: DataFrame) -> DataFrame:
    """REAL decode: parse each payload's actual header + pixel buffer
    (PPM/BMP) and emit pixel statistics.  Width/height come from the
    BYTES, not the metadata — the test asserts they agree, which only
    holds if the parse is real."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "fmt", "width", "height",
                                    "n_bytes", "sum_r", "sum_g", "sum_b",
                                    "mean_r", "mean_g", "mean_b",
                                    "checksum")}
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                buf = bytes(payload)
                w, h, px = _REAL_DECODERS[fmt](buf)
                rows["doc_id"].append(did)
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(buf))
                chan = px.reshape(-1, 3).astype(np.int64)
                sums = chan.sum(axis=0)
                for i, c in enumerate("rgb"):
                    rows[f"sum_{c}"].append(int(sums[i]))
                    rows[f"mean_{c}"].append(float(sums[i]) / (w * h))
                rows["checksum"].append(hashlib.md5(buf).hexdigest())
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(decode, schema=IMAGE_SCHEMA)


PIXEL_SIG_SCHEMA = ("doc_id BIGINT, fmt STRING, width INT, height INT, "
                    "pix_sig STRING")


def pixel_signatures(df: DataFrame) -> DataFrame:
    """Content signature of the DECODED image: md5 over the normalized
    (top-down, RGB, row-major) pixel stream — so two payloads with the
    same picture in different containers (PPM vs BMP: different headers,
    BGR order, bottom-up rows, padding) hash identically.  This is what
    separates content dedup from byte dedup: a payload-checksum groupBy
    can never match across encodings.

    Scale shape: the signature is computed executor-side per Arrow
    batch; downstream grouping shuffles only (sig, id) pairs — payload
    bytes never move after the decode."""

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "fmt", "width", "height",
                                    "pix_sig")}
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                w, h, px = _REAL_DECODERS[fmt](bytes(payload))
                sig = hashlib.md5(",".join(
                    str(int(v)) for v in px.reshape(-1)).encode()
                ).hexdigest()
                rows["doc_id"].append(did)
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pix_sig"].append(sig)
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(sign, schema=PIXEL_SIG_SCHEMA)


RESIZE_REAL_SCHEMA = ("doc_id BIGINT, fmt STRING, out_width INT, "
                      "out_height INT, sum_r BIGINT, sum_g BIGINT, "
                      "sum_b BIGINT")


def resize_image_payloads(df: DataFrame, out_width: int = 16,
                          out_height: int = 16) -> DataFrame:
    """REAL nearest-neighbor resize of decoded PPM/BMP pixels (pure
    numpy index sampling — the classic resample kernel) with exact
    per-channel sums of the resized image.  The oracle recomputes the
    same sampled-pixel sums symbolically, so the hash only matches if
    both the decode and the resample index math are right."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "fmt", "out_width",
                                    "out_height", "sum_r", "sum_g",
                                    "sum_b")}
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                w, h, px = _REAL_DECODERS[fmt](bytes(payload))
                iy = (np.arange(out_height) * h) // out_height
                ix = (np.arange(out_width) * w) // out_width
                out = px[np.ix_(iy, ix)].astype(np.int64)
                sums = out.reshape(-1, 3).sum(axis=0)
                rows["doc_id"].append(did)
                rows["fmt"].append(fmt)
                rows["out_width"].append(out_width)
                rows["out_height"].append(out_height)
                for i, c in enumerate("rgb"):
                    rows[f"sum_{c}"].append(int(sums[i]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(resize, schema=RESIZE_REAL_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling: emit every_nth 'frame' per payload (frame count
    from metadata; frame checksum = md5(payload || frame_idx)).  Shows
    the 1→N mapInPandas expansion shape a video pipeline needs."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for did, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                for fi in range(0, int(meta["n_frames"]), every_nth):
                    ids.append(did)
                    idxs.append(fi)
                    sums.append(hashlib.md5(bytes(payload) + str(fi).encode())
                                .hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_checksum": sums})

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = ("doc_id BIGINT, fmt STRING, out_width INT, out_height INT, "
                  "scale_x DOUBLE, scale_y DOUBLE, resized_checksum STRING")

FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"


def resize_payloads(df: DataFrame, out_width: int = 64,
                    out_height: int = 64) -> DataFrame:
    """'Resize' each payload to (out_width, out_height) via mapInPandas.

    STUB geometry path (no image libs in this container): computes the
    real scale factors from metadata and a deterministic checksum of
    (payload, target size) standing in for resized bytes.  A cluster
    with Pillow swaps the checksum line for `img.resize(...)` — the
    Spark-side shape (schema, batching, partition parallelism, column
    pruning of untouched payloads) is identical and tested."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "out_width": out_width,
                "out_height": out_height,
                "scale_x": [out_width / m["width"] for m in pdf["meta"]],
                "scale_y": [out_height / m["height"] for m in pdf["meta"]],
                "resized_checksum": [
                    hashlib.md5(bytes(p) + f"{out_width}x{out_height}"
                                .encode()).hexdigest()
                    for p in pdf["payload"]],
            })

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: payload → fixed-dim float vector via
    mapInPandas.  STUB featurizer = byte-histogram folded to ``dim``
    buckets, L1-normalized — deterministic, library-free, and shaped
    exactly like a real embedding UDF (binary in, ARRAY<DOUBLE> out,
    Arrow-batched).  Swap the body for an ONNX/torch call on a GPU
    cluster; the plan does not change."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                buf = bytes(p)
                hist = [0.0] * dim
                for b in buf:
                    hist[b % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


# --- audio (real RIFF/WAVE PCM, numpy-only) -----------------------------

AUDIO_SCHEMA = ("doc_id BIGINT, sample_rate INT, n_samples BIGINT, "
                "peak_amp BIGINT, rms DOUBLE, n_zero_cross BIGINT")


def _encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Real RIFF/WAVE container: PCM 16-bit mono, canonical 44-byte
    header + data chunk."""
    import struct
    data = samples.astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_wav(buf: bytes) -> tuple[int, "np.ndarray"]:
    """Real parse: walk RIFF chunks, validate the fmt chunk, pull PCM
    samples from the data chunk.  No audio library involved."""
    import struct
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        sz = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if (fmt_tag, n_ch, bits) != (1, 1, 16):
                raise ValueError("only PCM 16-bit mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def attach_audio_payload(df: DataFrame, id_col: str = "doc_id",
                         rate: int = 8000) -> DataFrame:
    """Audio fixture: payload = REAL WAV bytes of a deterministic
    integer waveform — sample[i] = ((doc_id·31 + i·7) mod 4096) − 2048,
    n_samples = 800 + (doc_id mod 5)·160.  Integer-exact, so a SQL
    oracle can recompute every feature from the formula while the Spark
    side must parse the actual container bytes to agree."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 800 + (did % 5) * 160
                samples = ((did * 31 + 7 * np.arange(n)) % 4096) - 2048
                payloads.append(_encode_wav(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return src.mapInPandas(gen, schema="doc_id BIGINT, payload BINARY")


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction: parse each WAV payload's chunks
    and compute sample-domain statistics — peak amplitude, RMS energy,
    zero-crossing count.  Arrow-batched mapInPandas; payload bytes stay
    executor-side.  At 100 TB the same kernel runs over object-store
    byte ranges; features are integer/sqrt-exact so downstream dedup or
    filtering on them is engine-portable."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sample_rate", "n_samples",
                                    "peak_amp", "rms", "n_zero_cross")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = _decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                nz = int(((s64[:-1] >= 0) != (s64[1:] >= 0)).sum())
                rows["doc_id"].append(did)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s64))
                rows["peak_amp"].append(int(np.abs(s64).max()))
                rows["rms"].append(float(np.sqrt((s64 * s64).sum()
                                                 / len(s64))))
                rows["n_zero_cross"].append(nz)
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(feats, schema=AUDIO_SCHEMA)


def attach_video_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real video-like fixture: per doc a short frame sequence of actual
    PPM payloads with deterministic pixels.  Frame ``f`` of doc ``d``
    draws from seed ``d`` before the midpoint cut and ``d + 1000``
    after it (pixel = (7·seed + flat) mod 256) — a hard content jump at
    ``cut_at = n_frames // 2`` that a correct scene-cut detector must
    find and a wrong decoder/differ cannot fake.  Built executor-side
    in Arrow batches like :func:`attach_image_payload`."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "n_frames",
                                    "payload", "meta_width", "meta_height")}
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                n_frames = 4 + did % 3
                cut_at = n_frames // 2
                for f in range(n_frames):
                    seed = did + (1000 if f >= cut_at else 0)
                    flat = (7 * seed + np.arange(w * h * 3)) % 256
                    px = flat.reshape(h, w, 3)
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(f)
                    rows["n_frames"].append(n_frames)
                    rows["payload"].append(_encode_ppm(w, h, px))
                    rows["meta_width"].append(w)
                    rows["meta_height"].append(h)
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, frame_idx INT, n_frames INT, "
                     "payload BINARY, meta_width INT, meta_height INT"))


SCENE_CUT_SCHEMA = ("doc_id BIGINT, frame_idx INT, sad BIGINT, "
                    "mean_abs_diff DOUBLE, is_cut BOOLEAN")


def scene_cut_sad(frames: DataFrame, threshold: float = 8.0) -> DataFrame:
    """Scene-cut detection over decoded frames: per doc, decode every
    frame's REAL pixel buffer, order by frame index, and emit the
    integer sum of absolute pixel differences (SAD) against the
    previous frame — ``is_cut`` where the per-pixel mean |Δ| crosses
    ``threshold``.  The video-segmentation primitive (shot boundaries
    for frame-dedup / caption alignment).

    Implemented with ``applyInPandas`` grouped by a HASH BUCKET of the
    doc id, not by doc (r12, guide §4.5-amortization): the per-group
    Python call overhead (one pandas frame build + one function call
    per group) was the whole stage at clip lengths of 4-6 frames —
    5,000 single-clip groups cost ~25× the arithmetic inside them.
    Bucketing ``pmod(xxhash64(doc_id), 4·parallelism)`` keeps the
    shuffle identical in volume, preserves the all-frames-of-a-doc-
    together invariant (a doc's frames hash to ONE bucket), and lets
    one call iterate ~40 clips — the kernel sorts by (doc, frame) and
    resets the differ at each doc boundary, so per-doc results are
    independent of bucketing by construction.  Bucket count derives
    from the session's parallelism (scale-adaptive, not a local[32]
    constant).  Scale: state per task is one bucket's clips (bounded by
    docs/bucket × clip length); SAD is exact integer math, so the
    DuckDB oracle recomputes it from the generator formula."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "frame_idx"])
        out = {k: [] for k in ("doc_id", "frame_idx", "sad",
                               "mean_abs_diff", "is_cut")}
        prev = None
        prev_doc = None
        # zip over columns, not iterrows(): iterrows materializes a
        # pandas Series per row (~10x the per-row cost; r11
        # optimization, same integer math).
        for did, fi, payload in zip(pdf["doc_id"], pdf["frame_idx"],
                                    pdf["payload"]):
            if did != prev_doc:
                prev = None
                prev_doc = did
            w, h, px = _decode_ppm(bytes(payload))
            cur = px.astype(np.int64)
            if prev is not None:
                sad = int(np.abs(cur - prev).sum())
                mad = sad / float(w * h * 3)
                out["doc_id"].append(int(did))
                out["frame_idx"].append(int(fi))
                out["sad"].append(sad)
                out["mean_abs_diff"].append(mad)
                out["is_cut"].append(mad > threshold)
            prev = cur
        return pd.DataFrame(out)

    spark = frames.sparkSession
    n_buckets = 4 * spark.sparkContext.defaultParallelism
    bucketed = fan_out(frames).withColumn(
        "__sc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
    return (bucketed.groupBy("__sc_bucket")
            .applyInPandas(per_bucket, schema=SCENE_CUT_SCHEMA))


AHASH_SCHEMA = ("doc_id BIGINT, width INT, height INT, "
                "ahash_hi BIGINT, ahash_lo BIGINT, n_set_bits INT")


def ahash_signatures(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of the DECODED image: integer
    grayscale (r+g+b)//3, an 8x8 block grid (pixel row r maps to block
    row (r*8)//h — exact for any size), and bit i set when block i's
    mean EXCEEDS the global mean.  The threshold compares
    ``block_sum * n_pixels > gray_total * block_count`` — pure int64
    products, so there is NO float anywhere and a SQL oracle can
    recompute every bit from the pixel generator formula.  (Variant
    note: the global-mean threshold replaces the classic
    mean-of-block-means, whose 64-double summation order would differ
    across engines.)

    The 64-bit hash ships as two 32-bit halves (bit 63 would overflow
    signed BIGINT).  Near-dup usage: band the halves for candidates,
    verify by Hamming distance — same banded shape as SimHash dedup.

    Scale: hashes are computed executor-side per Arrow batch; only
    (id, 2xint) rows shuffle — payload bytes never move."""

    def hashit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "ahash_hi", "ahash_lo", "n_set_bits")}
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                w, h, px = _REAL_DECODERS[fmt](bytes(payload))
                gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1) // 3
                k = np.arange(w * h)
                b = ((k // w) * 8 // h) * 8 + ((k % w) * 8 // w)
                bs = np.zeros(64, dtype=np.int64)
                np.add.at(bs, b, gray)
                cnt = np.bincount(b, minlength=64).astype(np.int64)
                bits = (bs * (w * h) > int(gray.sum()) * cnt)
                lo = int(sum(int(bits[i]) << i for i in range(32)))
                hi = int(sum(int(bits[i + 32]) << i for i in range(32)))
                rows["doc_id"].append(did)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ahash_hi"].append(hi)
                rows["ahash_lo"].append(lo)
                rows["n_set_bits"].append(int(bits.sum()))
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(hashit, schema=AHASH_SCHEMA)


SILENCE_SCHEMA = ("doc_id BIGINT, n_samples BIGINT, n_segments BIGINT, "
                  "longest_silence BIGINT, silent_samples BIGINT")


def audio_silence_segments(df: DataFrame, threshold: int = 256,
                           min_run: int = 16) -> DataFrame:
    """Silence segmentation over REAL parsed waveforms: a silent
    segment is a run of >= ``min_run`` consecutive samples with
    |amplitude| < ``threshold`` — the trim/VAD-lite primitive an audio
    curation pipeline runs before feature extraction (drop dead air,
    split on pauses).  Run-length encoding happens in numpy per Arrow
    batch; only (id, 4 ints) rows shuffle.  All-integer, so a SQL
    oracle rebuilds the exact segments from the waveform formula via
    gaps-and-islands."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_samples", "n_segments",
                                    "longest_silence", "silent_samples")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, s = _decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                mask = (np.abs(s64) < threshold).astype(np.int8)
                edges = np.flatnonzero(np.diff(np.concatenate(
                    ([0], mask, [0]))))
                starts, ends = edges[::2], edges[1::2]
                runs = (ends - starts)
                runs = runs[runs >= min_run]
                rows["doc_id"].append(did)
                rows["n_samples"].append(len(s64))
                rows["n_segments"].append(int(len(runs)))
                rows["longest_silence"].append(
                    int(runs.max()) if len(runs) else 0)
                rows["silent_samples"].append(
                    int(runs.sum()) if len(runs) else 0)
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(seg, schema=SILENCE_SCHEMA)


HIST_SCHEMA = "doc_id BIGINT, bin INT, n_pixels BIGINT"


def intensity_histogram(df: DataFrame, bins: int = 8) -> DataFrame:
    """Per-image intensity histogram over REAL decoded pixels: decode
    the PPM/BMP payload, bucket every channel value into
    ``bins`` equal-width bins (256/bins wide), emit (doc_id, bin,
    n_pixels) — the exposure/contrast profile a vision-data curation
    pass filters on (all-dark, blown-out, and synthetic-flat images
    show up as mass concentrated in one bin).

    numpy bincount per Arrow batch; only (id, bin, count) rows leave
    the executor — payload bytes never shuffle.  Counts are exact
    integers, so the corpus rollup is order-independent and the whole
    report is SQL-oracle-checkable against the pixel generator."""
    width = 256 // bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bs, ns = [], [], []
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                _w, _h, px = _REAL_DECODERS[fmt](bytes(payload))
                counts = np.bincount(px.reshape(-1) // width,
                                     minlength=bins)
                for b in range(bins):
                    if counts[b]:
                        ids.append(did)
                        bs.append(b)
                        ns.append(int(counts[b]))
            yield pd.DataFrame({"doc_id": ids, "bin": bs, "n_pixels": ns})

    return fan_out(df).mapInPandas(hist, schema=HIST_SCHEMA)


# ----------------------------------------------------------------- pHash
_PHASH_GRID = 32      # sampled grid (nearest-neighbor, exact int math)
_PHASH_BLOCK = 8      # low-frequency DCT block kept
_PHASH_SCALE = 14     # cosine fixed-point: round(cos * 2^14)


def phash_basis() -> list[int]:
    """Fixed-point DCT-II cosine basis, row-major ``u * 32 + i``:
    ``round(cos((2i+1) u π / 64) * 2^14)`` for u < 8, i < 32.  Computed
    ONCE here (plain math.cos) and embedded as literals in BOTH the
    numpy operator below and the SQL oracle — the same synchronize-by-
    construction trick as the JL sign matrix and the LSH hyperplanes
    (plans/similarity.py): transcendentals are never evaluated inside
    either engine, so cross-engine bit-exactness needs no float
    contract.  Unscaled DCT-II (no α(u) orthonormal factors): a
    perceptual hash only needs A fixed linear transform, and integer
    weights keep every accumulator exact (|coef| <= 765·2^28·1024
    ≈ 2.1e14 < 2^53 < 2^63)."""
    import math
    return [round(math.cos((2 * i + 1) * u * math.pi
                           / (2 * _PHASH_GRID)) * (1 << _PHASH_SCALE))
            for u in range(_PHASH_BLOCK) for i in range(_PHASH_GRID)]


def image_phash(df: DataFrame) -> DataFrame:
    """DCT perceptual hash (pHash family) over REAL decoded pixels, in
    EXACT integer arithmetic end-to-end: decode the PPM/BMP payload,
    nearest-neighbor-sample a 32×32 grid (x = i·w div 32 — integer
    upsampling for small images, downsampling for large), grayscale as
    the exact channel sum r+g+b, separable fixed-point 8×8 low-band
    DCT-II with the shared :func:`phash_basis` weights, then threshold
    the 63 AC coefficients at their LOWER MEDIAN (32nd smallest —
    deterministic under ties) into a 63-bit BIGINT.  Near-duplicate
    images agree on most bits even across resizes and containers —
    the standard image-dedup fingerprint, unlike ahash robust to
    global brightness ramps because DCT coefficients ignore the DC
    level.

    numpy int64 matmuls per Arrow batch; only (doc_id, phash) leaves
    the executor.  Scale: O(pixels) decode + two 32×8 integer matmuls
    per image, embarrassingly parallel, no shuffle."""
    g, blk = _PHASH_GRID, _PHASH_BLOCK
    basis = np.array(phash_basis(), dtype=np.int64).reshape(blk, g)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hv = [], []
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                w, h, px = _REAL_DECODERS[fmt](bytes(payload))
                xi = (np.arange(g) * w) // g
                yj = (np.arange(g) * h) // g
                gray = px[np.ix_(yj, xi)].astype(np.int64).sum(axis=2)
                coef = basis @ gray.T @ basis.T   # (8, 8) int64, exact
                ac = np.delete(coef.reshape(-1), 0)          # drop DC
                med = np.partition(ac, 31)[31]               # 32nd smallest
                bits = (ac > med).astype(np.int64)
                ids.append(did)
                hv.append(int((bits << np.arange(63)).sum()))
            yield pd.DataFrame({"doc_id": ids, "phash": hv})

    return fan_out(df).mapInPandas(hashes,
                                   schema="doc_id BIGINT, phash BIGINT")


# ------------------------------------------------------- framed DFT audio
_DFT_FRAME = 64       # samples per analysis frame
_DFT_BINS = 8         # frequency bins 1..8 (DC excluded)
_DFT_SCALE = 6        # trig fixed point: round(trig * 2^6)


def dft_basis() -> tuple[list[int], list[int]]:
    """Fixed-point DFT basis for the framed spectrogram, row-major
    ``(b - 1) * 64 + t`` for bins b in 1..8: ``round(cos(2π b t / 64)
    * 2^6)`` and ``round(-sin(2π b t / 64) * 2^6)``.  Python-computed
    once, embedded as literals in BOTH engines (same discipline as
    phash_basis) — and deliberately LOW precision (2^6): with samples
    <= 2048 the per-frame component stays <= 2048·64·64 ≈ 8.4e6, its
    square <= 1.4e14, and the <= 22-frame per-bin energy sum <= 3.1e15
    < 2^53 with ~3x margin — every accumulator exact in int64 AND in
    DuckDB doubles."""
    import math
    cos_t, sin_t = [], []
    for b in range(1, _DFT_BINS + 1):
        for t in range(_DFT_FRAME):
            ang = 2 * math.pi * b * t / _DFT_FRAME
            cos_t.append(round(math.cos(ang) * (1 << _DFT_SCALE)))
            sin_t.append(round(-math.sin(ang) * (1 << _DFT_SCALE)))
    return cos_t, sin_t


def audio_spectrogram_energy(df: DataFrame) -> DataFrame:
    """Framed fixed-point spectrogram energy over REAL parsed WAV
    bytes: walk the RIFF chunks, split the PCM samples into full
    64-sample frames (tail dropped), per frame compute the 8-bin DFT
    with the shared :func:`dft_basis` integer weights, and emit per
    (doc, bin) the exact total energy Σ_frames (re² + im²) — the
    band-energy profile an audio curation pass filters on (silence,
    hum, synthetic tones concentrate mass in telltale bins).

    numpy int64 matmuls per Arrow batch (frames×64 @ 64×8, twice);
    only (doc_id, bin, energy) rows leave the executor.  Every
    accumulator is an exact integer (see dft_basis), so the report is
    SQL-oracle-checkable bit-for-bit against the waveform formula."""
    cos_t, sin_t = dft_basis()
    cb = np.array(cos_t, dtype=np.int64).reshape(_DFT_BINS, _DFT_FRAME).T
    sb = np.array(sin_t, dtype=np.int64).reshape(_DFT_BINS, _DFT_FRAME).T

    def spec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, energies = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = _decode_wav(bytes(payload))
                nf = len(samples) // _DFT_FRAME
                fr = (samples[:nf * _DFT_FRAME].astype(np.int64)
                      .reshape(nf, _DFT_FRAME))
                re = fr @ cb          # (frames, bins) exact int64
                im = fr @ sb
                e = (re * re + im * im).sum(axis=0)
                for b in range(_DFT_BINS):
                    ids.append(did)
                    bins.append(b + 1)
                    energies.append(int(e[b]))
            yield pd.DataFrame({"doc_id": ids, "bin": bins,
                                "energy": energies})

    return fan_out(df).mapInPandas(
        spec, schema="doc_id BIGINT, bin INT, energy BIGINT")


def image_edge_density(df: DataFrame, threshold: int = 256) -> DataFrame:
    """Sobel edge-density over REAL decoded pixels, exact integers
    end-to-end: grayscale as the channel sum r+g+b, 3×3 integer Sobel
    gradients over interior pixels, edge when |gx| + |gy| >= threshold
    — the sharpness/flatness screen a vision curation pass runs
    (synthetic flats and heavy blur score near zero; texture and text
    renders score high).  Emits per doc: interior pixel count, edge
    count, and the exact total gradient magnitude Σ(|gx| + |gy|).

    numpy integer convolution per Arrow batch; |gx| <= 4·765·... every
    per-pixel magnitude <= 8·765·4 and the per-doc sum <= ~2.5e7 —
    nowhere near any exactness edge.  The oracle rebuilds the same
    gradients from the pixel generator via a 9-row kernel join."""
    def edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_int, n_edge, gsum = [], [], [], []
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                w, h, px = _REAL_DECODERS[fmt](bytes(payload))
                g = px.astype(np.int64).sum(axis=2)  # (h, w) gray
                gx = (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                      - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2])
                gy = (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                      - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:])
                mag = np.abs(gx) + np.abs(gy)
                ids.append(did)
                n_int.append(int(mag.size))
                n_edge.append(int((mag >= threshold).sum()))
                gsum.append(int(mag.sum()))
            yield pd.DataFrame({"doc_id": ids, "n_interior": n_int,
                                "n_edges": n_edge,
                                "gradient_total": gsum})

    return fan_out(df).mapInPandas(
        edges, schema=("doc_id BIGINT, n_interior BIGINT, "
                       "n_edges BIGINT, gradient_total BIGINT"))


MOMENTS_SCHEMA = ("doc_id long, channel int, n_px long, "
                  "sum_v long, sum_v2 long")


def color_moments(df: DataFrame) -> DataFrame:
    """Per-image per-channel color moments over REAL decoded pixels:
    exact integer count / sum / sum-of-squares for each RGB channel —
    the color-cast and contrast screen of a vision curation pass (a
    grayscale-duplicated channel shows as three identical moment rows;
    a blown channel as a mean pinned near 255).

    numpy per Arrow batch; only (id, channel, 3 ints) rows leave the
    executor.  All-integer output (v <= 255, v^2 <= 65025, n <= w*h),
    so means/variances derive exactly in SQL and the whole report is
    oracle-checkable against the pixel generator formula."""

    def mom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cs, ns, sv, sv2 = [], [], [], [], []
            for did, fmt, payload in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["payload"]):
                _w, _h, px = _REAL_DECODERS[fmt](bytes(payload))
                for c in range(3):
                    ch = px[:, :, c].astype(np.int64)
                    ids.append(did)
                    cs.append(c)
                    ns.append(int(ch.size))
                    sv.append(int(ch.sum()))
                    sv2.append(int((ch * ch).sum()))
            yield pd.DataFrame({"doc_id": ids, "channel": cs, "n_px": ns,
                                "sum_v": sv, "sum_v2": sv2})

    return fan_out(df).mapInPandas(mom, schema=MOMENTS_SCHEMA)


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PNG twin of :func:`attach_image_payload`: same deterministic
    pixel formula, container = real zlib-compressed PNG bytes — the
    fixture for the codec-format decode path (formerly Pillow-gated;
    the pure-numpy codec above needs only stdlib zlib)."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                flat = (7 * did + np.arange(w * h * 3)) % 256
                payloads.append(_encode_png(w, h, flat.reshape(h, w, 3)))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "fmt": ["png"] * len(ws),
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


def _jpeg_tile_image(did: int) -> tuple[int, int, np.ndarray]:
    """Deterministic 16x16-tile-constant image — the analytically
    tractable class for the lossy JPEG codec: constant tiles make every
    AC coefficient quantize to zero and the DC path exact (DC quant
    step 8 divides the 8·(v-128) DC scale), and tiles span whole MCUs
    in BOTH 4:4:4 and 4:2:0, so the decoded pixels equal the integer
    fixed-point YCbCr round-trip of the generator colors — which a SQL
    oracle replicates term for term."""
    w = 16 * (1 + did % 3)
    h = 16 * (1 + did % 2)
    tw = w // 16
    t = (np.arange(h)[:, None] // 16) * tw + (np.arange(w)[None, :] // 16)
    r = (11 * did + 7 * t) % 256
    g = (23 * did + 13 * t) % 256
    b = (5 * did + 29 * t) % 256
    return w, h, np.stack([r, g, b], axis=-1).astype(np.uint8)


def attach_jpeg_payload(df: DataFrame, id_col: str = "doc_id",
                        both_subsamplings: bool = False) -> DataFrame:
    """JPEG fixture: payload = REAL baseline JFIF bytes (markers,
    Huffman entropy stream, quantized DCT blocks) of the tile-constant
    image for the id, built executor-side.  Default: even ids encode
    4:2:0, odd ids 4:4:4 — both decoder paths exercised across any
    sample.  ``both_subsamplings=True`` emits BOTH encodings per id
    (the cross-subsampling dedup fixture: different bytes, identical
    decoded pixels)."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, px = _jpeg_tile_image(did)
                subs = (("420", "444") if both_subsamplings
                        else (("420",) if did % 2 == 0 else ("444",)))
                for sub in subs:
                    ids.append(did)
                    payloads.append(_encode_jpeg(w, h, px, sub))
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame({"doc_id": ids,
                                "fmt": ["jpeg"] * len(ids),
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


def attach_image_payload_3way(df: DataFrame, offset: int,
                              id_col: str = "doc_id") -> DataFrame:
    """Three-container fixture for cross-codec dedup: container by
    ``(doc_id // offset) % 3`` → ppm / bmp / png, same deterministic
    pixel formula — ids differing by multiples of ``offset`` (itself a
    multiple of 1280, the generator's pixel/size period lcm) carry
    IDENTICAL pictures in three different encodings."""
    src = df.select(F.col(id_col).alias("doc_id"))
    encoders = [("ppm", _encode_ppm), ("bmp", _encode_bmp),
                ("png", _encode_png)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts, ws, hs = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                flat = (7 * did + np.arange(w * h * 3)) % 256
                fmt, enc = encoders[(did // offset) % 3]
                fmts.append(fmt)
                payloads.append(enc(w, h, flat.reshape(h, w, 3)))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fmt": fmts,
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


def attach_tiff_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """TIFF twin of :func:`attach_png_payload` with a RUN-BEARING pixel
    formula — flat[k] = (5·id + k div 24) mod 256 holds each value for
    24 consecutive bytes, so the PackBits strips actually compress
    (literal-only streams would let an RLE bug pass).  Compression
    alternates by id parity (even → none, odd → PackBits), so one
    entry pins both paths; RowsPerStrip=4 exercises strip assembly."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 8) * 4
                h = 8 + (did % 5) * 4
                flat = (5 * did + np.arange(w * h * 3) // 24) % 256
                payloads.append(_encode_tiff(
                    w, h, flat.reshape(h, w, 3).astype(np.uint8),
                    compression=1 if did % 2 == 0 else 32773))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "fmt": ["tiff"] * len(ws),
                                "payload": payloads,
                                "meta_width": ws, "meta_height": hs})

    return src.mapInPandas(
        gen, schema=("doc_id BIGINT, fmt STRING, payload BINARY, "
                     "meta_width INT, meta_height INT"))


MULAW_SCHEMA = ("doc_id BIGINT, n_samples BIGINT, n_codes BIGINT, "
                "sum_code BIGINT, sum_abs_err BIGINT, max_abs_err BIGINT, "
                "n_clipped BIGINT")


def audio_mulaw_stats(df: DataFrame) -> DataFrame:
    """G.711 μ-law companding round-trip over REAL WAV payloads — the
    telephony codec (ITU-T G.711, 1972; public spec) every speech-data
    pipeline meets when ingesting call-center/telephone corpora.  Per
    clip: parse the WAV container, scale the 12-bit fixture samples to
    full 16-bit range (<<4, so the ±32635 clip path is exercised by the
    −32768 extreme), μ-law ENCODE to 8-bit codes, DECODE back, and
    report exact integer stats: code-stream sum + distinct-code count
    (the compressed side), absolute quantization-error sum/max (the
    fidelity side), clipped-sample count.

    Encoder and decoder are the Sun/CCITT reference algorithm (the
    G.711 implementation every toolchain descends from): arithmetic
    >>2 to 14 bits (floors negatives — the detail naive ports get
    wrong), clip 8159, bias 33, segment = #thresholds-passed among
    [63,127,...,8191], mantissa = (p >> (seg+1)) & 15, code =
    (16·seg + mantissa) XOR (0x7F if negative else 0xFF); decode is
    t = ((u&15)·8 + 132) << seg with ±(t−132).  Verified EQUAL to
    stdlib audioop's lin2ulaw/ulaw2lin over the full 16-bit range and
    all 256 codes (a third-party reference, pinned in pytest while
    the module exists); the SQL oracle re-derives the identical
    closed form from the waveform formula, so a wrong shift, bias,
    or clamp anywhere breaks the hash.  Scale: map-only; one 7-int
    row per clip leaves the executor."""
    th14 = np.array([63, 127, 255, 511, 1023, 2047, 4095, 8191],
                    dtype=np.int64)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_samples", "n_codes",
                                   "sum_code", "sum_abs_err",
                                   "max_abs_err", "n_clipped")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, s12 = _decode_wav(bytes(payload))
                s = s12.astype(np.int64) * 16
                p = s >> 2                    # arithmetic: floors negatives
                mask = np.where(p < 0, 0x7F, 0xFF)
                pa = np.abs(p)
                pb = np.minimum(pa, 8159) + 33
                seg = (pb[:, None] > th14[None, :]).sum(axis=1)
                uval = np.where(seg >= 8, 0x7F,
                                (seg << 4) | ((pb >> (seg + 1)) & 0xF))
                code = uval ^ mask
                u = (~code) & 0xFF
                t = (((u & 15) << 3) + 132) << ((u >> 4) & 7)
                dec = np.where(u & 0x80, 132 - t, t - 132)
                err = np.abs(s - dec)
                mraw = pa
                out["doc_id"].append(int(did))
                out["n_samples"].append(int(s.size))
                out["n_codes"].append(int(np.unique(code).size))
                out["sum_code"].append(int(code.sum()))
                out["sum_abs_err"].append(int(err.sum()))
                out["max_abs_err"].append(int(err.max()))
                out["n_clipped"].append(int((mraw > 8159).sum()))
            yield pd.DataFrame(out)

    return fan_out(df).mapInPandas(stats, schema=MULAW_SCHEMA)
