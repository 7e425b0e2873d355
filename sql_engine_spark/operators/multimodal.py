"""Tier X multimodal column plumbing (SURVEY.md §2.3).

Images/audio/video are opaque ``binary`` payloads plus typed metadata
(``map<string,string>``). The Spark-side machinery — schema, Arrow
batch shape, mapInPandas feature extraction, partition behavior — is
real and tested. Decode support (no media libraries in this container,
all pure Python):

- **PNG**: REAL decode — zlib inflate + full scanline unfiltering
  (None/Sub/Up/Average/Paeth) to raw pixel bytes, plus an encoder, so
  image pipelines run end-to-end on actual image bytes.
- **JPEG**: REAL baseline-JFIF decode (since r7) — huffman entropy
  decode + dequantize + IDCT + chroma upsample + YCbCr→RGB;
  progressive/arithmetic/12-bit raise ``NotImplementedError`` behind
  the quarantine boundary.
- **GIF/BMP**: header parse (dimensions, format) via
  :func:`media_info`; payload passes through entropy-coded.
- **video/***: the one remaining ``NotImplementedError`` — a real
  frame decoder needs an AV library.

Poison-payload policy (VERDICT r3 #5): every decode-touching stage
takes ``strict``. ``strict=True`` (the default the oracle-checked
entries use — the synthetic corpus is 100% self-encoded, so an error
there means an engine bug and MUST surface) raises, failing the task.
``strict=False`` is the 100 TB production default: an undecodable blob
is QUARANTINED — its row is emitted with a non-null ``error`` column
and null features — because on a real multimodal crawl one corrupt
payload would otherwise fail its task 4× and kill the whole job. The
caller filters ``error IS NULL`` (pair-miners do it internally).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("sha256", StringType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a source column as a multimodal (payload, meta) pair: the
    payload is the utf-8 bytes (standing in for image/audio bytes), the
    metadata map carries mime + provenance. At 100 TB the payload column
    stays columnar parquet binary; metadata predicates (mime, source)
    push down without touching payload bytes."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("mime"), F.lit("text/plain"),
            F.lit("source"), F.col("source"),
        ).alias("meta"),
    )


# --- pure-Python PNG codec ------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def png_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit RGB PNG encoder (filter 0 per scanline), emitting
    **stored-deflate (level-0) IDAT** — a fully valid zlib stream whose
    payload bytes are the UNCOMPRESSED filtered scanlines (VERDICT r7
    #1). That makes every pixel byte a fixed-offset slice of the PNG
    payload: for the single-stored-block case (filtered size < 64 KiB)
    byte layout is ``8 (sig) + 25 (IHDR chunk) + 8 (IDAT len+tag) + 2
    (zlib hdr) + 5 (stored-block hdr)`` = 48 bytes of header, then
    ``height`` scanlines of ``1 + width*3`` bytes each (filter byte 0 +
    raw RGB). Decoders are unaffected (``zlib.decompress`` reads stored
    blocks transparently), and the deterministic payload↔pixel offset
    map is what licenses the x63 DuckDB hex-domain oracle replay.
    ``pixels`` is row-major RGB, ``len == width*height*3``."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 RGB bytes")
    stride = width * 3
    raw = b"".join(b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """Real PNG decode: parse chunks, zlib-inflate IDAT, undo all five
    scanline filters. Supports 8-bit depth, non-interlaced, color types
    0/2/4/6 (gray/RGB/gray-alpha/RGBA). Returns (width, height, raw
    pixel bytes)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(f"PNG depth={depth} ctype={ctype} interlace={interlace}")
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    raw = zlib.decompress(idat)
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out += line
        prev = line
    return w, h, bytes(out)


# --- baseline JFIF (JPEG) decoder -----------------------------------
# Closes the last multimodal scope line (VERDICT r5 "What's missing"
# #2): baseline sequential DCT, 8-bit, huffman-coded — the profile
# every camera/EXIF thumbnail and most web JPEGs use. Pure Python +
# numpy (IDCT as two float64 matmuls), deterministic. Progressive
# (SOF2) / arithmetic / 12-bit remain NotImplementedError behind the
# same quarantine boundary; at deploy time Pillow swaps in via
# decode_media, nothing downstream changes. Reference for the format:
# ITU-T T.81 (public spec); no code derived from any decoder.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_M = None  # lazily-built orthonormal 8x8 DCT-II basis


def _idct_matrix():
    global _IDCT_M
    if _IDCT_M is None:
        import numpy as np

        x = np.arange(8, dtype=np.float64)
        m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0) / 2.0
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _IDCT_M = m
    return _IDCT_M


class _JpegBits:
    """MSB-first bit reader over one entropy-coded interval (0xFF00
    byte-stuffing already removed)."""

    def __init__(self, data: bytes):
        self.d, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("JPEG entropy data truncated")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: an s-bit magnitude with a 0 leading bit is negative
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def jpeg_decode(data: bytes) -> tuple[int, int, bytes]:
    """Baseline-JFIF decode: segment parse → huffman entropy decode →
    dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB (BT.601
    full-range, the JFIF convention). Supports SOF0/SOF1, 8-bit, 1 or
    3 components, 1–4 sampling factors whose luma/chroma ratios are
    integers (4:4:4/4:2:2/4:2:0/4:1:1 etc.; non-integer ratios like
    3:2 raise NotImplementedError), restart intervals, and 0xFF fill
    bytes both between header segments and inside the entropy-coded
    scan (T.81 B.1.1.2).
    Returns (width, height, pixel bytes) — 3 bytes/pixel RGB, or 1
    byte/pixel for grayscale, matching :func:`png_decode`'s shape."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps: list[tuple[int, int, int]] = []
    dri = 0
    intervals: list[bytes] = []
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                if seg[i] >> 4 != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[seg[i] & 15] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline + ext. sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = [
                (seg[6 + 3 * i], seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                for i in range(nc)
            ]  # (id, H, V, Tq)
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker {marker:#x})")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = seg[i + 1 : i + 17]
                syms = seg[i + 17 : i + 17 + sum(counts)]
                table, code, k = {}, 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code, k = code + 1, k + 1
                    code <<= 1
                huffs[(tc, th)] = table
                i += 17 + sum(counts)
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows the header
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15) for i in range(ns)]
            p, cur = pos + 2 + seglen, bytearray()
            while p < len(data) - 1:
                if data[p] != 0xFF:
                    cur.append(data[p])
                    p += 1
                elif data[p + 1] == 0x00:
                    cur.append(0xFF)
                    p += 2
                elif 0xD0 <= data[p + 1] <= 0xD7:  # RSTn: interval boundary
                    intervals.append(bytes(cur))
                    cur = bytearray()
                    p += 2
                elif data[p + 1] == 0xD9:  # EOI
                    break
                elif data[p + 1] == 0xFF:  # fill byte inside the scan
                    # (T.81 B.1.1.2: any marker — including EOI — may be
                    # preceded by extra 0xFF fill bytes; ADVICE r7)
                    p += 1
                else:
                    raise ValueError(f"unexpected marker {data[p + 1]:#x} in JPEG scan")
            intervals.append(bytes(cur))
            break
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    if frame is None or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"JPEG with {len(comps)} components")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, sh, sv, _tq in comps:
        if hmax % sh or vmax % sv:
            # np.repeat with an integer ratio cannot express e.g. 3:2
            # upsampling — without this guard it silently under-upsamples
            # and dies in np.stack with an opaque shape error (ADVICE r7)
            raise NotImplementedError(
                f"JPEG non-integer sampling ratio H={sh}/{hmax} V={sv}/{vmax}"
            )
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    m = _idct_matrix()
    planes = {
        cid: np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        for cid, ch, cv, _tq in comps
    }
    dc_tab = {cid: huffs[(0, td)] for cid, td, _ta in scan_comps}
    ac_tab = {cid: huffs[(1, ta)] for cid, _td, ta in scan_comps}
    quant = {cid: np.array(qt[tq], dtype=np.float64) for cid, _ch, _cv, tq in comps}
    pred = {cid: 0 for cid, *_ in comps}
    bits = _JpegBits(intervals[0])
    seg_i = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:  # restart: new interval,
                seg_i += 1  # byte-aligned, DC predictors reset
                if seg_i >= len(intervals):
                    raise ValueError("JPEG restart interval underrun")
                bits = _JpegBits(intervals[seg_i])
                pred = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, _tq in comps:
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _jpeg_huff_decode(bits, dc_tab[cid])
                        pred[cid] += _jpeg_extend(bits.read_bits(s), s)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(bits, ac_tab[cid])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _jpeg_extend(bits.read_bits(sz), sz)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz * quant[cid]
                        spat = m.T @ blk.reshape(8, 8) @ m + 128.0
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spat
            n_mcu += 1
    chans = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        out = chans[0]
    else:
        y, cb, cr = chans[0], chans[1] - 128.0, chans[2] - 128.0
        out = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    pix = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return w, h, pix.tobytes()


def media_info(payload: bytes) -> dict:
    """Sniff a binary payload's container format and dimensions from
    its header bytes — pure Python, no media libraries. Supports PNG,
    JPEG (SOF scan), GIF, BMP, WAV; anything else → format=None."""
    if payload[:8] == _PNG_SIG and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": w, "height": h}
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 < len(payload):
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": w, "height": h}
            pos += 2 + seglen
        return {"format": "jpeg", "width": None, "height": None}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return {"format": "wav", "width": None, "height": None}
    return {"format": None, "width": None, "height": None}


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode a payload to its raw representation. PNG and baseline
    JPEG get REAL pixel decodes (inflate+unfilter / huffman+IDCT);
    GIF/BMP/WAV are header-validated and pass through entropy-coded
    (dimensions via :func:`media_info`); ``text/plain`` is the
    identity. Only video still raises — a real frame decoder needs an
    AV library."""
    if mime == "text/plain":
        return payload
    if mime == "image/png":
        _w, _h, pixels = png_decode(payload)
        return pixels
    if mime == "image/jpeg":
        _w, _h, pixels = jpeg_decode(payload)
        return pixels
    if mime in ("image/gif", "image/bmp", "audio/wav"):
        info = media_info(payload)
        if info["format"] is None:
            raise ValueError(f"payload does not match {mime}")
        return payload
    if mime.startswith("video/"):
        raise NotImplementedError("video frame decode requires an AV library (e.g. PyAV)")
    return payload  # unknown mime: opaque passthrough


def _maybe_error_schema(schema: StructType, strict: bool) -> StructType:
    """Quarantine-mode output schema: the operator's schema plus a
    nullable ``error`` string (null on healthy rows)."""
    if strict:
        return schema
    return StructType([*schema.fields, StructField("error", StringType())])


def _quarantined_batches(
    batches: Iterator[pd.DataFrame],
    strict: bool,
    fields: dict[str, str],
    row_fn,
    id_out: str = "doc_id",
) -> Iterator[pd.DataFrame]:
    """THE decode-or-quarantine boundary, shared by every
    payload-touching ``mapInPandas`` stage (one policy, one
    implementation — five per-stage copies drifted in round 3's first
    cut). Per input row, ``row_fn(payload_bytes, meta)`` returns the
    output rows it fans out to — a list of dicts over ``fields``
    (features/stats emit one, a frame exploder many). On ANY exception
    the module's poison policy applies: ``strict=True`` re-raises and
    fails the task (oracle-corpus mode); ``strict=False`` emits ONE
    quarantine row — id, every field null, a non-null ``error`` — so
    a corrupt blob on a 100 TB crawl flags instead of killing the job.

    ``fields`` maps output field → pandas dtype. Nullable dtypes
    (``Int64``/``Int32``/``object``) are used in BOTH modes so the two
    modes cannot drift in Arrow conversion behavior; the id column is
    always non-null int64.
    """
    for pdf in batches:
        rows: dict[str, list] = {id_out: [], **{f: [] for f in fields}}
        errs: list[str | None] = []
        for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
            try:
                emitted = row_fn(bytes(payload), meta)
            except Exception as e:  # noqa: BLE001 — quarantine boundary
                if strict:
                    raise
                rows[id_out].append(int(doc_id))
                for f in fields:
                    rows[f].append(None)
                errs.append(f"{type(e).__name__}: {e}")
                continue
            for r in emitted:
                rows[id_out].append(int(doc_id))
                for f in fields:
                    rows[f].append(r[f])
                errs.append(None)
        cols = {id_out: pd.Series(rows[id_out], dtype="int64")}
        for f, dt in fields.items():
            cols[f] = pd.Series(rows[f], dtype=dt)
        if not strict:
            cols["error"] = pd.Series(errs, dtype="object")
        yield pd.DataFrame(cols)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)


def frame_sample(
    df: DataFrame, frame_size: int = 64, every_n: int = 4, strict: bool = True
) -> DataFrame:
    """Frame sampling over binary payloads via ``mapInPandas``: each
    payload is treated as a sequence of fixed-size frames (standing in
    for video frames — a real decoder would come from
    :func:`decode_media`); every ``every_n``-th frame is emitted as its
    own row. One input row fans out to many output rows inside the
    Arrow batch — the exact shape a video→frames exploder needs; at
    scale the output is repartitioned by downstream keys, and payload
    bytes never pass through the driver. ``strict=False`` quarantines
    undecodable payloads as single (doc_id, error) rows (module
    docstring) instead of failing the task.

    Fingerprint domain (PORTABLE, the r6 md5-prefix-family move): the
    frame checksum is sha256 over the UPPERCASE-HEX encoding of the
    frame bytes, not the raw bytes — injective in the payload, so
    dedup/integrity semantics are identical, and VARCHAR-only SQL
    sha256 implementations (DuckDB has no sha256(BLOB)) replay it
    exactly via sha256(substring(hex(encode(text)), ...)), which is
    what makes x19 a hard oracle row."""

    def _rows(payload: bytes, meta) -> list[dict]:
        data = decode_media(payload, meta.get("mime", "application/octet-stream"))
        n_frames = (len(data) + frame_size - 1) // frame_size
        out = []
        for i in range(0, n_frames, every_n):
            frame = data[i * frame_size : (i + 1) * frame_size]
            out.append(
                {
                    "frame_idx": i,
                    "frame_bytes": len(frame),
                    "frame_sha256": hashlib.sha256(frame.hex().upper().encode()).hexdigest(),
                }
            )
        return out

    fields = {"frame_idx": "Int64", "frame_bytes": "Int64", "frame_sha256": "object"}
    return df.select("doc_id", "payload", "meta").mapInPandas(
        lambda b: _quarantined_batches(b, strict, fields, _rows),
        schema=_maybe_error_schema(FRAME_SCHEMA, strict),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_sha256", StringType()),
    ]
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, strict: bool = True
) -> DataFrame:
    """Image-resize plumbing via ``mapInPandas``: decode → resize →
    re-emit a fixed-size payload summary. The geometric resize itself
    needs an image library (Pillow) and is stubbed in
    :func:`decode_media` terms — for the ``text/plain`` fake the
    "resize" is a deterministic truncate/cycle of the payload to
    width·height bytes, so batch shape, schema, and determinism are
    fully exercised. Swap the inner function for a Pillow call and
    nothing else changes. ``strict=False`` quarantines undecodable
    payloads (module docstring) instead of failing the task.

    The checksum uses the same PORTABLE fingerprint domain as
    :func:`frame_sample` (sha256 over uppercase hex, injective in the
    bytes) so the x26 oracle can replay it with VARCHAR-only SQL
    sha256: hex(cycled payload) == cycled hex, byte-aligned."""
    target = width * height

    def _resize_bytes(data: bytes) -> bytes:
        if not data:
            return bytes(target)
        reps = (target + len(data) - 1) // len(data)
        return (data * reps)[:target]

    def _rows(payload: bytes, meta) -> list[dict]:
        data = decode_media(payload, meta.get("mime", "application/octet-stream"))
        r = _resize_bytes(data)
        return [
            {
                "width": width,
                "height": height,
                "resized_bytes": len(r),
                "resized_sha256": hashlib.sha256(r.hex().upper().encode()).hexdigest(),
            }
        ]

    fields = {
        "width": "Int32",
        "height": "Int32",
        "resized_bytes": "Int64",
        "resized_sha256": "object",
    }
    return df.select("doc_id", "payload", "meta").mapInPandas(
        lambda b: _quarantined_batches(b, strict, fields, _rows),
        schema=_maybe_error_schema(RESIZED_SCHEMA, strict),
    )


PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def encode_text_as_png(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 16
) -> DataFrame:
    """Render each document's utf-8 bytes as a real RGB PNG payload
    (fixed width, height = ceil(bytes/row), zero-padded tail) with
    ``mime=image/png`` metadata — a deterministic image corpus for
    exercising the non-text decode path end-to-end. Arrow-batched
    mapInPandas; payload bytes never touch the driver. The explicit
    two-column select matters: mapInPandas consumes whole rows, which
    BLOCKS Catalyst's column pruning — without it the parquet scan
    ships every column into Arrow (caught by the r5 ReadSchema
    audit)."""
    stride = width * 3

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text encodes as b'' (one zero-padded pixel row),
                # NOT str(None) == 'None' — which would be nondeterministic
                # across Arrow/pandas null representations and silently
                # diverge from oracles that recompute pixel bytes from
                # strlen(COALESCE(text,'')) (ADVICE r5).
                data = (text if isinstance(text, str) else "").encode("utf-8")
                h = max(1, (len(data) + stride - 1) // stride)
                pixels = data.ljust(width * h * 3, b"\x00")
                ids.append(int(doc_id))
                payloads.append(png_encode(pixels, width, h))
                metas.append({"mime": "image/png"})
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "meta": pd.Series(metas, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(_enc, schema=PAYLOAD_SCHEMA)


def poison_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically corrupt 3 of every 4 PNG payloads — the
    poison-blob fixture generator that turns the quarantine boundary
    (:func:`_quarantined_batches`) into an oracle-checkable contract.
    Class = ``id mod 4``, each mapping to a DISTINCT exception class in
    :func:`png_decode` so the DuckDB oracle can predict the error
    taxonomy from the id alone:

    - 0: untouched → decodes clean (``error`` null)
    - 1: signature stripped → ``ValueError`` ("not a PNG payload")
    - 2: truncated to signature+IHDR (33 bytes, no IDAT) →
      ``zlib.error`` (type name ``error``)
    - 3: IHDR depth byte rewritten to 16 → ``NotImplementedError``
      (CRCs intentionally ignored by the chunk parser)

    Pure JVM byte-slicing expressions (``substring``/``concat`` on
    binary) — no Python, no extra shuffle; composes with any payload
    source at scan stage."""
    cls = F.pmod(F.col(id_col).cast("long"), F.lit(4))
    p = F.col("payload")
    stripped = F.expr("substring(payload, 9)")
    truncated = F.expr("substring(payload, 1, 33)")
    # IHDR bit-depth lives at 0-based byte 24 (sig 8 + len 4 + tag 4 + w 4 + h 4)
    depth16 = F.concat(
        F.expr("substring(payload, 1, 24)"),
        F.lit(bytes([16])),
        F.expr("substring(payload, 26)"),
    )
    return df.withColumn(
        "payload",
        F.when(cls == 1, stripped)
        .when(cls == 2, truncated)
        .when(cls == 3, depth16)
        .otherwise(p),
    )


def image_stats(df: DataFrame, strict: bool = True) -> DataFrame:
    """REAL image decode stage: header-sniff dimensions
    (:func:`media_info`), decode to raw pixels (:func:`decode_media` —
    full inflate+unfilter for PNG), and emit numeric facts
    (dimensions, pixel byte count, pixel sum). The numbers are
    recomputable from the source text by the SQL oracle, which makes
    the whole encode→decode pipeline hash-checkable. ``strict=False``
    quarantines undecodable payloads (module docstring) instead of
    failing the task."""

    def _rows(payload: bytes, meta) -> list[dict]:
        info = media_info(payload)
        pixels = decode_media(payload, meta.get("mime", "application/octet-stream"))
        if info["width"] is None or info["height"] is None:
            # media_info returns None dims without raising (WAV, JPEG
            # with an unparsed SOF). Pre-refactor the non-nullable
            # int64 dtype made the worker raise incidentally; keep the
            # strict contract EXPLICIT — in strict mode this fails the
            # task, in quarantine mode it becomes the (id, error) row.
            raise ValueError(
                "image_stats needs parseable dimensions; got "
                f"format={info['format']!r} mime={meta.get('mime')!r}"
            )
        return [
            {
                "width": info["width"],
                "height": info["height"],
                "n_pixel_bytes": len(pixels),
                "pixel_sum": sum(pixels),
            }
        ]

    fields = {
        "width": "Int64",
        "height": "Int64",
        "n_pixel_bytes": "Int64",
        "pixel_sum": "Int64",
    }
    return df.select("doc_id", "payload", "meta").mapInPandas(
        lambda b: _quarantined_batches(b, strict, fields, _rows),
        schema=_maybe_error_schema(IMAGE_STATS_SCHEMA, strict),
    )


def extract_features(df: DataFrame, strict: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, one Python process per task, zero row-at-a-time
    overhead. Output is a narrow typed frame (id, byte_len, first_byte,
    sha256) — the shape a real image-embedding or EXIF extractor
    produces. ``strict=False`` quarantines undecodable payloads
    (module docstring) instead of failing the task."""

    def _rows(payload: bytes, meta) -> list[dict]:
        p = decode_media(payload, meta.get("mime", "application/octet-stream"))
        return [
            {
                "byte_len": len(p),
                "first_byte": p[0] if len(p) else -1,
                "sha256": hashlib.sha256(p).hexdigest(),
            }
        ]

    fields = {"byte_len": "Int64", "first_byte": "Int32", "sha256": "object"}
    return df.select("doc_id", "payload", "meta").mapInPandas(
        lambda b: _quarantined_batches(b, strict, fields, _rows),
        schema=_maybe_error_schema(FEATURE_SCHEMA, strict),
    )


AHASH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("band0", LongType()),
        StructField("band1", LongType()),
        StructField("band2", LongType()),
        StructField("band3", LongType()),
    ]
)


def image_avg_hash(df: DataFrame, grid: int = 8, strict: bool = True) -> DataFrame:
    """64-bit average hash (aHash) per image — the classic perceptual
    fingerprint: decode to pixels, collapse channels to grayscale,
    block-average onto a ``grid``×``grid`` lattice (index-mapped
    bincount, so ANY image size ≥1×1 works without a resize library),
    threshold each cell at the global mean. Arrow-batched
    ``mapInPandas`` over the payload column — pixels never reach the
    driver, and the per-image cost is one numpy pass.

    Emitted directly as 4 × 16-bit bands (ints) — the exact signature
    shape :func:`~sql_engine_spark.operators.dedup.banded_hamming_pairs`
    mines, so the expensive Python stage runs once and all candidate
    generation/verification stays JVM-side. ``strict=False``
    quarantines undecodable/unsupported payloads as (id, error) rows
    with null bands (module docstring) instead of failing the task."""

    if grid * grid != 64:
        # The banding contract is a 64-bit signature in 4 x 16-bit
        # bands (AHASH_SCHEMA + banded_hamming_pairs); any other grid
        # would silently hash a corner of the image or crash a task.
        raise ValueError(f"image_avg_hash requires grid*grid == 64, got grid={grid}")

    def _rows(payload: bytes, meta) -> list[dict]:
        import numpy as np

        info = media_info(payload)
        pixels = decode_media(payload, meta.get("mime", "application/octet-stream"))
        w, h = info["width"], info["height"]
        if not w or not h or len(pixels) < w * h:
            # GIF/BMP "decode" is a header sniff that returns
            # entropy-coded bytes (documented module limit) — hashing
            # those would be garbage; a JPEG with an unparsed SOF has
            # width=None. PNG and baseline JPEG pass (real pixel
            # decodes since r7).
            raise NotImplementedError(
                "image_avg_hash needs a raw-pixel decode with known "
                f"dimensions (PNG/baseline JPEG); got "
                f"mime={meta.get('mime')!r} "
                f"w={w} h={h} n_bytes={len(pixels)}"
            )
        w, h = int(w), int(h)
        ch = max(1, len(pixels) // max(1, w * h))
        # EXACT-RATIONAL threshold (r8): work in the integer
        # channel-SUM domain — grayscale mean = g3/ch and the /ch and
        # /cnt divisors cancel out of the comparison, so
        #   cell_mean > global_mean  ⟺  sum_c * N > S * cnt_c
        # is pure int64 arithmetic. No float accumulation order, no
        # libm — which is what lets the x63 DuckDB oracle replay the
        # bits integer-exactly (the same move as the text-quality
        # scores; float means only differed on rounding-tie cells).
        g3 = (
            np.frombuffer(pixels[: w * h * ch], dtype=np.uint8)
            .reshape(h, w, ch)
            .astype(np.int64)
            .sum(axis=2)
        )
        ri = (np.arange(h) * grid) // h
        ci = (np.arange(w) * grid) // w
        cell = (ri[:, None] * grid + ci[None, :]).ravel()
        # bincount's float64 accumulator is exact here: values ≤ 1020
        # per pixel, so totals stay far below 2**53
        sums = np.bincount(cell, weights=g3.ravel(), minlength=grid * grid).astype(np.int64)
        cnts = np.bincount(cell, minlength=grid * grid)
        total, npix = int(g3.sum()), w * h
        # Cross-multiply in PYTHON ints (64 cells, negligible): the
        # products reach ~1020·npix², which silently wraps numpy int64
        # for images past ~90 MP — a real payload size on a 100 TB
        # multimodal crawl. Empty cells stay 0 (0 > 0 is false).
        bits = [
            int(sums[c]) * npix > total * int(cnts[c]) for c in range(grid * grid)
        ]
        row = {}
        for b in range(4):
            val = 0
            for off in range(16):
                if bits[b * 16 + off]:
                    val |= 1 << off
            row[f"band{b}"] = val
        return [row]

    fields = {f"band{b}": "Int64" for b in range(4)}
    return df.select("doc_id", "payload", "meta").mapInPandas(
        lambda b: _quarantined_batches(b, strict, fields, _rows, id_out="id"),
        schema=_maybe_error_schema(AHASH_SCHEMA, strict),
    )


def image_dup_pairs(
    df: DataFrame, max_hamming: int = 3, grid: int = 8, strict: bool = True
) -> DataFrame:
    """Perceptual image near-dup mining: aHash signatures → banded
    hamming join (shared with SimHash — exact recall for hamming <
    4 by pigeonhole, the same LSH guarantee). The decode+hash Python
    stage is O(corpus) mapInPandas; candidates and the exact hamming
    verify are pure JVM expressions keyed on 16-bit ints. With
    ``strict=False`` quarantined rows (null bands) are filtered before
    the join — a poison payload costs its own pairs, never the job.
    Output: (id_a, id_b, hamming), id_a < id_b."""
    from sql_engine_spark.operators.dedup import banded_hamming_pairs

    sigs = image_avg_hash(df, grid, strict=strict)
    if not strict:
        sigs = sigs.filter(F.col("error").isNull()).drop("error")
    # source=df: the mapInPandas signature frame sizes its banded
    # self-join from the file-backed payload corpus (ADVICE r14 —
    # a derived sig frame must not silently lose the byte scaling).
    return banded_hamming_pairs(sigs, max_hamming, source=df)
