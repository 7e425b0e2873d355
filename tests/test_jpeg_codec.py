"""Baseline-JFIF decoder tests (operators/multimodal.jpeg_decode).

Validation strategy: this container has no media library to produce
reference JPEGs, so the test builds its own minimal baseline ENCODER
(forward DCT + flat quantization + huffman over simple canonical
tables) and asserts the decoder inverts it within the quantization
error bound. The encoder lives here — it is test fixture machinery,
not engine surface. Tables/format follow the public ITU-T T.81 spec.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sql_engine_spark.operators.multimodal import (
    _idct_matrix,
    jpeg_decode,
    media_info,
)


# --- tiny baseline encoder (test fixture) ---------------------------

def _huff_tables():
    """Canonical tables: 12 DC symbols at 4 bits, every possible AC
    run/size symbol at 8 bits (both avoid the reserved all-ones code).
    Returns ({sym: (code, length)}, counts, symbols) per table."""
    dc_syms = list(range(12))
    ac_syms = sorted({(r << 4) | s for r in range(16) for s in range(11)} | {0x00, 0xF0})

    def canonical(syms, length):
        return {sym: (i, length) for i, sym in enumerate(syms)}

    dc = canonical(dc_syms, 4)
    ac = canonical(ac_syms, 8)
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)  # length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # length 8
    return dc, dc_counts, dc_syms, ac, ac_counts, ac_syms


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _mag_bits(v: int):
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _pad8(chan: np.ndarray, mult: int = 8) -> np.ndarray:
    h, w = chan.shape
    return np.pad(chan, ((0, (-h) % mult), (0, (-w) % mult)), mode="edge")


_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _emit_block(w8: _BitWriter, blk: np.ndarray, pred: int, dc, ac) -> int:
    """Forward-DCT one 8x8 spatial block (flat quant) and huffman-code
    it. Returns the new DC predictor."""
    m = _idct_matrix()
    coef = np.round(m @ (blk - 128.0) @ m.T).astype(np.int64).reshape(64)[_ZZ]
    s, bits = _mag_bits(int(coef[0]) - pred)
    code, length = dc[s]
    w8.write(code, length)
    w8.write(bits, s)
    run = 0
    last_nz = max([k for k in range(1, 64) if coef[k]], default=0)
    for k in range(1, last_nz + 1):
        if coef[k] == 0:
            run += 1
            continue
        while run > 15:
            w8.write(*ac[0xF0])
            run -= 16
        s2, b2 = _mag_bits(int(coef[k]))
        w8.write(*ac[(run << 4) | s2])
        w8.write(b2, s2)
        run = 0
    if last_nz < 63:
        w8.write(*ac[0x00])
    return int(coef[0])


def jpeg_encode_444(pixels: np.ndarray, dri: int = 0) -> bytes:
    """Minimal baseline encoder: flat quant (all 1s), 4:4:4, one scan.
    ``pixels`` is (h, w) grayscale or (h, w, 3) RGB uint8. ``dri`` > 0
    emits a DRI segment and RSTn markers every ``dri`` MCUs (exercises
    the decoder's restart path: byte realignment + DC predictor
    reset)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        chans = [pixels.astype(np.float64)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        chans = [y, cb, cr]
    dc, dc_counts, dc_syms, ac, ac_counts, ac_syms = _huff_tables()
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([1] * 64)
    # SOF0
    nc = len(chans)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])  # id, H=V=1, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    dht = bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)
    dht += bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    w8 = _BitWriter()
    preds = [0] * nc
    mcuy, mcux = (h + 7) // 8, (w + 7) // 8
    padded = [_pad8(c) for c in chans]
    # interleaved MCU order (all comps have H=V=1 → one block each)
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                out += w8.flush() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w8 = _BitWriter()
                preds = [0] * nc
            n_mcu += 1
            for ci in range(nc):
                blk = padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _emit_block(w8, blk, preds[ci], dc, ac)
    out += w8.flush()
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_420(pixels: np.ndarray) -> bytes:
    """4:2:0 variant: luma at H=V=2, chroma 2x2-mean-downsampled at
    H=V=1 — exercises the decoder's multi-block MCU ordering and
    nearest-neighbor chroma upsample."""
    h, w = pixels.shape[:2]
    p = pixels.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y16 = _pad8(y, 16)

    def sub(c):
        cp = _pad8(c, 16)
        return cp.reshape(cp.shape[0] // 2, 2, cp.shape[1] // 2, 2).mean(axis=(1, 3))

    cb8, cr8 = sub(cb), sub(cr)
    dc, dc_counts, dc_syms, ac, ac_counts, ac_syms = _huff_tables()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([1] * 64)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)
    dht += bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    w8 = _BitWriter()
    py, pcb, pcr = 0, 0, 0
    for my in range((h + 15) // 16):
        for mx in range((w + 15) // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    py = _emit_block(w8, y16[y0 : y0 + 8, x0 : x0 + 8], py, dc, ac)
            pcb = _emit_block(w8, cb8[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], pcb, dc, ac)
            pcr = _emit_block(w8, cr8[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], pcr, dc, ac)
    out += w8.flush() + b"\xff\xd9"
    return bytes(out)


# --- tests ----------------------------------------------------------

def _test_image(h, w, seed=7):
    rng = np.random.default_rng(seed)
    # smooth gradient + mild noise: realistic DCT energy distribution
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 9.0) + 48 * np.cos(yy / 7.0)
    img = np.clip(base + rng.normal(0, 12, size=(h, w)), 0, 255)
    return np.round(img).astype(np.uint8)


def test_jpeg_roundtrip_grayscale():
    img = _test_image(24, 40)
    data = jpeg_encode_444(img)
    assert media_info(data) == {"format": "jpeg", "width": 40, "height": 24}
    w, h, pix = jpeg_decode(data)
    assert (w, h) == (40, 24)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(24, 40)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() <= 1.5, (err.max(), err.mean())


def test_jpeg_roundtrip_rgb():
    rng = np.random.default_rng(3)
    img = np.stack([_test_image(16, 24, s) for s in (1, 2, 3)], axis=2)
    data = jpeg_encode_444(img)
    w, h, pix = jpeg_decode(data)
    assert (w, h) == (24, 16)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(16, 24, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    # two lossy color conversions + DCT rounding
    assert err.max() <= 8 and err.mean() <= 2.5, (err.max(), err.mean())


def test_jpeg_non_multiple_of_8_dims():
    img = _test_image(13, 19)
    w, h, pix = jpeg_decode(jpeg_encode_444(img))
    assert (w, h) == (19, 13) and len(pix) == 13 * 19


def test_jpeg_constant_image_exact():
    img = np.full((8, 8), 77, dtype=np.uint8)
    w, h, pix = jpeg_decode(jpeg_encode_444(img))
    got = np.frombuffer(pix, dtype=np.uint8)
    assert (got == 77).all()


def test_jpeg_progressive_raises():
    img = _test_image(8, 8)
    data = bytearray(jpeg_encode_444(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(data))


def test_jpeg_truncated_scan_raises():
    img = _test_image(16, 16)
    data = jpeg_encode_444(img)
    with pytest.raises(ValueError):
        jpeg_decode(data[: len(data) // 2])


def test_jpeg_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnope")


def test_jpeg_restart_intervals():
    """DRI/RSTn: the decoder must realign to the byte boundary and
    reset DC predictors at each restart marker."""
    img = _test_image(24, 24, seed=11)
    plain = jpeg_encode_444(img)
    with_rst = jpeg_encode_444(img, dri=2)
    assert with_rst != plain and b"\xff\xd0" in with_rst
    w, h, pix = jpeg_decode(with_rst)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(24, 24)
    ref = np.frombuffer(jpeg_decode(plain)[2], dtype=np.uint8).reshape(24, 24)
    # restart markers change the byte stream, not the pixels
    assert (got == ref).all()


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0: four luma blocks + subsampled chroma per MCU. Luma must
    stay within DCT-rounding error; chroma is 2x2-averaged so compare
    against the downsample-then-replicate reference."""
    img = np.stack([_test_image(24, 40, s) for s in (5, 6, 7)], axis=2)
    data = jpeg_encode_420(img)
    assert media_info(data) == {"format": "jpeg", "width": 40, "height": 24}
    w, h, pix = jpeg_decode(data)
    assert (w, h) == (40, 24)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(24, 40, 3).astype(np.float64)
    p = img.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def ds_us(c):  # what 4:2:0 keeps: 2x2 mean, replicated back up
        cp = np.pad(c, ((0, (-24) % 16), (0, (-40) % 16)), mode="edge")
        d = cp.reshape(cp.shape[0] // 2, 2, cp.shape[1] // 2, 2).mean(axis=(1, 3))
        return np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)[:24, :40]

    cbe, cre = ds_us(cb) - 128.0, ds_us(cr) - 128.0
    ref = np.stack(
        [y + 1.402 * cre, y - 0.344136 * cbe - 0.714136 * cre, y + 1.772 * cbe], axis=2
    )
    err = np.abs(got - np.clip(ref, 0, 255))
    assert err.max() <= 8 and err.mean() <= 2.5, (err.max(), err.mean())


def test_avg_hash_agrees_across_png_and_jpeg(spark):
    """Cross-format near-dup mining: the SAME image encoded as PNG and
    as baseline JPEG must produce near-identical perceptual hashes —
    the property that makes image_dup_pairs container-format-robust.
    Compression error can flip at most a few of the 64 aHash bits."""
    from sql_engine_spark.operators.multimodal import image_avg_hash, png_encode

    img = np.stack([_test_image(32, 32, s) for s in (21, 22, 23)], axis=2)
    png = png_encode(img.tobytes(), 32, 32)
    jpg = jpeg_encode_444(img)
    df = spark.createDataFrame(
        [
            (1, bytearray(png), {"mime": "image/png"}),
            (2, bytearray(jpg), {"mime": "image/jpeg"}),
        ],
        "doc_id long, payload binary, meta map<string,string>",
    )
    rows = {r.id: [r.band0, r.band1, r.band2, r.band3]
            for r in image_avg_hash(df, strict=True).collect()}
    flips = sum(bin(a ^ b).count("1") for a, b in zip(rows[1], rows[2]))
    assert flips <= 4, flips


def test_jpeg_fill_bytes_between_segments():
    """T.81 B.1.1.2: any marker may be preceded by extra 0xFF fill
    bytes; real camera files contain them. Inject some before SOF/SOS
    and assert identical pixels."""
    img = _test_image(16, 16, seed=13)
    data = jpeg_encode_444(img)
    filled = data.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda", 1
    )
    assert filled != data
    assert jpeg_decode(filled) == jpeg_decode(data)


def test_jpeg_fill_bytes_inside_scan_before_eoi():
    """T.81 B.1.1.2 again, but INSIDE the entropy-coded scan: EOI may
    be preceded by 0xFF fill bytes (FF FF D9 padding — real encoders
    emit it). The header-loop tolerance alone did not cover this
    (ADVICE r7): the scan-extraction loop must also skip them."""
    img = _test_image(16, 16, seed=29)
    data = jpeg_encode_444(img)
    assert data[-2:] == b"\xff\xd9"
    padded = data[:-2] + b"\xff\xff" + data[-2:]
    assert jpeg_decode(padded) == jpeg_decode(data)


def test_jpeg_non_integer_sampling_ratio_raises():
    """A stream mixing H=V=3 luma with H=V=2 chroma has a 3:2
    luma/chroma ratio — valid JPEG, but np.repeat-based upsampling
    cannot express it. Must raise a TYPED NotImplementedError (into
    the x69 quarantine taxonomy), not an opaque np.stack shape error
    (ADVICE r7)."""
    img = np.stack([_test_image(16, 16, s) for s in (31, 32, 33)], axis=2)
    data = jpeg_encode_420(img)
    patched = data.replace(bytes([1, 0x22, 0]), bytes([1, 0x33, 0]), 1).replace(
        bytes([2, 0x11, 0]), bytes([2, 0x22, 0]), 1
    )
    assert patched != data
    with pytest.raises(NotImplementedError, match="sampling ratio"):
        jpeg_decode(patched)
