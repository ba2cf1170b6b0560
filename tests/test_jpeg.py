"""Baseline-JPEG decoder goldens: an independent in-test ENCODER
(direct-formula FDCT + T.81 Annex K huffman tables) roundtrips through
``bdq_spark.operators.jpeg.decode_jpeg_pixels``.

Exactness strategy: with UNIT quantization tables a flat-color image is
DC-only and the DC path is lossless, so those roundtrips assert
bit-exact means; random images use the standard quality-90 tables and
assert quantization-bounded error; the decoder's separable IDCT is
cross-checked against the direct O(N^4) textbook formula.
"""

import math
import random
import struct

from bdq_spark.operators.jpeg import ZIGZAG, _idct_2d, decode_jpeg_pixels

# ---- T.81 Annex K huffman specs (public spec constants) ----
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

#: T.81 Annex K luminance quant table (natural order via zigzag below)
QLUM_ZZ = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
]


def _codes(counts, symbols):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _fdct_direct(block):
    """Direct O(N^4) forward DCT — independent of the decoder's
    separable implementation."""
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * math.cos(
                        (2 * y + 1) * u * math.pi / 16
                    ) * math.cos((2 * x + 1) * v * math.pi / 16)
            out[u * 8 + v] = 0.25 * cu * cv * s
    return out


def _cat(v):
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(writer, block, q_nat, pred, dc_codes, ac_codes):
    coef = _fdct_direct([p - 128 for p in block])
    zz = [
        int(round(coef[ZIGZAG[z]] / q_nat[ZIGZAG[z]])) for z in range(64)
    ]
    diff = zz[0] - pred
    t = _cat(diff)
    code, ln = dc_codes[t]
    writer.put(code, ln)
    if t:
        writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((z for z in range(1, 64) if zz[z]), default=0)
    for z in range(1, 64):
        if z > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            writer.put(code, ln)
            break
        v = zz[z]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.put(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return zz[0]


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _dht(cls, tid, spec):
    counts, symbols = spec
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts)
                + bytes(symbols))


def _dqt(tid, q_nat):
    zz = bytes(q_nat[ZIGZAG[z]] for z in range(64))
    return _seg(0xDB, bytes([tid]) + zz)


def encode_jpeg(pixels, w, h, color=False, q_lum=None, q_chr=None,
                restart=0, subsample=(1, 1)):
    """Minimal baseline encoder: grayscale, 4:4:4, or (via
    ``subsample=(2, 2)`` / ``(2, 1)``) 4:2:0 / 4:2:2 YCbCr with
    box-filter chroma downsampling.  ``pixels`` is row-major; gray =
    ints, color = (r, g, b) tuples."""
    q_lum = q_lum or [1] * 64
    q_chr = q_chr or q_lum
    hs, vs = subsample if color else (1, 1)
    if color:
        full = [[], [], []]
        for px in pixels:
            r, g, b = px
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            for i, v in enumerate((y, cb, cr)):
                full[i].append(max(0, min(255, int(round(v)))))
        cw, ch = (w + hs - 1) // hs, (h + vs - 1) // vs
        planes = [(full[0], w, h)]
        for ci in (1, 2):
            sub = []
            for y in range(ch):
                for x in range(cw):
                    acc, cnt = 0, 0
                    for dy in range(vs):
                        for dx in range(hs):
                            sy, sx = y * vs + dy, x * hs + dx
                            if sy < h and sx < w:
                                acc += full[ci][sy * w + sx]
                                cnt += 1
                    sub.append(int(round(acc / cnt)))
            planes.append((sub, cw, ch))
        samps = [(hs, vs), (1, 1), (1, 1)]
    else:
        planes = [(list(pixels), w, h)]
        samps = [(1, 1)]
    ncomp = len(planes)
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)

    def block_of(plane, pw, ph, bx, by):
        out = []
        for yy in range(8):
            sy = min(by * 8 + yy, ph - 1)
            for xx in range(8):
                sx = min(bx * 8 + xx, pw - 1)
                out.append(plane[sy * pw + sx])
        return out

    dc_l, ac_l = _codes(*DC_LUM), _codes(*AC_LUM)
    dc_c, ac_c = _codes(*DC_CHR), _codes(*AC_CHR)
    writer = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                writer.pad()
                writer.out.append(0xFF)
                writer.out.append(0xD0 + (rst % 8))
                rst += 1
                pred = [0] * ncomp
            for ci in range(ncomp):
                plane, pw, ph = planes[ci]
                chs, cvs = samps[ci]
                q = q_lum if ci == 0 else q_chr
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for v in range(cvs):
                    for hb in range(chs):
                        pred[ci] = _encode_block(
                            writer,
                            block_of(plane, pw, ph,
                                     mx * chs + hb, my * cvs + v),
                            q, pred[ci], dc, ac,
                        )
            mcu += 1
    writer.pad()

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q_lum)
    sof_comps = b""
    sos_comps = b""
    if ncomp == 3:
        out += _dqt(1, q_chr)
        for cid, qid, tabs, (sh, sv) in (
            (1, 0, 0x00, samps[0]),
            (2, 1, 0x11, samps[1]),
            (3, 1, 0x11, samps[2]),
        ):
            sof_comps += bytes([cid, (sh << 4) | sv, qid])
            sos_comps += bytes([cid, tabs])
    else:
        sof_comps = bytes([1, 0x11, 0])
        sos_comps = bytes([1, 0x00])
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([ncomp]) + sof_comps)
    out += _dht(0, 0, DC_LUM) + _dht(1, 0, AC_LUM)
    if ncomp == 3:
        out += _dht(0, 1, DC_CHR) + _dht(1, 1, AC_CHR)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _qtable_nat(zz_table, quality=90):
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    nat = [0] * 64
    for z in range(64):
        v = int((zz_table[z] * scale + 50) / 100)
        nat[ZIGZAG[z]] = max(1, min(255, v))
    return nat


def test_idct_batch_bit_identical_to_scalar():
    """The batched numpy IDCT is a vectorization of _idct_2d's exact
    accumulation order, so outputs must match BIT-FOR-BIT (==, not
    approx) — the guarantee that lets the decoder batch without
    changing a single decoded pixel."""
    import numpy as np

    from bdq_spark.operators.jpeg import _idct_batch

    rng = random.Random(11)
    blocks = [[rng.uniform(-2000, 2000) for _ in range(64)]
              for _ in range(17)]
    batched = _idct_batch(np.array(blocks).reshape(-1, 8, 8))
    for n, coef in enumerate(blocks):
        scalar = _idct_2d(coef)
        for y in range(8):
            for x in range(8):
                assert batched[n, y, x] == scalar[y * 8 + x]


def test_idct_matches_direct_formula():
    rng = random.Random(7)
    for _ in range(5):
        coef = [rng.uniform(-500, 500) for _ in range(64)]
        fast = _idct_2d(coef)
        # direct inverse: f(x,y) = 1/4 sum C(u)C(v) F(u,v) cos cos
        for y in range(0, 8, 3):
            for x in range(0, 8, 3):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = math.sqrt(0.5) if u == 0 else 1.0
                        cv = math.sqrt(0.5) if v == 0 else 1.0
                        s += cu * cv * coef[u * 8 + v] * math.cos(
                            (2 * y + 1) * u * math.pi / 16
                        ) * math.cos((2 * x + 1) * v * math.pi / 16)
                assert abs(fast[y * 8 + x] - 0.25 * s) < 1e-6


def test_flat_gray_exact_roundtrip():
    for v in (0, 17, 128, 200, 255):
        jpg = encode_jpeg([v] * (16 * 9), 16, 9)
        d = decode_jpeg_pixels(jpg)
        assert d == {"width": 16, "height": 9, "mean_brightness": float(v)}


def test_flat_color_exact_roundtrip():
    # flat RGB -> flat YCbCr; with q=1 the DC path is lossless, so the
    # decoded RGB equals the decoder's own YCbCr->RGB of the encoded
    # (rounded) YCbCr — computable exactly here
    r, g, b = 200, 30, 99
    y = int(round(0.299 * r + 0.587 * g + 0.114 * b))
    cb = int(round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
    cr = int(round(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
    er = max(0, min(255, int(round(y + 1.402 * (cr - 128)))))
    eg = max(0, min(255, int(round(
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)))))
    eb = max(0, min(255, int(round(y + 1.772 * (cb - 128)))))
    jpg = encode_jpeg([(r, g, b)] * (8 * 8), 8, 8, color=True)
    d = decode_jpeg_pixels(jpg)
    assert d["mean_brightness"] == (er + eg + eb) / 3


def test_random_gray_quality90_tolerance():
    rng = random.Random(99)
    w, h = 24, 16
    px = [rng.randrange(256) for _ in range(w * h)]
    jpg = encode_jpeg(px, w, h, q_lum=_qtable_nat(QLUM_ZZ, 90))
    d = decode_jpeg_pixels(jpg)
    assert (d["width"], d["height"]) == (w, h)
    # random noise is the worst case for JPEG; the MEAN still survives
    # quantization closely even when individual pixels do not
    assert abs(d["mean_brightness"] - sum(px) / len(px)) < 8.0


def test_smooth_color_quality90_tolerance():
    w, h = 24, 24
    px = [((x * 9) % 256, (y * 7) % 256, ((x + y) * 5) % 256)
          for y in range(h) for x in range(w)]
    jpg = encode_jpeg(px, w, h, color=True,
                      q_lum=_qtable_nat(QLUM_ZZ, 90),
                      q_chr=_qtable_nat(QLUM_ZZ, 90))
    d = decode_jpeg_pixels(jpg)
    src_mean = sum(a + b_ + c for a, b_, c in px) / (len(px) * 3)
    assert abs(d["mean_brightness"] - src_mean) < 8.0


def test_restart_markers():
    rng = random.Random(5)
    w, h = 40, 8  # 5 MCUs: restart every 2 exercises RST + pred reset
    px = [rng.randrange(256) for _ in range(w * h)]
    jpg = encode_jpeg(px, w, h, restart=2)
    d = decode_jpeg_pixels(jpg)
    assert (d["width"], d["height"]) == (w, h)
    # q=1 quantizes FDCT floats by round(): near-lossless but not exact
    # for random blocks — the restart path must agree with the
    # no-restart decode of the SAME pixels to sub-pixel precision
    ref = decode_jpeg_pixels(encode_jpeg(px, w, h, restart=0))
    assert abs(d["mean_brightness"] - ref["mean_brightness"]) < 0.5


def test_420_flat_exact_roundtrip():
    # flat color survives box-filter chroma downsampling losslessly, so
    # the 4:2:0 interleave path asserts an EXACT mean (same expectation
    # math as the 4:4:4 flat test)
    r, g, b = 64, 192, 12
    y = int(round(0.299 * r + 0.587 * g + 0.114 * b))
    cb = int(round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
    cr = int(round(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
    er = max(0, min(255, int(round(y + 1.402 * (cr - 128)))))
    eg = max(0, min(255, int(round(
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)))))
    eb = max(0, min(255, int(round(y + 1.772 * (cb - 128)))))
    # 20x12 with 2x2 sampling: 2x1 MCU grid WITH edge-partial MCUs
    jpg = encode_jpeg([(r, g, b)] * (20 * 12), 20, 12, color=True,
                      subsample=(2, 2))
    d = decode_jpeg_pixels(jpg)
    assert (d["width"], d["height"]) == (20, 12)
    assert d["mean_brightness"] == (er + eg + eb) / 3


def test_420_and_422_smooth_tolerance():
    w, h = 32, 24
    px = [((x * 6) % 256, (y * 8) % 256, ((x + y) * 4) % 256)
          for y in range(h) for x in range(w)]
    src_mean = sum(a + b_ + c for a, b_, c in px) / (len(px) * 3)
    for sub in ((2, 2), (2, 1), (1, 2)):
        jpg = encode_jpeg(px, w, h, color=True, subsample=sub,
                          q_lum=_qtable_nat(QLUM_ZZ, 90),
                          q_chr=_qtable_nat(QLUM_ZZ, 90))
        d = decode_jpeg_pixels(jpg)
        assert (d["width"], d["height"]) == (w, h), sub
        assert abs(d["mean_brightness"] - src_mean) < 10.0, sub


def test_420_restart_markers():
    rng = random.Random(11)
    w, h = 48, 16  # 3 MCUs at 2x2 sampling
    px = [(rng.randrange(256),) * 3 for _ in range(w * h)]
    jpg = encode_jpeg(px, w, h, color=True, subsample=(2, 2), restart=1)
    ref = encode_jpeg(px, w, h, color=True, subsample=(2, 2), restart=0)
    d, dref = decode_jpeg_pixels(jpg), decode_jpeg_pixels(ref)
    assert abs(d["mean_brightness"] - dref["mean_brightness"]) < 0.5


def test_refusals():
    jpg = encode_jpeg([5] * 64, 8, 8)
    # progressive: flip SOF0 -> SOF2
    prog = jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None
    # sampling factor above 2: out of profile
    i = jpg.index(b"\xff\xc0")
    sub = bytearray(jpg)
    sub[i + 11] = 0x33  # component 1 sampling factors 3x3
    assert decode_jpeg_pixels(bytes(sub)) is None
    # truncated entropy data
    assert decode_jpeg_pixels(jpg[:-6]) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None


def test_truncated_marker_segments_refused_not_crash():
    """Round-6 ADVICE: truncated MARKER SEGMENTS (not just truncated
    entropy data) used to raise struct.error/IndexError — in
    image_pixel_stats's mapInPandas a single malformed payload would
    fail the whole Spark task instead of yielding decode_ok=false.
    Every case here must return None, never raise."""

    def soi(*segs):
        return b"\xff\xd8" + b"".join(segs)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # SOF0 with a 1-byte body (the reproduced crash: unpack('>HH', seg[1:5]))
    assert decode_jpeg_pixels(soi(seg(0xC0, b"\x08"))) is None
    # SOF0 with 0-byte body (seg[0] IndexError)
    assert decode_jpeg_pixels(soi(seg(0xC0, b""))) is None
    # SOF0 truncated component specs (ncomp says 3, body has 1)
    assert decode_jpeg_pixels(
        soi(seg(0xC0, b"\x08\x00\x08\x00\x08\x03\x01"))) is None
    # empty SOS body (seg[0] IndexError)
    valid_sof = seg(0xC0, b"\x08\x00\x08\x00\x08\x01\x01\x11\x00")
    assert decode_jpeg_pixels(soi(valid_sof, seg(0xDA, b""))) is None
    # SOS truncated scan specs (ns=2, one byte of specs)
    assert decode_jpeg_pixels(soi(valid_sof, seg(0xDA, b"\x02\x01"))) is None
    # truncated 16-bit DQT (prec=1 needs 128 bytes, given 10)
    assert decode_jpeg_pixels(soi(seg(0xDB, b"\x10" + b"\x00" * 10))) is None
    # truncated 8-bit DQT (needs 64, given 20)
    assert decode_jpeg_pixels(soi(seg(0xDB, b"\x00" + b"\x00" * 20))) is None
    # DRI with a 1-byte body
    assert decode_jpeg_pixels(soi(seg(0xDD, b"\x05"))) is None
    # declared segment length shorter than its own 2 length bytes
    assert decode_jpeg_pixels(
        soi(b"\xff\xdb" + struct.pack(">H", 1) + b"\x00" * 4)) is None
    # a truncated segment must also not crash inside mapInPandas-shaped
    # batch decode: exercised via the same pure function, so this is it
