"""Pure-Python baseline JPEG decoder (ITU-T T.81 sequential DCT).

The last compressed IMAGE format this engine stubbed: BMP is raw, PNG is
zlib (stdlib), GIF is LZW (pure Python) — JPEG needs huffman + IDCT,
both implementable exactly in Python with no codec library.  This
module decodes baseline sequential JPEGs (the overwhelmingly common
variant) — entropy decode scalar (huffman positions are inherently
serial; an 8-bit peek table resolves most symbols in one lookup), then
IDCT / level shift / upsampling / color conversion batched in numpy
with bit-identical arithmetic (see :func:`_idct_batch`).  Still not
production-speed — the point is an HONEST, verifiable reference decode
for the multimodal pipeline's ``image_pixel_stats`` at test/oracle
scale, with the same refusal contract as the other decoders: anything
outside the supported profile returns ``None``, never a guess.

Supported profile:

- SOF0 baseline sequential, 8-bit precision;
- grayscale (1 component) and YCbCr with sampling factors 1 or 2 per
  axis — the general T.81 interleaved MCU, covering 4:4:4, 4:2:2 AND
  4:2:0 (the dominant real-world layout); subsampled chroma upsampled
  by nearest-neighbour replication;
- restart intervals (DRI/RSTn), 0xFF00 byte stuffing.

Refused: progressive (SOF2), arithmetic coding, 12-bit precision,
sampling factors above 2, truncated streams.

Verification strategy (``tests/test_jpeg.py``): an independent in-test
ENCODER (FDCT + quantize + huffman with the T.81 Annex K tables);
flat-color images with unit quant tables roundtrip BIT-EXACTLY (a
constant block is DC-only and the DC path is lossless with q=1), random
images roundtrip within quantization tolerance, and the fast separable
IDCT here is cross-checked against the direct O(N^4) textbook formula
on random coefficient blocks.
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["decode_jpeg_pixels", "encode_flat_jpeg"]

#: zigzag scan order: zigzag index -> (row, col) natural index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# precomputed C(u) * cos((2x+1) u pi / 16) table for the separable IDCT
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for u in range(8)
    ]
    for x in range(8)
]


_COS_NP = np.array(_COS)  # (x, u) orientation, identical values


def _idct_batch(coefs: "np.ndarray") -> "np.ndarray":
    """Batched separable 2-D inverse DCT over ``(N, 8, 8)`` coefficient
    blocks.  Accumulates the eight ``u`` terms in the same left-to-right
    order as :func:`_idct_2d`'s chained additions, with element-wise
    IEEE multiplies, so the output is BIT-IDENTICAL to running
    ``_idct_2d`` per block (asserted in ``tests/test_jpeg.py``) — this
    is vectorization of the loop, not a numerically different IDCT."""
    M = _COS_NP
    # rows: tmp[n, y, x] = sum_u coefs[n, y, u] * M[x, u]
    tmp = coefs[:, :, 0, None] * M[:, 0]
    for u in range(1, 8):
        tmp = tmp + coefs[:, :, u, None] * M[:, u]
    # cols: out[n, y, x] = 0.25 * sum_u M[y, u] * tmp[n, u, x]
    acc = M[:, 0][None, :, None] * tmp[:, 0, :][:, None, :]
    for u in range(1, 8):
        acc = acc + M[:, u][None, :, None] * tmp[:, u, :][:, None, :]
    return 0.25 * acc


def _idct_2d(coef: List[float]) -> List[float]:
    """Separable 2-D inverse DCT (rows then columns), float-exact to the
    direct formula up to IEEE rounding — cross-checked in tests."""
    # rows: for each row y of coefficients, idct over u
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = coef[base : base + 8]
        for x in range(8):
            c = _COS[x]
            tmp[base + x] = (
                row[0] * c[0] + row[1] * c[1] + row[2] * c[2]
                + row[3] * c[3] + row[4] * c[4] + row[5] * c[5]
                + row[6] * c[6] + row[7] * c[7]
            )
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            c = _COS[y]
            out[y * 8 + x] = 0.25 * (
                col[0] * c[0] + col[1] * c[1] + col[2] * c[2]
                + col[3] * c[3] + col[4] * c[4] + col[5] * c[5]
                + col[6] * c[6] + col[7] * c[7]
            )
    return out


class _Huff:
    """Canonical huffman decoder from a DHT (counts, symbols) spec.

    Besides the per-bit canonical walk, builds a 256-entry peek table
    covering every code of length <= 8 (the overwhelming majority of
    symbols in practice): an 8-bit peek resolves symbol + length in one
    lookup.  Longer codes and the stream tail (fewer than 8 bits before
    a marker) fall back to the per-bit walk — same decoded symbols in
    every case, this is a lookup strategy, not a format change."""

    def __init__(self, counts: List[int], symbols: bytes):
        # (first_code, first_index) per bit length, canonical ordering
        self.lookup = {}
        self.fast = [None] * 256
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                if length <= 8:
                    base = code << (8 - length)
                    hit = (symbols[k], length)
                    for i in range(1 << (8 - length)):
                        self.fast[base + i] = hit
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader) -> Optional[int]:
        if reader.navail >= 8 or reader._fill(8):
            hit = self.fast[(reader.acc >> (reader.navail - 8)) & 0xFF]
            if hit is not None:
                sym, length = hit
                navail = reader.navail - length
                reader.acc &= (1 << navail) - 1
                reader.navail = navail
                return sym
            # no code of length <= 8 matches this prefix: consume the
            # peeked byte as the first 8 code bits and walk 9..16
            code = (reader.acc >> (reader.navail - 8)) & 0xFF
            navail = reader.navail - 8
            reader.acc &= (1 << navail) - 1
            reader.navail = navail
            start = 9
        else:
            code = 0
            start = 1
        lookup = self.lookup
        for length in range(start, 17):
            bit = reader.read_bit()
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        return None


class _BitReader:
    """MSB-first entropy-data reader with 0xFF00 unstuffing; stops at
    any real marker (returns None).  Buffers whole bytes into an int
    accumulator so ``receive`` extracts a multi-bit field with one
    shift instead of a per-bit loop — pure integer logic, identical
    bit semantics to the original single-byte reader."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.navail = 0

    def _fill(self, need: int) -> bool:
        d = self.data
        n = len(d)
        pos = self.pos
        acc = self.acc
        navail = self.navail
        while navail < need:
            if pos >= n:
                self.pos, self.acc, self.navail = pos, acc, navail
                return False
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < n and d[pos + 1] == 0x00:
                    pos += 2  # stuffed 0xFF data byte
                else:  # a real marker terminates entropy data
                    self.pos, self.acc, self.navail = pos, acc, navail
                    return False
            else:
                pos += 1
            acc = (acc << 8) | b
            navail += 8
        self.pos, self.acc, self.navail = pos, acc, navail
        return True

    def read_bit(self) -> Optional[int]:
        if self.navail < 1 and not self._fill(1):
            return None
        navail = self.navail - 1
        bit = (self.acc >> navail) & 1
        # trim consumed high bits so acc never grows into a bignum
        self.acc &= (1 << navail) - 1
        self.navail = navail
        return bit

    def receive(self, nbits: int) -> Optional[int]:
        if nbits == 0:
            return 0
        if self.navail < nbits and not self._fill(nbits):
            return None
        navail = self.navail - nbits
        v = (self.acc >> navail) & ((1 << nbits) - 1)
        self.acc &= (1 << navail) - 1
        self.navail = navail
        return v

    def align_to_marker(self) -> Optional[int]:
        """Drop buffered partial bytes, skip to the next marker, return
        its code.  Any whole bytes still buffered are pre-marker pad
        the byte-at-a-time reader would have skipped here anyway."""
        self.acc = 0
        self.navail = 0
        d = self.data
        n = len(d)
        i = self.pos
        while i + 1 < n:
            if d[i] == 0xFF and d[i + 1] != 0x00:
                self.pos = i + 2
                return d[i + 1]
            i += 1
        return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes) -> Optional[dict]:
    """Decode a baseline JPEG to ``(width, height, mean_brightness)``,
    the same contract as the BMP/PNG/GIF decoders: ``mean_brightness``
    is the mean over every output pixel byte (gray byte for 1-component
    images, R, G and B for color).  See the module docstring for the
    supported profile; anything else returns ``None``.
    """
    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt = {}  # table id -> 64 natural-order ints
    dc_tabs = {}
    ac_tabs = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None  # length must cover its own two bytes
        seg = payload[i + 4 : i + 2 + seg_len]
        if len(seg) < seg_len - 2:
            return None
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec = seg[j] >> 4
                tid = seg[j] & 0x0F
                j += 1
                # truncated-table guard: refuse, don't crash the task
                if prec > 1 or j + (64 if prec == 0 else 128) > len(seg):
                    return None
                if prec == 0:
                    vals = list(seg[j : j + 64])
                    j += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[j + 2 * k : j + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    j += 128
                if len(vals) < 64:
                    return None
                nat = [0] * 64
                for z, v in enumerate(vals):
                    nat[ZIGZAG[z]] = v
                qt[tid] = nat
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                cls = seg[j] >> 4
                tid = seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                syms = seg[j + 17 : j + 17 + total]
                if len(syms) < total:
                    return None
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _Huff(counts, syms)
                j += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                return None  # truncated frame header
            if seg[0] != 8:
                return None  # 12-bit precision
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                return None  # truncated component specs
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    return None  # 4x factors out of profile
                comps.append({"id": cid, "q": qid, "h": hi, "v": vi})
            if ncomp not in (1, 3) or w == 0 or h == 0:
                return None
            if ncomp == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None  # truncated restart interval
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None or not seg:
                return None
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                return None  # truncated scan component specs
            scan = {}
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tabs = seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                payload, i + 2 + seg_len, frame, scan, qt,
                dc_tabs, ac_tabs, restart_interval,
            )
        i += 2 + seg_len
    return None


def _decode_block(reader, dc_tab, ac_tab, q, pred):
    """Decode one entropy-coded block; returns (dequantized natural-
    order coefficients, new_pred) or None on a corrupt stream.  The
    IDCT happens later, batched over every block of the scan
    (:func:`_idct_batch`)."""
    t = dc_tab.decode(reader)
    if t is None or t > 15:
        return None
    diff_bits = reader.receive(t)
    if diff_bits is None:
        return None
    pred += _extend(diff_bits, t)
    coef = [0.0] * 64
    coef[0] = pred * q[0]
    k = 1
    while k < 64:
        rs = ac_tab.decode(reader)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        bits = reader.receive(s)
        if bits is None:
            return None
        nat = ZIGZAG[k]
        coef[nat] = _extend(bits, s) * q[nat]
        k += 1
    return coef, pred


def _decode_scan(payload, start, frame, scan, qt, dc_tabs, ac_tabs, dri):
    """General T.81 interleaved-MCU scan: each MCU carries hi*vi blocks
    per component in raster order, so 4:4:4, 4:2:2 and 4:2:0 all fall
    out of the same loop; subsampled chroma planes are upsampled by
    nearest-neighbour replication at the color-convert step (decoders
    legitimately differ here — bilinear vs nearest is a quality choice,
    not a spec requirement; ours is pinned by the roundtrip tests)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    ncomp = len(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(payload, start)
    # Entropy decode is inherently serial (each huffman code's position
    # depends on the previous one), so the scan loop stays scalar but
    # only COLLECTS dequantized coefficient blocks + their plane
    # positions; the IDCT, level shift/clamp, chroma upsampling and
    # YCbCr->RGB conversion all run batched in numpy afterwards —
    # bit-identical arithmetic (see _idct_batch), ~order-of-magnitude
    # fewer interpreter operations per pixel.
    pred = [0] * ncomp
    mcu = 0
    coef_blocks: List[List[float]] = []
    block_pos: List[Tuple[int, int, int]] = []  # (ci, oy, ox)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu and mcu % dri == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    return None
                pred = [0] * ncomp
            for ci, comp in enumerate(comps):
                if comp["id"] not in scan or comp["q"] not in qt:
                    return None
                dc_id, ac_id = scan[comp["id"]]
                dc_tab = dc_tabs.get(dc_id)
                ac_tab = ac_tabs.get(ac_id)
                if dc_tab is None or ac_tab is None:
                    return None
                q = qt[comp["q"]]
                for v in range(comp["v"]):
                    for hb in range(comp["h"]):
                        got = _decode_block(
                            reader, dc_tab, ac_tab, q, pred[ci]
                        )
                        if got is None:
                            return None
                        coef, pred[ci] = got
                        coef_blocks.append(coef)
                        block_pos.append((
                            ci,
                            (my * comp["v"] + v) * 8,
                            (mx * comp["h"] + hb) * 8,
                        ))
            mcu += 1
    # batched IDCT + level shift + clamp (int(round(x)) and np.round
    # both round half-to-even, so pixel values match the scalar path)
    px = _idct_batch(
        np.asarray(coef_blocks, dtype=np.float64).reshape(-1, 8, 8)
    )
    px = np.clip(np.round(px).astype(np.int64) + 128, 0, 255)
    # per-component planes sized to the MCU grid at THAT component's
    # sampling (chroma planes are smaller when subsampled)
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.int64))
    for bi, (ci, oy, ox) in enumerate(block_pos):
        planes[ci][oy : oy + 8, ox : ox + 8] = px[bi]
    if ncomp == 1:
        total = int(planes[0][:h, :w].sum())
        denom = w * h
    else:
        hs = [c["h"] for c in comps]
        vs = [c["v"] for c in comps]
        ys = np.arange(h)
        xs = np.arange(w)
        # nearest-neighbour upsample via integer index maps — the same
        # y*vi//vmax, x*hi//hmax source pixel as the scalar loop
        up = [
            planes[ci][(ys * vs[ci]) // vmax][:, (xs * hs[ci]) // hmax]
            for ci in range(3)
        ]
        Y, cb, cr = up[0], up[1] - 128, up[2] - 128
        r = np.round(Y + 1.402 * cr)
        g = np.round(Y - 0.344136 * cb - 0.714136 * cr)
        b = np.round(Y + 1.772 * cb)
        total = sum(
            int(np.clip(ch, 0, 255).astype(np.int64).sum())
            for ch in (r, g, b)
        )
        denom = w * h * 3
    return {"width": w, "height": h, "mean_brightness": total / denom}


def encode_flat_jpeg(gray: int, w: int = 8, h: int = 8) -> bytes:
    """Synthesize a minimal VALID baseline JPEG whose every pixel is
    exactly ``gray`` — the frame generator for MJPEG test/oracle
    payloads (entry ``multimodal_mjpeg_pixel_stats``), NOT a general
    encoder.  ``w``/``h`` must be multiples of 8.

    Why exactness holds: a flat block is DC-only; with the DC quantizer
    pinned to 8 the dequantized coefficient is ``(gray-128)*8`` and the
    2-D IDCT of a DC-only block is the constant ``coef/8 + 128 = gray``
    in exact float arithmetic, so :func:`decode_jpeg_pixels` returns
    ``mean_brightness == gray`` bit-for-bit (pinned in
    ``tests/test_jpeg.py``).  Tables are a legal minimal pair: a custom
    DC table holding categories 0-8 at four bits each and an AC table
    holding only EOB at two bits — exercising the decoder's DHT path
    with something other than the Annex K tables real cameras emit.
    """
    if w % 8 or h % 8 or not 0 <= gray <= 255:
        raise ValueError("encode_flat_jpeg: w/h must be multiples of 8 "
                         "and 0 <= gray <= 255")

    # canonical codes: categories 0..8, all length 4 -> codes 0000..1000
    dc_code = {s: (s, 4) for s in range(9)}
    eob_code = (0b00, 2)

    bits: List[int] = []

    def put(code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            bits.append((code >> i) & 1)

    diff = gray - 128
    s = abs(diff).bit_length()
    put(*dc_code[s])
    if s:
        put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    put(*eob_code)
    for _ in range((w // 8) * (h // 8) - 1):  # remaining blocks: diff 0
        put(*dc_code[0])
        put(*eob_code)
    while len(bits) % 8:
        bits.append(1)  # pad with 1s per the spec
    entropy = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | b
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)  # byte stuffing

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([8] * 64))  # q[k] = 8
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([1, 1, 0x11, 0]))
    counts_dc = [0] * 16
    counts_dc[3] = 9  # nine 4-bit codes (index 3 = length 4)
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(counts_dc) + bytes(range(9)))
    counts_ac = [0] * 16
    counts_ac[1] = 1  # one 2-bit code: EOB
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(counts_ac) + bytes([0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + bytes(entropy) + b"\xff\xd9")
