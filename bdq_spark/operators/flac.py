"""Pure-Python FLAC sample decoder (subset of the format, fully real).

FLAC is a LOSSLESS integer codec — rice-coded prediction residuals, no
DSP — so, like PNG (zlib) and GIF (LZW), its sample data is decodable
in pure Python with no codec library.  This closes the audio half of
the codec-stub boundary next to :mod:`bdq_spark.operators.jpeg` on the
image side: ``audio_pcm_stats`` gets REAL decoded samples for FLAC
payloads inside the supported profile, with the same honest-refusal
contract everywhere else.

Supported profile:

- 8/16/24-bit streams, mono or stereo (independent channels plus all
  three decorrelation modes: left/side, right/side, mid/side);
- CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC subframes — i.e. every
  subframe type in the spec — including wasted-bits shifts;
- both rice residual methods (4-bit and 5-bit parameters), all
  partition orders, escape (unencoded) partitions;
- fixed AND variable blocking strategies; frame-header CRC-8 VERIFIED
  (a corrupt header refuses rather than desyncing into garbage).

Refused (``None``): sample depths other than 8/16/24, more than two
channels, truncated streams, CRC-8 mismatches, any reserved/invalid
header code.  Frame-footer CRC-16 bytes are skipped, not verified —
the rice/predictor structure itself fails loudly on corruption long
before a footer check would.

Verification (``tests/test_flac.py``): an independent in-test ENCODER
(rice coder + fixed-predictor search + real CRC-8/CRC-16) roundtrips
random signals BIT-EXACTLY — lossless codecs make exact assertions
possible where JPEG needed tolerance bands.
"""

from __future__ import annotations

from typing import List, Optional

__all__ = ["decode_flac_samples"]

#: CRC-8 (poly x^8 + x^2 + x + 1, 0x07), as used by FLAC frame headers
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


class _Bits:
    """MSB-first bit reader over bytes, with byte-position tracking so
    the frame-header CRC can be computed over the exact header bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.bit = 0  # bits consumed of data[pos]

    def read(self, n: int) -> Optional[int]:
        v = 0
        d = self.data
        while n > 0:
            if self.pos >= len(d):
                return None
            avail = 8 - self.bit
            take = min(n, avail)
            chunk = (d[self.pos] >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> Optional[int]:
        v = self.read(n)
        if v is None:
            return None
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self, limit: int = 1 << 20) -> Optional[int]:
        q = 0
        while q < limit:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
        return None

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


#: frame-header block size codes -> sample count (None = reserved or
#: read-from-stream)
_BLOCKSIZE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(bits: _Bits) -> Optional[int]:
    """FLAC's UTF-8-style frame/sample number (up to 7 bytes)."""
    first = bits.read(8)
    if first is None:
        return None
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow == 0 or n_follow > 6:
        return None
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = bits.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, order: int) -> Optional[List[int]]:
    method = bits.read(2)
    if method is None or method > 1:
        return None
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    if porder is None:
        return None
    nparts = 1 << porder
    if blocksize % nparts:
        return None  # partitions must divide the block evenly
    out: List[int] = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            return None
        param = bits.read(plen)
        if param is None:
            return None
        if param == escape:
            raw_bits = bits.read(5)
            if raw_bits is None:
                return None
            for _ in range(count):
                v = bits.read_signed(raw_bits) if raw_bits else 0
                if v is None:
                    return None
                out.append(v)
        else:
            for _ in range(count):
                q = bits.unary()
                if q is None:
                    return None
                r = bits.read(param) if param else 0
                if r is None:
                    return None
                u = (q << param) | r
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _read_subframe(bits: _Bits, blocksize: int, depth: int) -> Optional[List[int]]:
    pad = bits.read(1)
    if pad != 0:
        return None
    ftype = bits.read(6)
    wasted_flag = bits.read(1)
    if ftype is None or wasted_flag is None:
        return None
    wasted = 0
    if wasted_flag:
        w = bits.unary()
        if w is None:
            return None
        wasted = w + 1
    eff = depth - wasted
    if eff <= 0:
        return None
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        if v is None:
            return None
        samples = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        samples = []
        for _ in range(blocksize):
            v = bits.read_signed(eff)
            if v is None:
                return None
            samples.append(v)
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        if order > blocksize:
            return None
        warm = []
        for _ in range(order):
            v = bits.read_signed(eff)
            if v is None:
                return None
            warm.append(v)
        res = _read_residual(bits, blocksize, order)
        if res is None:
            return None
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for e in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        if order > blocksize:
            return None
        warm = []
        for _ in range(order):
            v = bits.read_signed(eff)
            if v is None:
                return None
            warm.append(v)
        prec = bits.read(4)
        if prec is None or prec == 15:
            return None
        prec += 1
        shift = bits.read_signed(5)
        if shift is None or shift < 0:
            return None
        coefs = []
        for _ in range(order):
            c = bits.read_signed(prec)
            if c is None:
                return None
            coefs.append(c)
        res = _read_residual(bits, blocksize, order)
        if res is None:
            return None
        samples = list(warm)
        for e in res:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        return None  # reserved subframe type
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(payload: bytes) -> Optional[dict]:
    """Decode a FLAC stream's samples — see the module docstring for
    the supported profile.  Returns ``(n_samples, mean_amplitude,
    rms_amplitude)`` over every sample of every channel (interleaved
    semantics identical to :func:`decode_wav_samples`)."""
    n = len(payload)
    if n < 42 or payload[:4] != b"fLaC":
        return None
    # metadata blocks: STREAMINFO is mandatory-first
    i = 4
    streaminfo = None
    while i + 4 <= n:
        hdr = payload[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[i + 1 : i + 4], "big")
        if btype == 0:
            streaminfo = payload[i + 4 : i + 4 + blen]
        i += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        return None
    v = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = v >> 44
    channels = ((v >> 41) & 0x7) + 1
    depth = ((v >> 36) & 0x1F) + 1
    total = v & ((1 << 36) - 1)
    if sample_rate == 0 or depth not in (8, 16, 24) or channels > 2:
        return None
    if total == 0:
        return None  # unknown length: refuse rather than guess
    decoded = 0
    tot = 0
    sumsq = 0
    while decoded < total:
        if i >= n:
            return None  # stream ends before the declared sample count
        header_start = i
        bits = _Bits(payload, i)
        sync = bits.read(14)
        if sync != 0b11111111111110:
            return None
        if bits.read(1) != 0:
            return None
        bits.read(1)  # blocking strategy (both supported)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1) != 0 or None in (bs_code, sr_code, ch_code, ss_code):
            return None
        if _read_utf8_number(bits) is None:
            return None
        if bs_code in (0, None):
            return None
        blocksize = _BLOCKSIZE.get(bs_code)
        if blocksize is None:
            ext = bits.read(8 if bs_code == 6 else 16)
            if ext is None:
                return None
            blocksize = ext + 1
        if sr_code == 12:
            if bits.read(8) is None:
                return None
        elif sr_code in (13, 14):
            if bits.read(16) is None:
                return None
        elif sr_code == 15:
            return None  # invalid
        # sample size must agree with STREAMINFO or restate it
        sizes = {0: depth, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        if sizes.get(ss_code) != depth:
            return None
        bits.align()
        crc_expect = bits.read(8)
        if crc_expect != _crc8(payload[header_start : bits.pos - 1]):
            return None
        # channel layout
        if ch_code <= 7:
            if ch_code + 1 != channels:
                return None
            chans = []
            for _ in range(channels):
                s = _read_subframe(bits, blocksize, depth)
                if s is None:
                    return None
                chans.append(s)
        elif ch_code in (8, 9, 10):
            if channels != 2:
                return None
            # the SIDE channel carries one extra bit
            d0 = depth + (1 if ch_code == 9 else 0)
            d1 = depth + (1 if ch_code in (8, 10) else 0)
            a = _read_subframe(bits, blocksize, d0)
            b = _read_subframe(bits, blocksize, d1)
            if a is None or b is None:
                return None
            if ch_code == 8:  # left/side: right = left - side
                chans = [a, [x - y for x, y in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                chans = [[x + y for x, y in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    x = (m << 1) | (s & 1)
                    left.append((x + s) >> 1)
                    right.append((x - s) >> 1)
                chans = [left, right]
        else:
            return None  # reserved channel assignment
        bits.align()
        if bits.read(16) is None:  # frame CRC-16 (skipped, not verified)
            return None
        i = bits.pos
        take = min(blocksize, total - decoded)
        for c in chans:
            for s in c[:take]:
                tot += s
                sumsq += s * s
        decoded += take
    count = decoded * channels
    return {
        "n_samples": count,
        "mean_amplitude": tot / count,
        "rms_amplitude": (sumsq / count) ** 0.5,
    }
