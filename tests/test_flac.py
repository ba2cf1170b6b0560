"""FLAC decoder goldens: an independent in-test ENCODER (rice coder,
fixed/LPC predictors, real CRC-8) roundtrips signals BIT-EXACTLY —
lossless codecs permit exact assertions everywhere."""

import random

from bdq_spark.operators.flac import _crc8, decode_flac_samples


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v, n):
        assert 0 <= v < (1 << n) or n == 0
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v, n):
        self.write(v & ((1 << n) - 1), n)

    def unary(self, q):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _rice_encode(w, residuals, param=None):
    if param is None:
        # adaptive: keep unary quotients tiny even for wild residuals
        top = max((abs(e) for e in residuals), default=0)
        param = min(14, max(0, (top.bit_length() + 1) - 1))
    w.write(0, 2)       # method 0: 4-bit rice
    w.write(0, 4)       # partition order 0
    w.write(param, 4)
    for e in residuals:
        u = (e << 1) if e >= 0 else ((-e) << 1) - 1
        w.unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(w, samples, depth, mode, order=0, lpc=None):
    w.write(0, 1)  # pad
    if mode == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(samples[0], depth)
        return
    if mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, depth)
        return
    if mode == "fixed":
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, depth)
        coefs = _FIXED[order]
        res = [
            samples[i] - sum(c * samples[i - 1 - j]
                             for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        _rice_encode(w, res)
        return
    if mode == "lpc":
        coefs, shift, prec = lpc
        order = len(coefs)
        w.write(31 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, depth)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
               >> shift)
            for i in range(order, len(samples))
        ]
        _rice_encode(w, res)
        return
    raise AssertionError(mode)


def _streaminfo(sample_rate, channels, depth, total):
    v = ((sample_rate << 44) | ((channels - 1) << 41)
         | ((depth - 1) << 36) | total)
    body = (b"\x00" * 10 + v.to_bytes(8, "big") + b"\x00" * 16)
    return b"fLaC" + b"\x80" + len(body).to_bytes(3, "big") + body


def encode_flac(channel_samples, sample_rate=8000, depth=16,
                block=None, modes=None, frame_mode=None):
    """Single- or multi-frame FLAC encoder for the goldens.
    ``channel_samples``: list per channel; ``frame_mode``: None =
    independent channels, else 'left_side'/'right_side'/'mid_side'."""
    channels = len(channel_samples)
    total = len(channel_samples[0])
    block = block or total
    out = bytearray(_streaminfo(sample_rate, channels, depth, total))
    frame_no = 0
    pos = 0
    while pos < total:
        bs = min(block, total - pos)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)      # fixed blocking
        w.write(6, 4)      # blocksize: 8-bit value - 1 follows
        w.write(0, 4)      # sample rate: from STREAMINFO
        if frame_mode is None:
            w.write(channels - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9,
                     "mid_side": 10}[frame_mode], 4)
        w.write({8: 1, 16: 4, 24: 6}[depth], 3)
        w.write(0, 1)
        w.write(frame_no, 8)   # UTF-8 number < 128
        w.write(bs - 1, 8)
        header = bytes(w.out)
        assert w.nbits == 0
        w.write(_crc8(header), 8)
        sl = [c[pos:pos + bs] for c in channel_samples]
        if frame_mode is None:
            for ci, s in enumerate(sl):
                m = (modes or ["verbatim"] * channels)[ci]
                if isinstance(m, tuple):
                    order = (len(m[2][0]) if m[0] == "lpc" else m[1])
                    if len(s) <= order:
                        _subframe(w, s, depth, "verbatim")  # tail frame
                    else:
                        _subframe(w, s, depth, m[0], order=m[1],
                                  lpc=m[2] if len(m) > 2 else None)
                else:
                    _subframe(w, s, depth, m)
        else:
            left, right = sl
            if frame_mode == "left_side":
                side = [a - b for a, b in zip(left, right)]
                _subframe(w, left, depth, "verbatim")
                _subframe(w, side, depth + 1, "verbatim")
            elif frame_mode == "right_side":
                side = [a - b for a, b in zip(left, right)]
                _subframe(w, side, depth + 1, "verbatim")
                _subframe(w, right, depth, "verbatim")
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                side = [a - b for a, b in zip(left, right)]
                _subframe(w, mid, depth, "verbatim")
                _subframe(w, side, depth + 1, "verbatim")
        w.align()
        w.write(0, 16)  # frame CRC-16 (decoder skips)
        out += w.out
        pos += bs
        frame_no += 1
    return bytes(out)


def _stats(chans):
    vals = [s for c in chans for s in c]
    mean = sum(vals) / len(vals)
    rms = (sum(v * v for v in vals) / len(vals)) ** 0.5
    return len(vals), mean, rms


def test_flac_constant_verbatim_fixed_exact():
    rng = random.Random(3)
    sig = [rng.randrange(-1000, 1000) for _ in range(64)]
    for mode in ["verbatim", ("fixed", 0), ("fixed", 1), ("fixed", 2),
                 ("fixed", 3), ("fixed", 4)]:
        fl = encode_flac([sig], modes=[mode])
        d = decode_flac_samples(fl)
        n, mean, rms = _stats([sig])
        assert d == {"n_samples": n, "mean_amplitude": mean,
                     "rms_amplitude": rms}, mode
    flat = [-137] * 50
    d = decode_flac_samples(encode_flac([flat], modes=["constant"]))
    assert d["mean_amplitude"] == -137.0


def test_flac_lpc_exact():
    rng = random.Random(7)
    # a smooth-ish signal so LPC residuals stay small but nonzero
    sig = [int(300 * (i % 17) - 200 + rng.randrange(-20, 20))
           for i in range(80)]
    fl = encode_flac([sig], modes=[("lpc", 0, ([3, -1], 1, 5))])
    d = decode_flac_samples(fl)
    n, mean, rms = _stats([sig])
    assert d == {"n_samples": n, "mean_amplitude": mean,
                 "rms_amplitude": rms}


def test_flac_multi_frame_and_depths():
    rng = random.Random(11)
    sig = [rng.randrange(-100, 100) for _ in range(100)]
    d = decode_flac_samples(encode_flac([sig], block=32))  # 4 frames
    n, mean, rms = _stats([sig])
    assert d == {"n_samples": n, "mean_amplitude": mean,
                 "rms_amplitude": rms}
    for depth, lim in ((8, 120), (24, 1 << 20)):
        s2 = [rng.randrange(-lim, lim) for _ in range(40)]
        d2 = decode_flac_samples(encode_flac([s2], depth=depth))
        assert d2["n_samples"] == 40
        assert d2["mean_amplitude"] == sum(s2) / 40


def test_flac_stereo_decorrelation_modes():
    rng = random.Random(13)
    left = [rng.randrange(-500, 500) for _ in range(48)]
    right = [l + rng.randrange(-50, 50) for l in left]
    n, mean, rms = _stats([left, right])
    for fm in (None, "left_side", "right_side", "mid_side"):
        d = decode_flac_samples(
            encode_flac([left, right], frame_mode=fm)
        )
        assert d == {"n_samples": n, "mean_amplitude": mean,
                     "rms_amplitude": rms}, fm


def test_flac_refusals():
    sig = [1, 2, 3, 4]
    fl = encode_flac([sig])
    # corrupt header -> CRC-8 mismatch refuses
    bad = bytearray(fl)
    hdr_at = len(_streaminfo(8000, 1, 16, 4))
    bad[hdr_at + 2] ^= 0x04
    assert decode_flac_samples(bytes(bad)) is None
    # truncated stream refuses
    assert decode_flac_samples(fl[:-3]) is None
    # not flac / header-only
    assert decode_flac_samples(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_flac_samples(_streaminfo(8000, 1, 16, 10)) is None


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_flac_property_roundtrip(data):
    """Random signals through random subframe modes, block sizes and
    depths: the decode must be bit-exact (lossless, no tolerance)."""
    depth = data.draw(st.sampled_from([8, 16, 24]))
    lim = 1 << (depth - 1)
    n = data.draw(st.integers(8, 120))
    sig = data.draw(
        st.lists(st.integers(-lim, lim - 1), min_size=n, max_size=n)
    )
    mode = data.draw(
        st.sampled_from(
            ["verbatim", ("fixed", 0), ("fixed", 1), ("fixed", 2)]
        )
    )
    block = data.draw(st.sampled_from([n, 16, 33]))
    fl = encode_flac([sig], depth=depth, modes=[mode], block=min(block, n))
    d = decode_flac_samples(fl)
    cnt, mean, rms = _stats([sig])
    assert d == {"n_samples": cnt, "mean_amplitude": mean,
                 "rms_amplitude": rms}
