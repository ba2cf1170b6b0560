"""Hypothesis properties for the MP3 frame-chain walker.

The conservation laws any correct walk must satisfy, explored over
randomly composed valid streams (derandomized profile — see
``tests/conftest.py``):

- accounting: ``bytes_consumed + trailing_bytes`` equals the payload
  length minus the ID3v2 offset;
- exactness: frames / samples / bitrate sums equal the generator's;
- refusal: a truncated final frame is never counted, and prefixing
  the stream with an ID3v2 tag changes no chain statistic.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bdq_spark.operators.multimodal import (
    _MP3_BITRATES,
    _MP3_SAMPLE_RATES,
    walk_mp3_frames,
)
from tests.test_similarity_multimodal import _mp3_frame

# (version, layer) pairs with defined tables; layer bits 1=III 2=II 3=I
VL = [(3, 1), (3, 2), (3, 3), (2, 1), (2, 2), (2, 3), (0, 1)]


@st.composite
def mp3_stream(draw):
    version, layer = draw(st.sampled_from(VL))
    sr = draw(st.sampled_from(_MP3_SAMPLE_RATES[version]))
    rates = [b for b in _MP3_BITRATES[(version, layer)] if b > 0]
    n = draw(st.integers(1, 6))
    frames = []
    for _ in range(n):
        br = draw(st.sampled_from(rates))
        pad = draw(st.integers(0, 1))
        frames.append(
            _mp3_frame(br, sample_rate=sr, pad=pad, version=version,
                       layer=layer)
        )
    return version, layer, sr, frames


@given(mp3_stream(), st.integers(0, 200))
@settings(max_examples=60, deadline=None)
def test_walk_accounts_for_every_byte(stream, trailing_garbage):
    version, layer, sr, frames = stream
    payload = b"".join(f for f, _ in frames) + b"\x01" * trailing_garbage
    got = walk_mp3_frames(payload)
    assert got is not None
    assert got["frames"] == len(frames)
    assert got["total_samples"] == sum(s for _, s in frames)
    assert got["duration_ms"] == got["total_samples"] * 1000 // sr
    assert got["bytes_consumed"] == sum(len(f) for f, _ in frames)
    assert got["bytes_consumed"] + got["trailing_bytes"] == len(payload)
    assert not got["truncated"]
    assert got["sample_rate"] == sr


@given(mp3_stream(), st.data())
@settings(max_examples=60, deadline=None)
def test_truncated_tail_refused_and_id3_invariance(stream, data):
    version, layer, sr, frames = stream
    whole = b"".join(f for f, _ in frames)
    last = frames[-1][0]
    # cut the last frame anywhere that still leaves its header parseable
    cut = data.draw(st.integers(4, max(4, len(last) - 1)))
    payload = whole[: len(whole) - len(last)] + last[:cut]
    got = walk_mp3_frames(payload)
    if len(frames) == 1:
        assert got is None  # no complete frame at all
        return
    assert got["frames"] == len(frames) - 1
    assert got["truncated"]
    assert got["trailing_bytes"] == cut
    assert got["total_samples"] == sum(s for _, s in frames[:-1])
    # ID3v2 prefix must not change any chain statistic
    tag_body = data.draw(st.binary(min_size=0, max_size=40))
    sz = len(tag_body)
    id3 = (
        b"ID3\x03\x00\x00"
        + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                 (sz >> 7) & 0x7F, sz & 0x7F])
        + tag_body
    )
    got2 = walk_mp3_frames(id3 + payload)
    assert got2 == got
