"""Micro-benchmark for the pure-Python media decoders (PNG / JPEG).

Measures single-process decode throughput (MB/s of encoded payload and
megapixels/s of decoded output) for representative payload shapes:

- PNG 256x256 RGB, one run per filter regime (all-None/Sub/Up/Average/
  Paeth and the realistic mixed cycle) — separates the vectorizable
  filters (None/Sub/Up) from the inherently sequential ones
  (Average/Paeth, whose in-row dependency on ``line[x-bpp]`` admits no
  exact vectorization);
- PNG 256x256 palette (color type 3);
- baseline JPEG: 128x128 grayscale and 128x128 YCbCr 4:2:0, textured
  (deterministic pseudo-random pixels so every AC path is exercised).

Usage: ``python tools/media_bench.py [label]`` — prints one JSON line
per scenario plus a summary line.  Run before and after a decoder
optimization and compare ``px_per_s``.  The decoded stats are also
printed so before/after runs can assert bit-identical outputs.
"""

from __future__ import annotations

import json
import struct
import sys
import time
import zlib

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from bdq_spark.operators.multimodal import decode_png_pixels  # noqa: E402
from bdq_spark.operators.jpeg import decode_jpeg_pixels  # noqa: E402


def _png(w, h, rows, filters, color_type=2, plte=None):
    channels = {0: 1, 2: 3, 3: 1}[color_type]
    bpp = channels
    raw = bytearray()
    prev = [0] * (w * channels)
    for r, row in enumerate(rows):
        f = filters[r % len(filters)]
        if f == 0:
            enc = list(row)
        elif f == 1:
            enc = [(row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                   for x in range(len(row))]
        elif f == 2:
            enc = [(row[x] - prev[x]) & 0xFF for x in range(len(row))]
        elif f == 3:
            enc = [(row[x] - (((row[x - bpp] if x >= bpp else 0)
                               + prev[x]) >> 1)) & 0xFF
                   for x in range(len(row))]
        else:
            enc = []
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((row[x] - pred) & 0xFF)
        raw.append(f)
        raw.extend(enc)
        prev = list(row)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _pixels(w, h, channels, seed=12345):
    # xorshift-ish deterministic texture; avoids random module seeding drift
    rows = []
    s = seed
    for y in range(h):
        row = []
        for x in range(w * channels):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            row.append((s >> 7) & 0xFF)
        rows.append(row)
    return rows


def _bench(name, payload, decode, px, min_s=1.0):
    # warm-up + calibrate
    out = decode(payload)
    assert out is not None, name
    reps = 1
    t0 = time.perf_counter()
    decode(payload)
    dt = time.perf_counter() - t0
    reps = max(1, int(min_s / max(dt, 1e-9) / 3))
    best = None
    for _ in range(3):  # min-of-3 batches: robust to machine noise
        t0 = time.perf_counter()
        for _ in range(reps):
            decode(payload)
        cand = (time.perf_counter() - t0) / reps
        best = cand if best is None or cand < best else best
    dt = best
    rec = {
        "scenario": name,
        "payload_bytes": len(payload),
        "pixels": px,
        "sec_per_image": round(dt, 6),
        "mb_per_s": round(len(payload) / dt / 1e6, 3),
        "px_per_s": round(px / dt, 1),
        "mean": out["mean_brightness"],
    }
    print(json.dumps(rec))
    return rec


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    W = H = 256
    recs = []
    rgb = _pixels(W, H, 3)
    for fname, filters in [
        ("png_rgb_none", [0]), ("png_rgb_sub", [1]), ("png_rgb_up", [2]),
        ("png_rgb_average", [3]), ("png_rgb_paeth", [4]),
        ("png_rgb_mixed", [0, 1, 2, 3, 4]),
    ]:
        recs.append(_bench(fname, _png(W, H, rgb, filters),
                           decode_png_pixels, W * H))
    pal_rows = _pixels(W, H, 1)
    plte = bytes(_pixels(256, 1, 3)[0][: 256 * 3])
    recs.append(_bench(
        "png_palette_mixed",
        _png(W, H, pal_rows, [0, 1, 2, 3, 4], color_type=3, plte=plte),
        decode_png_pixels, W * H))

    from test_jpeg import encode_jpeg  # independent in-test encoder

    jw = jh = 128
    gray = [v for row in _pixels(jw, jh, 1) for v in row]
    recs.append(_bench("jpeg_gray_128", encode_jpeg(gray, jw, jh),
                       decode_jpeg_pixels, jw * jh))
    colors = [tuple(row[3 * x: 3 * x + 3]) for row in _pixels(jw, jh, 3)
              for x in range(jw)]
    recs.append(_bench(
        "jpeg_420_color_128",
        encode_jpeg(colors, jw, jh, color=True, subsample=(2, 2)),
        decode_jpeg_pixels, jw * jh))

    print(json.dumps({
        "label": label,
        "total_px_per_s": round(
            sum(r["pixels"] for r in recs)
            / sum(r["sec_per_image"] for r in recs), 1),
        "means": {r["scenario"]: r["mean"] for r in recs},
    }))


if __name__ == "__main__":
    main()
