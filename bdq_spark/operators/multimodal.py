"""Multimodal (image/audio/video) column plumbing.

Extension mandate (BASELINE.json north_star): treat media as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas``.

The Spark-side plumbing here is real and tested: schemas, partitioning,
UDF signatures, and batch shapes all work at scale.  The actual codec
calls are STUBS — the image/audio libraries (PIL, torchaudio, ffmpeg)
are not in this container — isolated behind ``_decode_image_bytes`` /
``_decode_audio_bytes``, which fall back to a clearly-marked
deterministic fake parser so the distributed pipeline is exercisable
end-to-end.  Swap the stub for the real codec and nothing else changes.

Scale notes:

- ``mapInPandas`` streams Arrow batches — a partition's media bytes are
  never all resident at once; set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64) for
  large blobs so a batch of 100 MB videos doesn't OOM the Python worker.
- Media tables should be written with the binary column LAST and scanned
  with the metadata columns only when the payload isn't needed — column
  pruning then skips the heavy bytes entirely.
- ``spark.read.format('binaryFile')`` is the standard loader for media
  directories (path, modificationTime, length, content).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
]

#: Canonical media-column bundle: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _decode_image_bytes(payload: bytes) -> dict:
    """STUB decode. Real implementation would be PIL/turbojpeg:

        from PIL import Image; img = Image.open(io.BytesIO(payload))

    The deterministic fake derives (width, height, channels) from the
    payload bytes so the distributed plumbing is testable without codecs.
    """
    try:
        from PIL import Image  # pragma: no cover - not in this container
        import io

        img = Image.open(io.BytesIO(payload))
        return {
            "width": img.width,
            "height": img.height,
            "channels": len(img.getbands()),
            "ok": True,
        }
    except ImportError:
        if not payload:
            return {"width": 0, "height": 0, "channels": 0, "ok": False}
        return {
            "width": 1 + payload[0] % 64,
            "height": 1 + payload[-1] % 64,
            "channels": 3,
            "ok": True,
        }


def attach_media_metadata(
    df: DataFrame,
    content_column: str = "content",
    media_type: str = "image",
    mime: str = "application/octet-stream",
    id_column: str = None,
) -> DataFrame:
    """Wrap a binary column into the canonical media bundle columns."""
    out = df
    if id_column is None:
        out = out.withColumn(
            "media_id", F.monotonically_increasing_id()
        )
    else:
        out = out.withColumn("media_id", F.col(id_column).cast("long"))
    return out.select(
        "media_id",
        F.lit(media_type).alias("media_type"),
        F.lit(mime).alias("mime"),
        F.create_map(
            F.lit("size_bytes"),
            F.length(F.col(content_column)).cast("string"),
        ).alias("meta"),
        F.col(content_column).alias("content"),
    )


_DECODED_SCHEMA = (
    "media_id long, width int, height int, channels int, decode_ok boolean"
)


def decode_images(df: DataFrame, content_column: str = "content") -> DataFrame:
    """Decode image dimensions via Arrow-batched ``mapInPandas``.

    Output: ``media_id, width, height, channels, decode_ok`` — payload
    bytes are dropped on the way out so downstream stages shuffle only
    metadata.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_image_bytes(bytes(b) if b is not None else b"")
                for b in pdf[content_column]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "decode_ok": [d["ok"] for d in decoded],
                }
            )

    return df.mapInPandas(decode, schema=_DECODED_SCHEMA)


_FEATURES_SCHEMA = "media_id long, feature array<float>"


def extract_image_features(
    df: DataFrame, content_column: str = "content", dim: int = 16
) -> DataFrame:
    """STUB feature extractor (real impl: a vision model over the batch).

    The fake projects payload bytes into a deterministic ``dim``-float
    vector (byte histogram folded to ``dim`` buckets, L1-normalized) —
    shape-compatible with a real embedding so downstream ANN operators
    (`bdq_spark.operators.similarity`) can run on the output unchanged.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[content_column]:
                raw = bytes(b) if b is not None else b""
                hist = [0.0] * dim
                for byte in raw:
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return df.mapInPandas(featurize, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_video_frames(
    df: DataFrame, content_column: str = "content", every_n_bytes: int = 1024
) -> DataFrame:
    """STUB frame sampler (real impl: ffmpeg/pyav keyframe extraction).

    The fake emits one "frame" (a byte slice) per ``every_n_bytes`` of
    payload — exercising the one-row-to-many-rows fan-out shape that real
    frame sampling produces, including the empty-payload edge case.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: List[int] = []
            idxs: List[int] = []
            frames: List[bytes] = []
            for mid, b in zip(pdf["media_id"], pdf[content_column]):
                raw = bytes(b) if b is not None else b""
                for i in range(0, len(raw), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    frames.append(raw[i : i + every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(sample, schema=_FRAMES_SCHEMA)
