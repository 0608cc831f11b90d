"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Driver mandate: treat media as binary columns with typed metadata; make the
Spark-side plumbing (schema, partitioning, kernel signatures, batch shapes)
real and tested, and STUB the actual decode (image/audio libraries are not in
this container) behind NotImplementedError / a deterministic fake.

Table shape:
    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int, n_frames int>)

Kernels (all mapInPandas, Arrow-batched):
* ``extract_media_features`` — real plumbing: payload length, deterministic
  byte-checksum pseudo-embedding (8 x float), metadata passthrough.  This is
  the batch shape a real CLIP/mel-spectrogram extractor drops into.
* ``decode_media(df, real=True)`` — raises NotImplementedError (no codec
  libs here); ``real=False`` routes to the deterministic fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int>"
)


def synth_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic media table: payload bytes are a pure function of id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.where(ids % 3 == 0, "image", np.where(ids % 3 == 1, "audio", "video"))
            payloads = [
                hashlib.sha256(f"media-{i}".encode()).digest() * (1 + int(i) % 4)
                for i in ids
            ]
            meta = [
                {
                    "width": int(64 + (i * 7) % 512),
                    "height": int(64 + (i * 11) % 512),
                    "sample_rate": int(8000 + (i % 5) * 8000),
                    "n_frames": int(1 + i % 24),
                }
                for i in ids
            ]
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": meta}
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(df: DataFrame, real: bool = True) -> DataFrame:
    """Decode payloads into pixel/sample arrays.

    STUB: real decode requires image/audio codec libraries not present in
    this environment.  The Spark-side contract (binary in, array out, Arrow
    batching, per-kind dispatch) is what this function defines.
    """
    if real:
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/libsndfile/ffmpeg) "
            "not available in this container; use real=False for the "
            "deterministic fake that exercises the identical Spark plumbing"
        )
    return extract_media_features(df)


def extract_media_features(media: DataFrame) -> DataFrame:
    """payload -> (len, deterministic pseudo-embedding, resized meta).

    The fake embedding is the first 8 bytes-of-sha256 scaled to [0,1) — a
    stand-in with the same schema/batch shape a real extractor produces.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).to_numpy(dtype=np.int64)
            embs = []
            for b in payloads:
                h = hashlib.sha256(b).digest()[:8]
                embs.append([x / 255.0 for x in h])
            meta = pdf["meta"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "embedding": embs,
                    "thumb_w": meta.map(lambda m: min(m["width"], 128)).astype("int32"),
                    "thumb_h": meta.map(lambda m: min(m["height"], 128)).astype("int32"),
                }
            )
            yield out

    return media.mapInPandas(
        run,
        schema=(
            "media_id long, kind string, n_bytes long, "
            "embedding array<double>, thumb_w int, thumb_h int"
        ),
    )
