"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Table shape:
    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int, n_frames int>)

The payloads are REAL container bytes built with stdlib struct/zlib only:

* image ids alternate between a spec-correct PNG (signature + IHDR with CRC32
  + IDAT + IEND) and a JPEG/JFIF stream (SOI + APP0 + COM + SOF0 + EOI);
* audio ids carry a RIFF/WAVE file (fmt + data chunks, PCM16 mono);
* video ids stay opaque hash bytes — full pixel/codec decode is stubbed
  (``decode_media(real=True)`` raises NotImplementedError: no codec libs in
  this environment), which is the ONLY stubbed step left.

``decode_media_headers`` is the de-stubbed decode: a pure-Python structural
parser (PNG chunk walk -> IHDR dims; JPEG segment walk -> SOF0 dims; RIFF
chunk walk -> fmt sample rate + data frame count) running as an
Arrow-batched ``mapInPandas`` kernel — the real plumbing a full decoder
drops into.  The gated query ``multimodal_features`` compares its output
against a closed-form DuckDB re-derivation of the same facts, so any
encode/parse defect (offsets, endianness, chunk walking) fails the hash.

Kernels (all mapInPandas, Arrow-batched):
* ``decode_media_headers`` — format detect + header facts (REAL decode).
* ``extract_media_features`` — payload length + deterministic byte-checksum
  pseudo-embedding (8 x float), the batch shape a CLIP/mel extractor uses.
* ``decode_media(df, real=True)`` — full sample decode: NotImplementedError.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int>"
)


# --- container byte builders (stdlib only) -------------------------------------


def png_bytes(width: int, height: int) -> bytes:
    """Minimal spec-correct PNG: signature, IHDR (with real CRC32), one IDAT
    stub chunk, IEND."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    ihdr = (
        struct.pack(">I", 13) + b"IHDR" + ihdr_data
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
    )
    idat_data = b"\x00" * (8 + width % 16)
    idat = (
        struct.pack(">I", len(idat_data)) + b"IDAT" + idat_data
        + struct.pack(">I", zlib.crc32(b"IDAT" + idat_data))
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return sig + ihdr + idat + iend


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG/JFIF stream: SOI, APP0, a COM segment (so the parser must
    WALK segments, not assume a fixed SOF0 offset), SOF0, EOI."""
    soi = b"\xff\xd8"
    app0_data = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", len(app0_data) + 2) + app0_data
    com_data = b"synthetic"
    com = b"\xff\xfe" + struct.pack(">H", len(com_data) + 2) + com_data
    sof0_data = struct.pack(">BHHB", 8, height, width, 3) + bytes.fromhex(
        "011100021101031101"
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", len(sof0_data) + 2) + sof0_data
    return soi + app0 + com + sof0 + b"\xff\xd9"


def wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    """RIFF/WAVE, PCM16 mono: fmt chunk + data chunk of n_samples frames."""
    data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --- header parsers (pure struct walks; the de-stubbed decode) ------------------

_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_media_header(b: bytes) -> tuple[str, int | None, int | None, int | None, int | None]:
    """(format, width, height, sample_rate, n_frames) from container bytes."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        off = 8
        while off + 8 <= len(b):
            (clen,) = struct.unpack(">I", b[off : off + 4])
            ctype = b[off + 4 : off + 8]
            if ctype == b"IHDR":
                w, h = struct.unpack(">II", b[off + 8 : off + 16])
                return ("png", int(w), int(h), None, None)
            off += 12 + clen
        return ("png", None, None, None, None)
    if b[:2] == b"\xff\xd8":
        off = 2
        while off + 4 <= len(b):
            if b[off] != 0xFF:
                break
            marker = b[off + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                off += 2
                continue
            (seglen,) = struct.unpack(">H", b[off + 2 : off + 4])
            if marker in _SOF_MARKERS:
                h, w = struct.unpack(">HH", b[off + 5 : off + 9])
                return ("jpeg", int(w), int(h), None, None)
            off += 2 + seglen
        return ("jpeg", None, None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        off = 12
        rate = None
        block_align = 2
        frames = None
        while off + 8 <= len(b):
            cid = b[off : off + 8][:4]
            (clen,) = struct.unpack("<I", b[off + 4 : off + 8])
            if cid == b"fmt ":
                _, _, rate_, _, block_align, _ = struct.unpack(
                    "<HHIIHH", b[off + 8 : off + 24]
                )
                rate = int(rate_)
            elif cid == b"data":
                frames = int(clen // max(block_align, 1))
            off += 8 + clen + (clen % 2)
        return ("wav", None, None, rate, frames)
    return ("unknown", None, None, None, None)


def decode_media_headers(media: DataFrame) -> DataFrame:
    """Structural header decode (the REAL step): format + dimensions /
    sample facts from the payload bytes alone — no metadata passthrough."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [parse_media_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "fmt": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return media.mapInPandas(
        run,
        schema=(
            "media_id long, fmt string, width int, height int,"
            " sample_rate int, n_frames int"
        ),
    )


def synth_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic media table: payload bytes are a pure function of id —
    real PNG/JPEG for images, real WAV for audio, opaque bytes for video."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.where(
                ids % 3 == 0, "image", np.where(ids % 3 == 1, "audio", "video")
            )
            payloads = []
            meta = []
            for i in ids:
                i = int(i)
                w = 64 + (i * 7) % 512
                h = 64 + (i * 11) % 512
                rate = 8000 + (i % 5) * 8000
                frames = 100 + i % 50
                if i % 3 == 0:
                    payloads.append(
                        png_bytes(w, h) if i % 2 == 0 else jpeg_bytes(w, h)
                    )
                elif i % 3 == 1:
                    payloads.append(wav_bytes(rate, frames))
                else:
                    payloads.append(
                        hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
                    )
                meta.append(
                    {
                        "width": int(w),
                        "height": int(h),
                        "sample_rate": int(rate),
                        "n_frames": int(frames),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": meta}
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(df: DataFrame, real: bool = True) -> DataFrame:
    """Decode payloads into pixel/sample ARRAYS.

    STUB: full sample decode requires codec libraries not present in this
    environment; the structural header decode (:func:`decode_media_headers`)
    is real and gated.
    """
    if real:
        raise NotImplementedError(
            "full media decode requires codec libraries (PIL/libsndfile/"
            "ffmpeg) not available in this container; header decode is "
            "implemented in decode_media_headers"
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
                h = hashlib.sha256(bytes(b)).digest()[:8]
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
