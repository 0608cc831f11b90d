"""SimHash, multimodal plumbing, role gating, -markignore goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_simhash_detects_near_dups_not_unrelated(spark):
    from geospatial_analysis_integrity_tool_spark.operators.simhash import (
        simhash_near_dups,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup: hamming 0, always banded together
            (3, "completely different words nothing shared here at all xyzzy "
                "plugh quux foo bar baz qux corge grault garply waldo fred"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_dups(docs).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_deterministic(spark):
    from geospatial_analysis_integrity_tool_spark.operators.simhash import (
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} common words here tok{i + 1}") for i in range(20)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash_signatures(docs.repartition(5)).collect()}
    assert a == b


def test_multimodal_plumbing(spark):
    from geospatial_analysis_integrity_tool_spark.sources.multimodal import (
        decode_media,
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, 60)
    assert media.schema.simpleString().startswith(
        "struct<media_id:bigint,kind:string,payload:binary,meta:struct"
    )
    feats = extract_media_features(media).collect()
    assert len(feats) == 60
    for r in feats[:10]:
        assert r.n_bytes >= 32 and len(r.embedding) == 8
        assert r.thumb_w <= 128 and r.thumb_h <= 128
    # full decode is real now: WAV payloads decode; JPEG entropy / stub-IDAT
    # PNGs and opaque video bytes report decodable=false (explicit boundary)
    dec = {r.media_id: r for r in decode_media(media).collect()}
    for mid, r in dec.items():
        if r.fmt == "wav":
            assert r.decodable and r.n_values == 100 + mid % 50
        elif r.fmt == "unknown":
            assert not r.decodable
    # determinism across partitioning
    f2 = extract_media_features(synth_media(spark, 60, partitions=7)).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, f2))


def test_mark_ignored_replay(spark):
    from geospatial_analysis_integrity_tool_spark.conditions import mark_ignored

    new = spark.createDataFrame(
        [("SLIVER", 1, "10"), ("SLIVER", 1, "11"), ("KINK", 1, "10")],
        "errtype string, instance int, sedrisid string",
    )
    prior = spark.createDataFrame(
        [("SLIVER", 1, "10")], "errtype string, instance int, sedrisid string"
    )
    out = {
        (r.errtype, r.sedrisid): r.retainign
        for r in mark_ignored(new, prior, ["errtype", "instance", "sedrisid"]).collect()
    }
    assert out == {("SLIVER", "10"): 1, ("SLIVER", "11"): 0, ("KINK", "10"): 0}


def test_media_header_parsers_roundtrip():
    from geospatial_analysis_integrity_tool_spark.sources.multimodal import (
        jpeg_bytes,
        parse_media_header,
        png_bytes,
        wav_bytes,
    )

    assert parse_media_header(png_bytes(640, 480)) == ("png", 640, 480, None, None)
    # the JPEG walker must skip APP0 and COM segments to reach SOF0
    assert parse_media_header(jpeg_bytes(1920, 1080)) == (
        "jpeg", 1920, 1080, None, None,
    )
    assert parse_media_header(wav_bytes(16000, 123)) == (
        "wav", None, None, 16000, 123,
    )
    assert parse_media_header(b"\x00" * 32)[0] == "unknown"


def test_media_decode_fixture_fully_decodable(spark):
    """The decode fixture's payloads all decode for real: counts and sums
    match the generating formulas per media id."""
    import numpy as np

    from geospatial_analysis_integrity_tool_spark.sources.multimodal import (
        decode_media,
        media_pcm_samples,
        media_pixel_grid,
        synth_decode_media,
    )

    rows = {r.media_id: r for r in decode_media(synth_decode_media(spark, 12)).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        assert r.decodable, (i, r.fmt)
        w = 8 + (i * 7) % 32
        h = 8 + (i * 11) % 32
        if r.fmt == "wav":
            s = media_pcm_samples(100 + i % 50).astype(np.int64)
            assert (r.n_values, r.value_sum) == (len(s), int(s.sum()))
        else:
            g = media_pixel_grid(w, h).astype(np.int64)
            assert (r.n_values, r.value_sum) == (g.size, int(g.sum()))


def test_media_full_decode_roundtrip():
    """PNG (all five filter types), BMP (bottom-up padded BGR), WAV PCM16:
    encode -> decode recovers the exact generating arrays."""
    import numpy as np

    from geospatial_analysis_integrity_tool_spark.sources import multimodal as mm

    for w, h in [(8, 8), (13, 9), (40, 27), (32, 5)]:
        g = mm.media_pixel_grid(w, h)
        assert (mm.decode_png_pixels(mm.png_bytes(w, h)) == g).all()
        assert (mm.decode_bmp_pixels(mm.bmp_bytes(w, h)) == g).all()
    for n in (1, 100, 149):
        s = mm.media_pcm_samples(n)
        assert (mm.decode_wav_samples(mm.wav_bytes(8000, n)) == s).all()
    assert mm.parse_media_header(mm.bmp_bytes(13, 9))[:3] == ("bmp", 13, 9)
