"""Raster overlay: exact-post join and bilinear kernel (InterpLinearElev)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_bilinear_kernel_exact_on_plane():
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        bilinear_sample_kernel,
    )

    # bilinear must reproduce an affine surface exactly
    ny, nx = 10, 12
    gy, gx = np.mgrid[0:ny, 0:nx]
    elevs = 2.0 * gx + 3.0 * gy + 5.0
    lon = np.array([0.25, 3.75, 10.5])
    lat = np.array([0.5, 2.25, 8.0])
    got = bilinear_sample_kernel(lon, lat, elevs, 0.0, 0.0, 1.0, 1.0)
    want = 2.0 * lon + 3.0 * lat + 5.0
    assert np.allclose(got, want, atol=1e-12)


def test_overlay_bilinear_dataframe(spark):
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        overlay_sample_bilinear,
    )
    from geospatial_analysis_integrity_tool_spark.queries.overlay import (
        POSTS,
        POST_DEG,
        build_raster_tiles,
    )

    tiles = build_raster_tiles(spark)
    pts = spark.createDataFrame(
        [(1, 10.123, 40.237), (2, 12.401, 43.118)], "pid int, lon double, lat double"
    )
    out = overlay_sample_bilinear(
        pts, tiles, x_origin=10.0, y_origin=40.0, post_deg=POST_DEG, posts_per_tile=POSTS
    ).collect()
    assert len(out) == 2
    for r in out:
        assert 0.0 <= r.elev_bilin <= 400.0  # within the DEM value range


def test_overlay_exact_matches_formula(spark):
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        overlay_sample_exact,
    )
    from geospatial_analysis_integrity_tool_spark.queries.overlay import (
        POSTS,
        POST_DEG,
        build_raster_tiles,
    )

    tiles = build_raster_tiles(spark)
    pts = spark.createDataFrame(
        [(i, 10.0 + i * 0.137 % 3.9, 40.0 + i * 0.211 % 3.9) for i in range(50)],
        "pid int, lon double, lat double",
    )
    out = overlay_sample_exact(
        pts, tiles, x_origin=10.0, y_origin=40.0, post_deg=POST_DEG, posts_per_tile=POSTS
    ).collect()
    assert len(out) == 50
    for r in out:
        want = ((r.gx * 7919 + r.gy * 104729) % 4000) / 10.0
        assert r.elev == want


def test_gridascii_roundtrip(spark):
    """ESRI ASCII grid writer/reader: north-to-south file order flips back
    to SW-row-major; one-decimal values parse bit-identically."""
    import os
    import tempfile

    import numpy as np

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        read_gridascii,
        write_gridascii,
    )

    d = tempfile.mkdtemp(prefix="gait_asc_")
    grid = np.array([[0.1, 1.2, 2.3], [10.0, 11.1, 12.2]])  # row 0 = south
    write_gridascii(os.path.join(d, "t.asc"), grid, x0=10.0, y0=40.0, cellsize=0.01)
    row = read_gridascii(spark, d + "/*.asc").collect()[0]
    assert (row.ncols, row.nrows) == (3, 2)
    assert (row.x0, row.y0, row.cellsize) == (10.0, 40.0, 0.01)
    assert row.elevs == [0.1, 1.2, 2.3, 10.0, 11.1, 12.2]


def test_gridascii_rejects_truncated(spark):
    import pytest as _pytest

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        parse_gridascii_bytes,
    )

    bad = b"ncols 3\nnrows 2\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n1 2 3\n"
    with _pytest.raises(ValueError, match="expected 6 posts"):
        parse_gridascii_bytes(bad, "t")


def test_dted_roundtrip_negatives_and_hemispheres():
    import numpy as np

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        parse_dted_bytes,
        write_dted,
    )
    import io, os, tempfile

    d = tempfile.mkdtemp(prefix="gait_dted_")
    grid = np.array([[-500, 0, 1], [2, 3, 32000]], dtype=np.int64)  # row 0 = S
    p = os.path.join(d, "c.dt1")
    write_dted(p, grid, lon_deg=7, lat_deg=2, lon_hem="W", lat_hem="S")
    row = parse_dted_bytes(open(p, "rb").read(), "c").iloc[0]
    assert (row.ncols, row.nrows) == (3, 2)
    assert (row.x0, row.y0) == (-7.0, -2.0)  # hemisphere sign, dted_import.c:224-230
    assert row.xspace_dsec == 300
    assert list(row.elevs) == [-500, 0, 1, 2, 3, 32000]


def test_dted_rejects_corrupt_checksum():
    import numpy as np
    import pytest as _pytest

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        parse_dted_bytes,
        write_dted,
    )
    import os, tempfile

    d = tempfile.mkdtemp(prefix="gait_dted_")
    p = os.path.join(d, "c.dt1")
    write_dted(p, np.zeros((2, 2), dtype=np.int64), lon_deg=10, lat_deg=40)
    data = bytearray(open(p, "rb").read())
    data[-10] ^= 0x01  # flip one elevation byte; checksum no longer matches
    with _pytest.raises(ValueError, match="checksum"):
        parse_dted_bytes(bytes(data), "c")


def test_geotiff_roundtrip_bigendian_rejects_compressed():
    import numpy as np
    import pytest as _pytest

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        parse_geotiff_bytes,
        write_geotiff,
    )
    import os, struct, tempfile

    d = tempfile.mkdtemp(prefix="gait_tif_")
    grid = np.array([[-700, 0, 5], [100, 2299, -1]], dtype=np.int64)  # row 0 = S
    p = os.path.join(d, "t.tif")
    write_geotiff(p, grid, x0=20.0, y0=50.0, cellsize=0.0125, rows_per_strip=1)
    row = parse_geotiff_bytes(open(p, "rb").read(), "t").iloc[0]
    assert (row.ncols, row.nrows) == (3, 2)
    assert (row.x0, row.y0, row.cellsize) == (20.0, 50.0, 0.0125)
    assert list(row.elevs) == [-700.0, 0.0, 5.0, 100.0, 2299.0, -1.0]
    # unsupported compression must be refused, not mis-decoded
    data = bytearray(open(p, "rb").read())
    n_tags = struct.unpack("<H", data[8:10])[0]
    for i in range(n_tags):
        off = 10 + 12 * i
        if struct.unpack("<H", data[off : off + 2])[0] == 259:
            data[off + 8 : off + 12] = struct.pack("<I", 7)  # JPEG (unsupported)
    with _pytest.raises(ValueError, match="unsupported"):
        parse_geotiff_bytes(bytes(data), "t")


def test_geotiff_packbits_lzw_roundtrip():
    """TIFF 6.0 §9 PackBits + §13 LZW (early-change, horizontal predictor):
    codec fuzz inverses plus full GeoTIFF write->parse round trips."""
    import numpy as np

    from geospatial_analysis_integrity_tool_spark.sources.dem import (
        lzw_decode,
        lzw_encode,
        packbits_decode,
        packbits_encode,
        parse_geotiff_bytes,
        write_geotiff,
    )
    import os, tempfile

    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"\x00" * 1000,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 20000, dtype=np.uint8)),
        bytes(
            np.repeat(
                rng.integers(0, 256, 50, dtype=np.uint8),
                rng.integers(1, 300, 50),
            )
        ),
        # long stream: forces LZW width growth to 12 bits and table clears
        bytes(rng.integers(0, 256, 300000, dtype=np.uint8)),
    ]
    for c in cases:
        assert packbits_decode(packbits_encode(c)) == c
        assert lzw_decode(lzw_encode(c)) == c

    grid = (
        (np.arange(40)[:, None] * 104729 + np.arange(40)[None, :] * 7919)
        % 3000
        - 700
    ).astype(np.int16)
    for compression, predictor in [
        ("packbits", 1),
        ("lzw", 1),
        ("lzw", 2),
        ("deflate", 1),
        ("deflate", 2),
    ]:
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.tif")
            write_geotiff(
                p, grid, 20.0, 50.0, 0.0125, rows_per_strip=7,
                compression=compression, predictor=predictor,
            )
            row = parse_geotiff_bytes(open(p, "rb").read(), p).iloc[0]
            got = np.array(row.elevs).reshape(40, 40)
            assert (got == grid).all(), (compression, predictor)
