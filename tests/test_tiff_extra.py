"""Extra codec coverage: planar layout, uint16 PIL cross-check, big windows."""

import struct

import numpy as np
from PIL import Image

from flairtpu.io import TiffReader, Window
from flairtpu.io.tiff import write_array


def _write_planar_tiff(path, arr: np.ndarray):
    """Hand-craft a minimal uncompressed PlanarConfig=2 classic TIFF.

    Our writer emits chunky only; planar files exist in the wild (GDAL
    INTERLEAVE=BAND), so the reader path needs coverage.
    """
    bands, h, w = arr.shape
    assert arr.dtype == np.uint8
    header = b"II" + struct.pack("<H", 42)
    # one strip per plane
    plane_size = h * w
    data_offset = 8
    strips = [data_offset + i * plane_size for i in range(bands)]
    ifd_offset = data_offset + bands * plane_size

    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val))

    # out-of-line arrays placed after IFD
    n_entries = 10
    ifd_size = 2 + n_entries * 12 + 4
    extra = ifd_offset + ifd_size
    offsets_ptr, counts_ptr, bits_ptr = extra, extra + 4 * bands, extra + 8 * bands

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, bands, bits_ptr if bands > 2 else (8 | (8 << 16) if bands == 2 else 8))
    entry(259, 3, 1, 1)   # no compression
    entry(262, 3, 1, 1)   # min-is-black
    entry(273, 4, bands, offsets_ptr if bands > 1 else strips[0])
    entry(277, 3, 1, bands)
    entry(278, 4, 1, h)
    entry(279, 4, bands, counts_ptr if bands > 1 else plane_size)
    entry(284, 3, 1, 2)   # PLANAR

    with open(path, "wb") as f:
        f.write(header + struct.pack("<I", ifd_offset))
        f.write(arr.tobytes())
        f.write(struct.pack("<H", n_entries))
        f.write(b"".join(entries))
        f.write(struct.pack("<I", 0))
        f.write(struct.pack("<" + "I" * bands, *strips))
        f.write(struct.pack("<" + "I" * bands, *[plane_size] * bands))
        f.write(struct.pack("<" + "H" * bands, *[8] * bands).ljust(4 * bands, b"\0"))


def test_planar_config_read(tmp_path, rng):
    arr = rng.integers(0, 255, size=(3, 20, 24), dtype=np.uint8)
    p = tmp_path / "planar.tif"
    _write_planar_tiff(p, arr)
    with TiffReader(p) as r:
        assert r.planar == 2
        np.testing.assert_array_equal(r.read(), arr)
        np.testing.assert_array_equal(
            r.read([2], window=Window(4, 2, 10, 8)), arr[1:2, 2:10, 4:14])


def test_uint16_pil_crosscheck(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(30, 40), dtype=np.uint16)
    p = tmp_path / "u16.tif"
    Image.fromarray(arr).save(p)
    with TiffReader(p) as r:
        assert r.dtype.itemsize == 2
        np.testing.assert_array_equal(r.read(1), arr)
    # and the reverse: our u16 file read by PIL
    p2 = tmp_path / "u16_ours.tif"
    write_array(p2, arr[None], compress="deflate", tiled=False)
    np.testing.assert_array_equal(np.array(Image.open(p2)), arr)


def test_window_spanning_many_blocks(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 200, 300), dtype=np.uint8)
    p = tmp_path / "many.tif"
    write_array(p, arr, blockxsize=32, blockysize=32, compress="lzw")
    with TiffReader(p, cache_blocks=2) as r:  # tiny cache forces eviction
        w = Window(17, 23, 250, 150)
        np.testing.assert_array_equal(r.read(window=w), arr[:, 23:173, 17:267])


def test_float32_roundtrip_values(tmp_path, rng):
    arr = rng.standard_normal((2, 33, 47)).astype(np.float32)
    p = tmp_path / "f32.tif"
    write_array(p, arr, compress="deflate")
    with TiffReader(p) as r:
        np.testing.assert_array_equal(r.read(), arr)


def test_crs_prefers_projected_over_geographic_geokey():
    """GDAL-written projected rasters carry BOTH GeographicTypeGeoKey (2048,
    the geographic base CRS) and ProjectedCSTypeGeoKey (3072); GeoKeys sort
    ascending by ID so 2048 comes first — the projected CRS must still win
    (e.g. Lambert-93 FLAIR zones: 4171 base + 2154 projected)."""
    from flairtpu.io.tiff import TAG_GEOKEYDIR

    class Stub:
        tags = {TAG_GEOKEYDIR: [1, 1, 0, 4,
                                1024, 0, 1, 1,      # GTModelType projected
                                1025, 0, 1, 1,      # PixelIsArea
                                2048, 0, 1, 4171,   # geographic base CRS
                                3072, 0, 1, 2154]}  # projected CRS

    assert TiffReader._parse_crs(Stub()) == 2154

    class GeographicOnly:
        tags = {TAG_GEOKEYDIR: [1, 1, 0, 2,
                                1024, 0, 1, 2,
                                2048, 0, 1, 4326]}

    assert TiffReader._parse_crs(GeographicOnly()) == 4326


def test_overviews_cog_layout(tmp_path, rng):
    """overviews=[2,4] writes chained reduced-resolution IFDs (COG layout):
    PIL sees 3 frames; our reader opens each level via ifd_index; nearest
    resampling preserves label values."""
    arr = rng.integers(0, 19, size=(2, 100, 120)).astype(np.uint8)
    p = tmp_path / "ov.tif"
    from flairtpu.io.tiff import Affine, TiffWriter

    w = TiffWriter(p, 120, 100, 2, "uint8", compress="lzw", tiled=True,
                   blockxsize=64, blockysize=64, overviews=[2, 4],
                   transform=Affine.from_origin(0, 100, 0.5, 0.5), crs=2154)
    w.write(arr)
    w.close()

    with TiffReader(p) as r:
        assert (r.width, r.height) == (120, 100)
        assert len(r.overview_offsets) == 2
        np.testing.assert_array_equal(r.read(), arr)
        assert r.crs == 2154
    with TiffReader(p, ifd_index=1) as r1:
        assert (r1.width, r1.height) == (60, 50)
        np.testing.assert_array_equal(r1.read(), arr[:, ::2, ::2])
    with TiffReader(p, ifd_index=2) as r2:
        assert (r2.width, r2.height) == (30, 25)
        np.testing.assert_array_equal(r2.read(), arr[:, ::4, ::4])

    # PIL cross-check on a single-band variant (PIL cannot open 2-band TIFFs)
    p1 = p.with_name("ov1.tif")
    w = TiffWriter(p1, 120, 100, 1, "uint8", compress="lzw", tiled=True,
                   blockxsize=64, blockysize=64, overviews=[2, 4])
    w.write(arr[:1])
    w.close()
    with Image.open(p1) as im:
        assert im.n_frames == 3
        assert im.size == (120, 100)
        np.testing.assert_array_equal(np.asarray(im), arr[0])
        im.seek(1)
        assert im.size == (60, 50)
        np.testing.assert_array_equal(np.asarray(im), arr[0, ::2, ::2])


def test_overviews_off_by_default(tmp_path, rng):
    from flairtpu.io.tiff import write_array

    arr = rng.integers(0, 255, size=(1, 40, 40)).astype(np.uint8)
    p = tmp_path / "plain.tif"
    write_array(p, arr)
    with TiffReader(p) as r:
        assert r.overview_offsets == []
