"""Tests for the first-party GeoTIFF codec (flairtpu.io)."""

import numpy as np
import pytest
from PIL import Image

from flairtpu.io import TiffReader, TiffWriter, Window
from flairtpu.io.tiff import Affine, write_array
from flairtpu.io import codecs


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_lzw_roundtrip(rng):
    for n in (1, 5, 100, 4096, 70000):
        data = rng.integers(0, 8, size=n, dtype=np.uint8).tobytes()
        enc = codecs.lzw_encode(data)
        assert codecs.lzw_decode(enc, len(data)) == data


def test_lzw_roundtrip_python_fallback(rng):
    data = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
    enc = codecs._lzw_encode_py(data)
    assert codecs._lzw_decode_py(enc, len(data)) == data


def test_lzw_decode_pil_encoded(tmp_path, rng):
    """Cross-check our LZW decoder against Pillow's encoder via a TIFF file."""
    arr = rng.integers(0, 255, size=(64, 80), dtype=np.uint8)
    p = tmp_path / "pil_lzw.tif"
    Image.fromarray(arr).save(p, compression="tiff_lzw")
    with TiffReader(p) as r:
        assert r.compression == 5
        out = r.read(1)
    np.testing.assert_array_equal(out, arr)


def test_packbits_decode(tmp_path, rng):
    arr = np.repeat(rng.integers(0, 255, size=(32, 16), dtype=np.uint8), 3, axis=1)
    p = tmp_path / "pb.tif"
    Image.fromarray(arr).save(p, compression="packbits")
    with TiffReader(p) as r:
        np.testing.assert_array_equal(r.read(1), arr)


def test_predictor_roundtrip(rng):
    arr = rng.integers(0, 255, size=(17, 33, 3), dtype=np.uint8)
    enc = codecs.predictor2_encode(arr)
    dec = codecs.predictor2_decode(enc.copy())
    np.testing.assert_array_equal(dec, arr)


# ---------------------------------------------------------------------------
# writer -> reader roundtrips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("compress", [None, "deflate", "lzw"])
@pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32"])
def test_roundtrip_tiled(tmp_path, rng, compress, dtype):
    arr = (rng.random((3, 70, 90)) * 200).astype(dtype)
    p = tmp_path / f"rt_{compress}_{dtype}.tif"
    write_array(p, arr, compress=compress, blockxsize=32, blockysize=32)
    with TiffReader(p) as r:
        assert r.shape == (70, 90)
        assert r.count == 3
        np.testing.assert_array_equal(r.read(), arr)


def test_roundtrip_bigtiff(tmp_path, rng):
    arr = rng.integers(0, 19, size=(2, 100, 130), dtype=np.uint8)
    p = tmp_path / "big.tif"
    write_array(p, arr, bigtiff=True, blockxsize=64, blockysize=64)
    with TiffReader(p) as r:
        assert r.bigtiff
        np.testing.assert_array_equal(r.read(), arr)


def test_roundtrip_striped(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 45, 60), dtype=np.uint8)
    p = tmp_path / "strips.tif"
    write_array(p, arr, tiled=False, blockysize=7)
    with TiffReader(p) as r:
        assert not r.tiled
        np.testing.assert_array_equal(r.read(), arr)


def test_pil_reads_our_lzw(tmp_path, rng):
    """GDAL-ecosystem compatibility proxy: Pillow must read our LZW tiles."""
    arr = rng.integers(0, 255, size=(40, 56), dtype=np.uint8)
    p = tmp_path / "ours.tif"
    write_array(p, arr, compress="lzw", tiled=False)
    back = np.array(Image.open(p))
    np.testing.assert_array_equal(back, arr)


def test_pil_reads_our_deflate(tmp_path, rng):
    arr = rng.integers(0, 255, size=(40, 56), dtype=np.uint8)
    p = tmp_path / "ours_d.tif"
    write_array(p, arr, compress="deflate", tiled=False)
    back = np.array(Image.open(p))
    np.testing.assert_array_equal(back, arr)


# ---------------------------------------------------------------------------
# georeferencing
# ---------------------------------------------------------------------------

def test_geo_tags_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 32, 48), dtype=np.uint8)
    tr = Affine.from_origin(700000.0, 6600000.0, 0.2, 0.2)
    p = tmp_path / "geo.tif"
    write_array(p, arr, transform=tr, crs=2154, nodata=0)
    with TiffReader(p) as r:
        assert r.crs == 2154
        assert r.transform.to_tuple() == pytest.approx(tr.to_tuple())
        assert r.res == pytest.approx((0.2, 0.2))
        left, bottom, right, top = r.bounds
        assert (left, top) == pytest.approx((700000.0, 6600000.0))
        assert (right, bottom) == pytest.approx((700000.0 + 48 * 0.2, 6600000.0 - 32 * 0.2))
        assert r.nodata == 0


def test_profile_copy_write(tmp_path, rng):
    arr = rng.integers(0, 255, size=(5, 24, 24), dtype=np.uint8)
    src = tmp_path / "src.tif"
    write_array(src, arr, transform=Affine.from_origin(0, 100, 0.5, 0.5), crs=2154)
    with TiffReader(src) as r:
        profile = r.profile
    profile["count"] = 1
    dst = tmp_path / "dst.tif"
    with TiffWriter.from_profile(dst, profile) as w:
        w.write_band(1, arr[0])
    with TiffReader(dst) as r2:
        assert r2.count == 1
        assert r2.crs == 2154
        np.testing.assert_array_equal(r2.read(1), arr[0])


# ---------------------------------------------------------------------------
# windowed reads
# ---------------------------------------------------------------------------

def test_window_read(tmp_path, rng):
    arr = rng.integers(0, 255, size=(2, 100, 120), dtype=np.uint8)
    p = tmp_path / "w.tif"
    write_array(p, arr, blockxsize=32, blockysize=32)
    with TiffReader(p) as r:
        w = Window(10, 20, 50, 40)
        np.testing.assert_array_equal(r.read(window=w), arr[:, 20:60, 10:60])
        # band subset, 1-based
        np.testing.assert_array_equal(r.read([2], window=w), arr[1:2, 20:60, 10:60])


def test_boundless_read_fills_zero(tmp_path, rng):
    arr = rng.integers(1, 255, size=(1, 30, 30), dtype=np.uint8)
    p = tmp_path / "b.tif"
    write_array(p, arr)
    with TiffReader(p) as r:
        out = r.read(window=Window(-10, -10, 30, 30), boundless=True)
    assert out.shape == (1, 30, 30)
    assert (out[:, :10, :] == 0).all() and (out[:, :, :10] == 0).all()
    np.testing.assert_array_equal(out[:, 10:, 10:], arr[:, :20, :20])


def test_window_from_bounds(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 40, 40), dtype=np.uint8)
    tr = Affine.from_origin(1000.0, 2000.0, 0.5, 0.5)
    p = tmp_path / "wb.tif"
    write_array(p, arr, transform=tr)
    with TiffReader(p) as r:
        # bounds of pixel block rows 8..24, cols 4..20
        left, top = tr.xy(8, 4)
        right, bottom = tr.xy(24, 20)
        w = Window.from_bounds(left, bottom, right, top, r.transform)
        c0, r0, ww, hh = w.rounded()
        assert (c0, r0, ww, hh) == (4, 8, 16, 16)
        np.testing.assert_array_equal(r.read(window=w), arr[:, 8:24, 4:20])


def test_out_shape_resampling(tmp_path):
    base = np.arange(64, dtype=np.float32).reshape(1, 8, 8)
    p = "/tmp/_rs.tif"
    write_array(p, base)
    with TiffReader(p) as r:
        same = r.read(out_shape=(1, 8, 8), resampling="bilinear")
        np.testing.assert_array_equal(same, base)
        up = r.read(out_shape=(1, 16, 16), resampling="bilinear")
        assert up.shape == (1, 16, 16)
        # bilinear preserves overall mean on smooth data
        assert abs(up.mean() - base.mean()) < 0.5


def test_threaded_reads(tmp_path, rng):
    """Many threads over one handle must be safe (README:244 hazard fixed)."""
    from concurrent.futures import ThreadPoolExecutor

    arr = rng.integers(0, 255, size=(5, 128, 128), dtype=np.uint8)
    p = tmp_path / "t.tif"
    write_array(p, arr, blockxsize=32, blockysize=32, compress="deflate")
    with TiffReader(p, cache_blocks=4) as r:
        def job(i):
            y, x = (i * 13) % 96, (i * 29) % 96
            return r.read(window=Window(x, y, 32, 32)), arr[:, y : y + 32, x : x + 32]

        with ThreadPoolExecutor(max_workers=8) as ex:
            for got, want in ex.map(job, range(64)):
                np.testing.assert_array_equal(got, want)


def test_writer_readback(tmp_path, rng):
    """w+ semantics: read back windows during writing (overlap stitching)."""
    with TiffWriter(tmp_path / "rw.tif", 64, 64, 2, "uint8") as w:
        a = rng.integers(0, 255, size=(2, 16, 16), dtype=np.uint8)
        w.write(a, window=Window(8, 8, 16, 16))
        back = w.read(window=Window(8, 8, 16, 16))
        np.testing.assert_array_equal(back, a)
