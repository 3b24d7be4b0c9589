"""Native C++ library: RVL codec, zlib, decoders, threaded loader."""
import glob
import os

import numpy as np
import pytest

from rtabmap_tpu import native as N

SAMPLES = sorted(glob.glob("/root/reference/data/samples/*.jpg"))[:6]


def test_native_available():
    assert N.available(), "native library failed to build/load"


def test_rvl_roundtrip():
    rng = np.random.RandomState(0)
    depth = (rng.rand(120, 160) * 5000).astype(np.uint16)
    depth[rng.rand(120, 160) < 0.3] = 0  # holes like real depth
    blob = N.rvl_compress(depth)
    assert len(blob) < depth.nbytes  # compresses
    back = N.rvl_decompress(blob, depth.shape)
    np.testing.assert_array_equal(back, depth)


def test_rvl_smooth_depth_compresses_well():
    yy, xx = np.mgrid[0:240, 0:320]
    depth = (2000 + 3 * xx + 2 * yy).astype(np.uint16)
    blob = N.rvl_compress(depth)
    assert len(blob) < depth.nbytes / 3  # deltas are tiny


def test_zlib_roundtrip():
    data = os.urandom(1000) + b"\x00" * 5000
    blob = N.compress_blob(data)
    assert N.decompress_blob(blob, len(data)) == data


@pytest.mark.skipif(not SAMPLES, reason="no sample images")
def test_jpeg_decode_matches_pil():
    from PIL import Image

    blob = open(SAMPLES[0], "rb").read()
    g = N.decode_gray(blob)
    ref = np.asarray(Image.open(SAMPLES[0]).convert("L"))
    assert g.shape == ref.shape
    # libjpeg and PIL agree closely on grayscale conversion
    assert np.abs(g.astype(int) - ref.astype(int)).mean() < 3.0


def test_png16_roundtrip(tmp_path):
    from PIL import Image

    depth = (np.random.RandomState(1).rand(60, 80) * 30000).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(depth).save(p)
    got = N.decode_depth16(open(p, "rb").read())
    np.testing.assert_array_equal(got, depth)


@pytest.mark.skipif(not SAMPLES, reason="no sample images")
def test_frame_loader_prefetch(tmp_path):
    from PIL import Image

    # build depth files for half the frames
    depth_files = []
    for i, f in enumerate(SAMPLES):
        d = (np.ones((384, 512)) * (1000 + i)).astype(np.uint16)
        p = str(tmp_path / f"d{i}.png")
        Image.fromarray(d).save(p)
        depth_files.append(p)
    loader = N.FrameLoader(SAMPLES, depth_files, threads=2)
    for i in range(len(SAMPLES)):
        g, d = loader.get(i)
        assert g.shape == (384, 512)
        assert d is not None and d[0, 0] == 1000 + i
    loader.close()
