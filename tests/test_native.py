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


def test_rvl_corrupt_input_fails_cleanly():
    """Truncated / bit-flipped RVL streams return an error, never OOB."""
    rng = np.random.RandomState(3)
    depth = (rng.rand(60, 80) * 6000).astype(np.uint16)
    blob = N.rvl_compress(depth)
    for cut in range(0, len(blob), 13):
        try:
            back = N.rvl_decompress(blob[:cut], depth.shape)
            # a prefix may decode to garbage but must keep the shape
            assert back.shape == depth.shape
        except ValueError:
            pass  # clean error is fine


@pytest.mark.skipif(os.environ.get("SKIP_SANITIZERS") == "1",
                    reason="sanitizers disabled")
def test_sanitizer_selftests(tmp_path):
    """ASan/UBSan + TSan self-test binaries build and pass (SURVEY 5.2:
    sanitizer CI for the native runtime)."""
    import subprocess

    from rtabmap_tpu.maps.texture import write_png

    d = os.path.join(os.path.dirname(N.__file__))
    for tgt in ("selftest-asan", "selftest-tsan"):
        r = subprocess.run(["make", "-C", d, tgt], capture_output=True,
                           text=True)
        if r.returncode != 0:
            pytest.skip(f"{tgt} build failed (toolchain without sanitizers)")
    # PNG fixtures for the threaded loader path
    rng = np.random.RandomState(0)
    imgs = []
    for k in range(5):
        p = str(tmp_path / f"im{k}.png")
        write_png(p, rng.rand(48, 64).astype(np.float32))
        imgs.append(p)
    for tgt in ("selftest-asan", "selftest-tsan"):
        r = subprocess.run([os.path.join(d, tgt)] + imgs,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, f"{tgt}: {r.stdout}\n{r.stderr}"
        assert "native_selftest OK" in r.stdout
