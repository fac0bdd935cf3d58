"""Native C++ data loader: decode + letterbox parity and batch API.

Skipped wholesale when the toolchain/headers aren't available (the
framework falls back to cv2/PIL everywhere the native path is used).
"""

import os

import numpy as np
import pytest

from yoloclip_tpu import native

if not native.available():
    pytest.skip('native dataload unavailable (no toolchain?)',
                allow_module_level=True)

cv2 = pytest.importorskip('cv2')


@pytest.fixture(scope='module')
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(0)
    img = (rng.rand(480, 854, 3) * 255).astype(np.uint8)
    jp, pp = str(d / 'a.jpg'), str(d / 'b.png')
    cv2.imwrite(jp, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(pp, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img, jp, pp


def test_jpeg_decode_matches_cv2(images):
    img, jp, _ = images
    got = native.decode_image(jp)
    want = cv2.cvtColor(cv2.imread(jp), cv2.COLOR_BGR2RGB)
    assert got.shape == want.shape
    # same libjpeg under both: decode must be byte-identical
    np.testing.assert_array_equal(got, want)


def test_png_decode_lossless(images):
    img, _, pp = images
    np.testing.assert_array_equal(native.decode_image(pp), img)


def test_decode_missing_file_raises(images):
    with pytest.raises(FileNotFoundError):
        native.decode_image('/nonexistent/x.jpg')


def test_letterbox_matches_cv2_within_rounding(images):
    img, _, _ = images
    canvas, scale = native.letterbox_u8(img, (640, 640))
    r = min(640 / 480, 640 / 854)
    assert abs(scale - r) < 1e-6
    rh, rw = int(480 * r), int(854 * r)
    ref = cv2.resize(img, (rw, rh))  # INTER_LINEAR, same sampling rule
    diff = np.abs(canvas[:rh, :rw].astype(int) - ref.astype(int))
    assert diff.max() <= 1            # fixed-point vs float rounding
    # pad region stays zero (top-left paste contract)
    assert rh == 640 or canvas[rh:].max() == 0
    assert rw == 640 or canvas[:, rw:].max() == 0


def test_load_batch_parallel(images):
    img, jp, pp = images
    paths = [jp, pp, jp, '/nonexistent/x.jpg']
    canvases, scales, nfail = native.load_batch(paths, (320, 320),
                                                nthreads=4)
    assert canvases.shape == (4, 320, 320, 3)
    assert nfail == 1
    assert scales[3] == 0.0
    assert (scales[:3] > 0).all()
    # each successful canvas matches the single-image path
    one, s = native.letterbox_u8(native.decode_image(jp), (320, 320))
    np.testing.assert_array_equal(canvases[0], one)
    np.testing.assert_array_equal(canvases[2], one)
    assert abs(scales[0] - s) < 1e-6


def test_dataset_uses_native_decoder(images, tmp_path):
    from yoloclip_tpu.data.coco import _imread_rgb
    _, jp, _ = images
    got = _imread_rgb(jp)
    np.testing.assert_array_equal(got, native.decode_image(jp))
