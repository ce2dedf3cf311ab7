"""Native C++ preprocessing vs the numpy reference implementations."""

import numpy as np
import pytest

from affganwriting_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native lib not built (python -m affganwriting_tpu.utils.native build)",
)


def _numpy_preprocess(img):
    # the pure-numpy path, bypassing the native dispatch
    from affganwriting_tpu.data.words import _resize_bilinear

    f = img.astype(np.float32) / 255.0
    h, w = f.shape
    new_w = int(w * (64 / h)) + 1
    r = 1.0 - _resize_bilinear(f, 64, new_w)
    out = np.zeros((64, 216), np.float32)
    cw = min(new_w, 216)
    out[:, :cw] = r[:, :cw]
    return (out - 0.5) / 0.5


def test_preprocess_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = (rng.random((3, 91, 300)) * 255).astype(np.uint8)
    got = native.preprocess_words_native(imgs)
    want = np.stack([_numpy_preprocess(im) for im in imgs])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_affine_matches_numpy():
    from affganwriting_tpu.data.augment import rotate, shear

    rng = np.random.default_rng(1)
    img = rng.random((32, 64)).astype(np.float32)
    got = native.affine_native(img, degrees=3.0)
    want = rotate(img, 3.0)
    np.testing.assert_allclose(got, want, atol=1e-3)
    got = native.affine_native(img, shear=0.2)
    want = shear(img, 0.2)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_elastic_runs_and_preserves_shape():
    rng = np.random.default_rng(2)
    img = rng.random((64, 216)).astype(np.float32)
    out = native.elastic_native(img, np.random.default_rng(3), 300.0, 8.0)
    assert out.shape == img.shape and np.isfinite(out).all()
    # deterministic per seed
    out2 = native.elastic_native(img, np.random.default_rng(3), 300.0, 8.0)
    np.testing.assert_array_equal(out, out2)


def test_native_throughput_sane():
    import time

    rng = np.random.default_rng(0)
    imgs = (rng.random((256, 91, 300)) * 255).astype(np.uint8)
    t0 = time.perf_counter()
    native.preprocess_words_native(imgs)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native batch preprocess too slow: {dt:.2f}s"


def test_native_otsu_mask_matches_scipy():
    import numpy as np
    import pytest

    from affganwriting_tpu.utils import native
    from affganwriting_tpu.data import line_augment as la

    if native.load() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    img = np.clip(0.9 + rng.normal(0, 0.02, (48, 96)), 0, 1)
    img[15:25, 20:70] = np.clip(0.1 + rng.normal(0, 0.02, (10, 50)), 0, 1)
    img = img.astype(np.float32)

    nat = native.otsu_fg_mask_native(img[None])[0]
    # scipy path
    th = la.otsu_threshold(img)
    from scipy import ndimage

    ref = ndimage.binary_dilation(
        img < th, structure=la._ellipse(9)).astype(np.float32)
    # identical up to threshold-bin edge effects: allow tiny disagreement
    assert (nat != ref).mean() < 0.02
    assert nat[20, 40] == 1.0 and nat[2, 2] == 0.0


def test_native_grid_warp_identity_and_shift():
    import numpy as np
    import pytest

    from affganwriting_tpu.utils import native

    if native.load() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    img = rng.random((32, 64)).astype(np.float32)
    zero = np.zeros((1, 4, 6), np.float32)
    out = native.grid_warp_native(img[None], zero, zero, cval=1.0)[0]
    np.testing.assert_allclose(out, img, atol=1e-6)
    # constant +1 row shift: out(y, x) = img(y+1, x)
    dy = np.ones((1, 4, 6), np.float32)
    out = native.grid_warp_native(img[None], dy, zero, cval=1.0)[0]
    np.testing.assert_allclose(out[:-1], img[1:], atol=1e-5)
    assert np.allclose(out[-1], 1.0)   # out-of-range -> cval
