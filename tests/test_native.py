"""Native (C++) batch-assembler parity vs the numpy reference path."""

import numpy as np
import pytest

from mixstage_tpu.data import native


@pytest.fixture(scope="module")
def lib(require_native):
    # the prebuilt libbatcher.so ships in-repo: failure to load is a FAIL,
    # not a skip (conftest.require_native)
    return require_native(native.get_lib, native._LIB_PATH, "batcher")


def test_gather_windows_matches_numpy(lib):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 32))
    starts = np.array([0, 17, 100, 380], np.int64)
    out = native.gather_windows(data, starts, steps=20, stride=6)
    idx = starts[:, None] + 6 * np.arange(20)[None, :]
    np.testing.assert_array_equal(out, data[idx])


def test_znorm_mask_matches_numpy(lib):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64, 104))
    mean = rng.normal(size=(104,))
    var = np.abs(rng.normal(size=(104,))) + 0.1
    mask = [0, 7, 8, 9]
    out = native.znorm_mask(x, mean, var, mask)
    # numpy reference (ZNorm then RemoveJoints)
    std = np.sqrt(var)
    z = (x - mean) / std
    keep = sorted(set(range(52)) - set(mask))
    ref = z.reshape(4, 64, 2, 52)[..., keep].reshape(4, 64, -1)
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-6)
    assert out.dtype == np.float32


def test_znorm_mask_zero_variance_eps(lib):
    x = np.ones((1, 4, 104))
    mean = np.zeros(104)
    var = np.zeros(104)        # degenerate: std -> eps (transform.py:221-226)
    out = native.znorm_mask(x, mean, var, [0], eps=1e-8)
    assert np.isfinite(out).all()
    assert out.max() == pytest.approx(1e8)


def test_znorm_f32_matches_numpy(lib):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 64, 128))
    mean = rng.normal(size=(128,))
    var = np.abs(rng.normal(size=(128,))) + 0.5
    out = native.znorm_f32(x, mean, var)
    ref = ((x - mean) / np.sqrt(var)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
