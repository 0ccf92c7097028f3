"""Native parallel .npy loader tests."""
import os

import numpy as np
import pytest

from pde_policylearning_tpu.native import load_npy_batch, native_available


@pytest.fixture()
def npy_folder(tmp_path):
    arrays = [np.random.rand(8, 8).astype(np.float32) for _ in range(20)]
    paths = []
    for i, a in enumerate(arrays):
        p = str(tmp_path / f"f_{i:03d}.npy")
        np.save(p, a)
        paths.append(p)
    return paths, arrays


def test_native_builds():
    assert native_available(), "cc toolchain should be present in the image"


def test_batch_matches_numpy(npy_folder):
    paths, arrays = npy_folder
    out = load_npy_batch(paths)
    assert out.shape == (20, 8, 8)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_heterogeneous_fallback(tmp_path, npy_folder):
    paths, arrays = npy_folder
    odd = str(tmp_path / "odd.npy")
    np.save(odd, np.random.rand(4, 4).astype(np.float32))
    # heterogeneous shapes -> the wrapper falls back to numpy and raises
    # the same error np.stack would
    with pytest.raises(ValueError):
        load_npy_batch(paths + [odd])


def test_large_batch_speed(npy_folder, tmp_path):
    # build a bigger folder and just check it loads correctly
    paths = []
    ref = []
    for i in range(200):
        a = np.random.rand(16, 16).astype(np.float64)
        p = str(tmp_path / f"big_{i:04d}.npy")
        np.save(p, a)
        paths.append(p)
        ref.append(a)
    out = load_npy_batch(paths, n_threads=8)
    np.testing.assert_array_equal(out, np.stack(ref))
