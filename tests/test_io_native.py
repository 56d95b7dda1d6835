"""Tests for the C++ io_native extension (built on demand with g++)."""
import os
import numpy as np
import pytest

from tpuseg import io_native

pytestmark = pytest.mark.skipif(
    not io_native.available(), reason="native toolchain unavailable"
)


def test_native_resample_linear_matches_scipy(rng):
    from scipy import ndimage

    arr = rng.random((10, 12, 14)).astype(np.float32)
    out = io_native.resample_linear(arr, (20, 18, 7))
    fz, fy, fx = 10 / 20, 12 / 18, 14 / 7
    zz, yy, xx = np.meshgrid(
        np.arange(20) * fz, np.arange(18) * fy, np.arange(7) * fx, indexing="ij"
    )
    expect = ndimage.map_coordinates(arr, [zz, yy, xx], order=1, mode="nearest")
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_native_resample_nearest_labels(rng):
    lab = rng.integers(0, 4, (8, 8, 8)).astype(np.uint8)
    out = io_native.resample_nearest(lab, (16, 16, 16))
    assert set(np.unique(out)) <= set(np.unique(lab))
    back = io_native.resample_nearest(out, (8, 8, 8))
    np.testing.assert_array_equal(back, lab)


def test_native_nn_distances_matches_scipy(rng):
    from scipy.spatial import cKDTree

    a = rng.random((200, 3)) * 10
    b = rng.random((300, 3)) * 10
    got = io_native.nn_distances(a, b)
    expect, _ = cKDTree(b).query(a)
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_native_percentile_zscore_matches_python(rng):
    from tpuseg.data.normalize import percentile_zscore

    arr = rng.random((16, 16, 16)).astype(np.float32) * 100
    arr[arr < 5] = 0  # some zeros
    got = io_native.percentile_zscore(arr)
    expect = percentile_zscore(arr)
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_geometry_uses_native_path(rng):
    """resample_to_size on float32 3D goes through C++ and matches scipy."""
    from tpuseg.data.geometry import Volume, resample_to_size

    arr = rng.random((9, 11, 13)).astype(np.float32)
    out = resample_to_size(Volume(arr), (26, 22, 18), "linear")
    assert out.array.shape == (18, 22, 26)
    # constant field stays constant through either path
    const = resample_to_size(Volume(np.full((8, 8, 8), 2.0, np.float32)), (12, 12, 12))
    np.testing.assert_allclose(const.array, 2.0, atol=1e-6)


def test_nifti_native_codec_matches_python():
    """The C++ codec (nifti_read_bytes/nifti_write_bytes) and the pure
    Python path must read/write identical volumes, .nii and .nii.gz."""
    import tempfile

    import tpuseg.data.nifti as nifti_mod
    from tpuseg import io_native
    from tpuseg.data.geometry import Volume
    from tpuseg.data.nifti import read_nifti, write_nifti

    if not io_native.available():
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(3)
    for suffix in (".nii", ".nii.gz"):
        arr = (rng.normal(size=(10, 12, 14)) * 50).astype(np.float32)
        v = Volume(arr, origin=(1.0, -2.0, 3.0), spacing=(0.7, 0.8, 0.9))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "vol" + suffix)
            write_nifti(v, p)  # native write
            back_native = read_nifti(p)  # native read
            orig = nifti_mod._native
            nifti_mod._native = lambda: None
            try:
                back_py = read_nifti(p)  # python read of native-written file
                p2 = os.path.join(d, "vol_py" + suffix)
                write_nifti(v, p2)  # python write
            finally:
                nifti_mod._native = orig
            back_native2 = read_nifti(p2)  # native read of python-written file
            for b in (back_native, back_py, back_native2):
                np.testing.assert_allclose(b.array, arr)
                np.testing.assert_allclose(b.spacing, v.spacing, atol=1e-6)
