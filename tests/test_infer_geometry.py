"""Tests: sliding-window reconstruction, whole-volume geometry round-trip,
NIfTI IO round-trip, ITK-equivalent resampling."""
import os
import tempfile

import jax
import numpy as np
import jax.numpy as jnp

from tpuseg.data.geometry import (
    Volume,
    resample_to_size,
    resample_to_spacing,
    largest_connected_component,
    morphological_operation,
    nonzero_z_range,
)
from tpuseg.data.nifti import read_nifti, write_nifti
from tpuseg.infer.sliding_window import (
    grid_positions,
    sliding_window_inference,
    probs_to_mask,
)
from tpuseg.infer.volume import infer_volume


def test_grid_positions_cover():
    g = grid_positions((50, 64, 32), (32, 32, 32), 0.5)
    for d in range(3):
        assert g[:, d].min() == 0
    assert (g[:, 0] + 32).max() == 50
    assert (g[:, 1] + 32).max() == 64
    assert (g[:, 2] + 32).max() == 32  # single position on exact-fit axis


def test_sliding_window_identity_reconstruction(rng):
    """An identity network (probs = input) must reconstruct the volume
    exactly under weighted overlap merging."""
    vol = rng.random((40, 48, 56)).astype(np.float32)

    def apply_fn(patches):
        return patches  # (B, *patch, 1) -> (B, *patch, 1)

    out = sliding_window_inference(vol, (32, 32, 32), apply_fn, 1, batch_size=4)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)


def test_sliding_window_gaussian_identity(rng):
    """Gaussian-weighted merge of an identity network still reconstructs
    the volume exactly (weights normalize out)."""
    vol = rng.random((40, 48, 40)).astype(np.float32)

    def apply_fn(patches):
        return patches

    out = sliding_window_inference(
        vol, (32, 32, 32), apply_fn, 1, batch_size=4, gaussian=True
    )
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-4)


def test_sliding_window_small_volume_pads(rng):
    vol = rng.random((20, 20, 20)).astype(np.float32)

    def apply_fn(patches):
        return patches

    out = sliding_window_inference(vol, (32, 32, 32), apply_fn, 1, batch_size=2)
    assert out.shape == (20, 20, 20, 1)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)


def test_probs_to_mask():
    p = np.zeros((2, 2, 2, 3), np.float32)
    p[..., 1] = 1.0
    assert (probs_to_mask(p) == 1).all()
    b = np.full((2, 2, 2, 1), 0.7, np.float32)
    assert (probs_to_mask(b) == 1).all()


def test_resample_constant_preserved():
    vol = Volume(np.full((10, 12, 14), 3.5, np.float32), spacing=(1, 1, 1))
    out = resample_to_size(vol, (28, 24, 20), "linear")
    assert out.array.shape == (20, 24, 28)
    np.testing.assert_allclose(out.array, 3.5, atol=1e-5)
    # spacing adjusts to preserve physical extent
    np.testing.assert_allclose(out.spacing, (0.5, 0.5, 0.5))


def test_resample_nearest_preserves_labels():
    lab = np.zeros((8, 8, 8), np.uint8)
    lab[2:6, 2:6, 2:6] = 3
    vol = Volume(lab)
    out = resample_to_size(vol, (16, 16, 16), "nearest")
    assert set(np.unique(out.array)) <= {0, 3}
    # downsample back
    back = resample_to_size(out, (8, 8, 8), "nearest")
    np.testing.assert_array_equal(back.array, lab)


def test_resample_to_spacing():
    vol = Volume(np.zeros((10, 10, 10), np.float32), spacing=(2.0, 2.0, 2.0))
    out = resample_to_spacing(vol, (1.0, 1.0, 1.0), "linear")
    assert out.array.shape == (20, 20, 20)
    np.testing.assert_allclose(out.spacing, (1, 1, 1))


def test_nifti_roundtrip(rng):
    arr = (rng.random((6, 7, 8)) * 100).astype(np.float32)
    vol = Volume(
        arr,
        origin=(1.5, -2.0, 3.0),
        spacing=(0.7, 0.8, 2.5),
        direction=(1, 0, 0, 0, 1, 0, 0, 0, 1),
    )
    for suffix in (".nii", ".nii.gz"):
        path = os.path.join(tempfile.mkdtemp(), "t" + suffix)
        write_nifti(vol, path)
        back = read_nifti(path)
        np.testing.assert_allclose(back.array, arr, rtol=1e-6)
        np.testing.assert_allclose(back.origin, vol.origin, atol=1e-5)
        np.testing.assert_allclose(back.spacing, vol.spacing, atol=1e-5)
        np.testing.assert_allclose(back.direction, vol.direction, atol=1e-5)


def test_nifti_uint8_mask_roundtrip():
    mask = np.zeros((5, 6, 7), np.uint8)
    mask[1:3] = 2
    path = os.path.join(tempfile.mkdtemp(), "m.nii.gz")
    write_nifti(Volume(mask, spacing=(1, 1, 3)), path)
    back = read_nifti(path)
    np.testing.assert_array_equal(back.array, mask)
    assert back.array.dtype == np.uint8


def test_infer_volume_geometry_roundtrip(rng):
    src = Volume(
        rng.random((30, 40, 50)).astype(np.float32),
        origin=(5, 6, 7),
        spacing=(0.9, 0.8, 1.1),
    )

    def forward(batch):
        # fake binary net: probability = normalized input
        x = jnp.asarray(batch)
        return (x - x.min()) / (x.max() - x.min() + 1e-6)

    mask = infer_volume(src, forward, (32, 32, 32), num_classes=1)
    assert mask.array.shape == src.array.shape
    assert mask.GetSpacing() == src.GetSpacing()
    assert mask.GetOrigin() == src.GetOrigin()
    assert mask.array.dtype == np.uint8


def test_cc_and_morphology():
    m = np.zeros((10, 10, 10), np.uint8)
    m[1:4, 1:4, 1:4] = 1  # 27 voxels
    m[7:9, 7:9, 7:9] = 1  # 8 voxels
    big = largest_connected_component(m)
    assert big.sum() == 27
    er = morphological_operation(m, "erode")
    assert er.sum() < m.sum()
    assert nonzero_z_range(m) == (1, 8)


def test_sliding_window_packed_and_bf16_transfer():
    """pack_mask fetch unpacks to exactly the plain mask; bfloat16 transfer
    keeps the constant-field reconstruction exact."""
    from tpuseg.infer.sliding_window import sliding_window_inference

    rng = np.random.default_rng(0)
    vol = rng.normal(size=(24, 24, 32)).astype(np.float32)

    def apply_fn(patches):  # prob of class1 = sigmoid(mean-ish signal)
        s = jnp.mean(patches, axis=-1, keepdims=True)
        p1 = jax.nn.sigmoid(4.0 * s)
        return jnp.concatenate([1 - p1, p1], axis=-1)

    base = sliding_window_inference(vol, (16, 16, 16), apply_fn, 2, 4, return_mask=True)
    packed = sliding_window_inference(
        vol, (16, 16, 16), apply_fn, 2, 4, return_mask=True, pack_mask=True
    )
    np.testing.assert_array_equal(base, packed)

    const = np.full((24, 24, 32), 0.7, np.float32)
    m1 = sliding_window_inference(const, (16, 16, 16), apply_fn, 2, 4, return_mask=True)
    m2 = sliding_window_inference(
        const, (16, 16, 16), apply_fn, 2, 4, return_mask=True,
        transfer_dtype="bfloat16",
    )
    np.testing.assert_array_equal(m1, m2)
    assert (m1 == m1.flat[0]).all()


def test_sliding_window_uint8_transfer():
    """uint8-quantized upload: masks agree with the f32 path on a
    well-separated synthetic signal; constant-field stays exact."""
    from tpuseg.infer.sliding_window import sliding_window_inference

    rng = np.random.default_rng(1)
    vol = rng.normal(size=(24, 24, 32)).astype(np.float32)
    vol[6:18, 6:18, 8:24] += 4.0

    def apply_fn(patches):
        s = jnp.mean(patches, axis=-1, keepdims=True)
        p1 = jax.nn.sigmoid(2.0 * (s - 2.0))
        return jnp.concatenate([1 - p1, p1], axis=-1)

    base = sliding_window_inference(vol, (16, 16, 16), apply_fn, 2, 4, return_mask=True)
    q = sliding_window_inference(
        vol, (16, 16, 16), apply_fn, 2, 4, return_mask=True,
        transfer_dtype="uint8",
    )
    assert (base == q).mean() > 0.999
    # padding path (volume smaller than patch): pad voxels dequant to ~0
    small = vol[:12]
    m1 = sliding_window_inference(small, (16, 16, 16), apply_fn, 2, 4, return_mask=True)
    m2 = sliding_window_inference(
        small, (16, 16, 16), apply_fn, 2, 4, return_mask=True,
        transfer_dtype="uint8",
    )
    assert (m1 == m2).mean() > 0.999


def test_sliding_window_hu_coded_uint8_lossless():
    """The LOSSLESS uint8 path: integer-HU CT truncated to a <=255-HU
    window codes exactly into 1 byte/voxel; the meanstd normalization is
    folded into the device-side dequant affine.  Inputs reconstruct to f32
    rounding and the mask matches the host-normalized f32 upload path."""
    from tpuseg.data.normalize import truncate_and_normalize

    rng = np.random.default_rng(2)
    hu = rng.integers(-300, 400, size=(24, 24, 32)).astype(np.float32)
    hu[6:18, 6:18, 8:24] = rng.integers(20, 90, size=(12, 12, 16))

    lo, hi = -100.0, 100.0
    trunc = np.clip(hu, lo, hi)
    mean, std = float(trunc.mean()), float(trunc.std())
    normalized = truncate_and_normalize(hu, hi, lo, "meanstd")
    codes = (trunc - lo).astype(np.uint8)  # span 200 <= 255: exact
    dequant = (1.0 / std, (lo - mean) / std)

    # probs = network input passthrough -> merged probs compare the actual
    # dequantized network inputs between the two transfer paths
    def ident(patches):
        return jnp.concatenate([patches, -patches], axis=-1).astype(jnp.float32)

    p_f32 = sliding_window_inference(normalized, (16, 16, 16), ident, 2, 4)
    p_u8 = sliding_window_inference(
        codes, (16, 16, 16), ident, 2, 4, dequant=dequant
    )
    np.testing.assert_allclose(p_f32, p_u8, atol=2e-6)

    def apply_fn(patches):
        s = jnp.mean(patches, axis=-1, keepdims=True)
        p1 = jax.nn.sigmoid(3.0 * s)
        return jnp.concatenate([1 - p1, p1], axis=-1)

    m_f32 = sliding_window_inference(
        normalized, (16, 16, 16), apply_fn, 2, 4, return_mask=True
    )
    m_u8 = sliding_window_inference(
        codes, (16, 16, 16), apply_fn, 2, 4, return_mask=True, dequant=dequant
    )
    np.testing.assert_array_equal(m_f32, m_u8)


def test_infer_volume_patched_uint8_transfer():
    """infer_volume_patched(transfer_dtype='uint8') folds the HU window
    into the coded upload and matches the default f32 path on integer-HU
    volumes (both window orders of the reference: (-100,100) VNet3d and
    (-1024,-800) UNet3d lungs)."""
    from tpuseg.infer.volume import infer_volume_patched

    rng = np.random.default_rng(3)

    def apply_fn(patches):
        s = jnp.mean(patches, axis=-1, keepdims=True)
        p1 = jax.nn.sigmoid(2.0 * s)
        return jnp.concatenate([1 - p1, p1], axis=-1)

    for upper, lower, gen_lo, gen_hi in ((100, -100, -300, 400), (-800, -1024, -1100, -700)):
        hu = rng.integers(gen_lo, gen_hi, size=(24, 24, 32)).astype(np.float32)
        src = Volume(hu)
        m_f32 = infer_volume_patched(
            src, apply_fn, (16, 16, 16), num_classes=2,
            hu_window=(upper, lower, "meanstd"), batch_size=4,
        )
        m_u8 = infer_volume_patched(
            src, apply_fn, (16, 16, 16), num_classes=2,
            hu_window=(upper, lower, "meanstd"), batch_size=4,
            transfer_dtype="uint8",
        )
        assert (m_f32.array == m_u8.array).mean() > 0.9999

    # WITH a linear spacing resample (the deployed inference_patch path):
    # interpolated voxels are non-integer HU, so coding quantizes them at
    # <=0.5 HU — masks must still agree to well under 1%
    hu = rng.integers(-300, 400, size=(24, 24, 32)).astype(np.float32)
    src = Volume(hu, spacing=(1.0, 1.0, 1.0))
    kw = dict(num_classes=2, hu_window=(100, -100, "meanstd"), batch_size=4,
              new_spacing_xyz=(0.8, 0.8, 0.8))
    m_f32 = infer_volume_patched(src, apply_fn, (16, 16, 16), **kw)
    m_u8 = infer_volume_patched(
        src, apply_fn, (16, 16, 16), transfer_dtype="uint8", **kw
    )
    assert (m_f32.array == m_u8.array).mean() > 0.99


def test_hu_code_volume_edge_cases():
    from tpuseg.infer.volume import hu_code_volume

    rng = np.random.default_rng(4)
    # narrow integer window: bit-exact reconstruction
    hu = rng.integers(-300, 400, size=(8, 8, 8)).astype(np.float32)
    codes, (s, o) = hu_code_volume(hu, 100, -100, "meanstd")
    trunc = np.clip(hu, -100, 100)
    rec = codes.astype(np.float32) * s + o
    np.testing.assert_allclose(rec, (trunc - trunc.mean()) / trunc.std(), atol=3e-6)

    # wide window (span 1400 > 255): quantization step span/255, error <= step/2
    codes, (s, o) = hu_code_volume(hu, 400, -1000, "meanstd")
    trunc = np.clip(hu, -1000, 400)
    normalized = (trunc - trunc.mean()) / trunc.std()
    rec = codes.astype(np.float32) * s + o
    step_norm = (1400 / 255.0) / trunc.std()
    assert np.abs(rec - normalized).max() <= step_norm / 2 + 1e-6

    # maxmin method maps onto [0, 1]
    codes, (s, o) = hu_code_volume(hu, 100, -100, "maxmin")
    rec = codes.astype(np.float32) * s + o
    trunc = np.clip(hu, -100, 100)
    expected = (trunc - trunc.min()) / (trunc.max() - trunc.min())
    np.testing.assert_allclose(rec, expected, atol=3e-6)

    # constant volume: degenerate std/range guarded
    const = np.full((4, 4, 4), 37.0, np.float32)
    codes, (s, o) = hu_code_volume(const, 100, -100, "meanstd")
    rec = codes.astype(np.float32) * s + o
    np.testing.assert_allclose(rec, 0.0, atol=1e-6)


def test_pipelined_inference_uint8_stream():
    """The multi-volume streaming mode accepts pre-coded uint8 volumes
    with shared or per-volume dequant affines and matches the
    single-volume path."""
    from tpuseg.infer.sliding_window import (
        sliding_window_inference,
        sliding_window_inference_pipelined,
    )

    rng = np.random.default_rng(5)

    def apply_fn(patches):
        s = jnp.mean(patches, axis=-1, keepdims=True)
        p1 = jax.nn.sigmoid(3.0 * s)
        return jnp.concatenate([1 - p1, p1], axis=-1)

    vols_hu = [
        rng.integers(-200, 300, size=(24, 24, 32)).astype(np.float32)
        for _ in range(3)
    ]
    codes, dqs, singles = [], [], []
    for hu in vols_hu:
        trunc = np.clip(hu, -100, 100)
        mean, std = float(trunc.mean()), float(trunc.std())
        codes.append((trunc + 100.0).astype(np.uint8))
        dqs.append((1.0 / std, (-100.0 - mean) / std))
        singles.append(
            sliding_window_inference(
                codes[-1], (16, 16, 16), apply_fn, 2, 4,
                return_mask=True, dequant=dqs[-1],
            )
        )

    streamed = sliding_window_inference_pipelined(
        codes, (16, 16, 16), apply_fn, 2, 4, dequants=dqs
    )
    for s, p in zip(singles, streamed):
        np.testing.assert_array_equal(s, p)

    # shared dequant (all volumes normalized with one affine)
    shared = sliding_window_inference_pipelined(
        codes, (16, 16, 16), apply_fn, 2, 4, dequants=dqs[0]
    )
    ref0 = sliding_window_inference(
        codes[1], (16, 16, 16), apply_fn, 2, 4, return_mask=True, dequant=dqs[0]
    )
    np.testing.assert_array_equal(shared[1], ref0)
