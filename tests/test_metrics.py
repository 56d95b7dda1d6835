"""Golden tests for online metrics and the 9-metric 3D evaluator."""
import numpy as np
import jax.numpy as jnp

from tpuseg import metrics
from tpuseg.metrics.seg3d import SegMetric3d


def test_dice_coeff_perfect(rng):
    t = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    assert float(metrics.dice_coeff(jnp.asarray(t), jnp.asarray(t))) > 0.999


def test_dice_coeff_value(rng):
    p = np.zeros((1, 4, 4, 1), np.float32)
    t = np.zeros((1, 4, 4, 1), np.float32)
    p[0, :2, :, 0] = 1.0  # 8 voxels
    t[0, 1:3, :, 0] = 1.0  # 8 voxels, overlap 4
    expect = (2 * 4 + 1e-5) / (8 + 8 + 1e-5)
    np.testing.assert_allclose(
        float(metrics.dice_coeff(jnp.asarray(p), jnp.asarray(t))), expect, rtol=1e-5
    )


def test_multiclass_dice(rng):
    labels = rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32)
    probs = np.eye(3, dtype=np.float32)[labels]
    v = float(metrics.multiclass_dice_coeff(jnp.asarray(probs), jnp.asarray(labels)))
    assert v > 0.999
    v2 = float(metrics.multiclass_dice_coeff_v2(jnp.asarray(probs), jnp.asarray(labels)))
    assert v2 > 0.999


def test_multiclass_iou_v2(rng):
    labels = rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32)
    probs = np.eye(3, dtype=np.float32)[labels]
    v2 = float(metrics.multiclass_iou_coeff_v2(jnp.asarray(probs), jnp.asarray(labels)))
    assert v2 > 0.999


def test_multiclass_iou_v2_golden():
    # 1 sample, 4 pixels, 3 classes; class 2 absent from labels
    labels = np.asarray([[0, 1, 1, 0]], np.int32)
    probs = np.asarray(
        [[[0.8, 0.2, 0.0], [0.3, 0.6, 0.1], [0.1, 0.9, 0.0], [0.9, 0.1, 0.0]]],
        np.float32,
    )
    # class 1 (only present foreground class): inter = 0.6+0.9 = 1.5,
    # union = sum(oh) + sum(p) - inter = 2 + (0.2+0.6+0.9+0.1) - 1.5 = 2.3
    expect = (1.5 + 1e-5) / (2.3 + 1e-5)
    v2 = float(metrics.multiclass_iou_coeff_v2(jnp.asarray(probs), jnp.asarray(labels)))
    np.testing.assert_allclose(v2, expect, rtol=1e-5)


def test_accuracy():
    a = jnp.asarray([1, 2, 3, 4])
    b = jnp.asarray([1, 2, 0, 4])
    np.testing.assert_allclose(float(metrics.accuracy(a, b)), 0.75)


def test_seg3d_identical_masks():
    mask = np.zeros((16, 16, 16), np.uint8)
    mask[4:12, 4:12, 4:12] = 1
    m = SegMetric3d(mask, mask, (1.0, 1.0, 1.0))
    res = m.all_metrics()
    assert res["dice"] == 1.0
    assert res["jaccard"] == 1.0
    assert res["voe"] == 0.0
    assert res["rvd"] == 0.0
    assert res["assd"] == 0.0
    assert res["msd"] == 0.0


def test_seg3d_shifted_cube_distances():
    a = np.zeros((24, 24, 24), np.uint8)
    b = np.zeros((24, 24, 24), np.uint8)
    a[4:12, 4:12, 4:12] = 1
    b[6:14, 4:12, 4:12] = 1  # shifted by 2 in z
    m = SegMetric3d(a, b, (1.0, 1.0, 2.0))  # spacing z=2 after reversal
    res = m.all_metrics()
    assert 0 < res["dice"] < 1
    assert res["assd"] > 0
    assert res["msd"] >= res["assd"]
    assert res["rmsd"] >= res["assd"] * 0.99
    # RVD zero: same volume
    assert abs(res["rvd"]) < 1e-9


def test_seg3d_overlap_values():
    a = np.zeros((8, 8, 8), np.uint8)
    b = np.zeros((8, 8, 8), np.uint8)
    a[:4] = 1   # 256 voxels
    b[2:6] = 1  # 256 voxels, overlap 128
    m = SegMetric3d(a, b, (1, 1, 1))
    dice, _, _ = m.get_dice_coefficient()
    np.testing.assert_allclose(dice, 2 * 128 / 512)
    np.testing.assert_allclose(m.get_jaccard_index(), 128 / 384)
    np.testing.assert_allclose(m.get_FNR(), 128 / 384)
    np.testing.assert_allclose(m.get_FPR(), 128 / 384)
