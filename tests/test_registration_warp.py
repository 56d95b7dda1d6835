"""Tests for grid-sample/warp kernels and the registration model."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.kernels.resample import (
    grid_sample_2d,
    grid_sample_3d,
    resize_volume_device,
    warp_3d,
)
from tpuseg.models.registration import VNet3dRegistration, gradient_loss, ncc_loss


def test_grid_sample_identity(rng):
    vol = jnp.asarray(rng.random((6, 7, 8, 2)).astype(np.float32))
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(6.0), jnp.arange(7.0), jnp.arange(8.0), indexing="ij"),
        axis=-1,
    )
    out = grid_sample_3d(vol, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-6)


def test_grid_sample_midpoint():
    vol = jnp.zeros((2, 1, 1, 1)).at[1, 0, 0, 0].set(10.0)
    coords = jnp.asarray([[0.5, 0.0, 0.0]])
    out = grid_sample_3d(vol, coords)
    np.testing.assert_allclose(float(out[0, 0]), 5.0, atol=1e-6)


def test_grid_sample_2d_matches_manual(rng):
    img = jnp.asarray(rng.random((5, 5, 1)).astype(np.float32))
    out = grid_sample_2d(img, jnp.asarray([[1.5, 2.5]]))
    expect = (img[1, 2] + img[1, 3] + img[2, 2] + img[2, 3]) / 4
    np.testing.assert_allclose(float(out[0, 0]), float(expect[0]), atol=1e-6)


def test_warp_shift(rng):
    vol = jnp.asarray(rng.random((1, 4, 4, 4, 1)).astype(np.float32))
    flow = jnp.ones((1, 4, 4, 4, 3)) * jnp.asarray([1.0, 0, 0])  # sample z+1
    out = warp_3d(vol, flow)
    np.testing.assert_allclose(
        np.asarray(out[0, :3]), np.asarray(vol[0, 1:]), atol=1e-6
    )


def test_resize_volume_device_matches_host(rng):
    from tpuseg.data.geometry import Volume, resample_to_size

    arr = rng.random((8, 10, 12)).astype(np.float32)
    host = resample_to_size(Volume(arr), (24, 20, 16), "linear").array
    dev = np.asarray(resize_volume_device(jnp.asarray(arr), (16, 20, 24), "linear"))
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_registration_model_shapes_and_losses(rng):
    model = VNet3dRegistration(features=8)
    mov = jnp.asarray(rng.random((1, 16, 16, 16, 1)).astype(np.float32))
    fix = jnp.asarray(rng.random((1, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.5).astype(np.float32))
    params = model.init(jax.random.key(0), mov, fix, lab)
    moved, moved_lab, ddf = model.apply(params, mov, fix, lab)
    assert moved.shape == mov.shape
    assert moved_lab.shape == lab.shape
    assert ddf.shape == (1, 16, 16, 16, 3)
    assert float(ncc_loss(mov, mov)) < 1e-5
    assert float(gradient_loss(jnp.zeros((1, 4, 4, 4, 3)))) == 0.0


def test_registration_training_improves(rng):
    """One moving blob, fixed shifted blob: loss should drop over steps."""
    from tpuseg.tasks.registration import make_registration_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    def blob(center):
        zz, yy, xx = np.mgrid[0:16, 0:16, 0:16]
        d = (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
        return np.exp(-d / 18.0).astype(np.float32)[None, ..., None]

    batch = {
        "moving_image": blob((8, 8, 6)),
        "fixed_image": blob((8, 8, 10)),
        "moving_label": (blob((8, 8, 6)) > 0.4).astype(np.float32),
        "fixed_label": (blob((8, 8, 10)) > 0.4).astype(np.float32),
    }
    trainer = make_registration_trainer(
        example_shape=(1, 16, 16, 16, 1), features=8, seg_weight=0.5,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
    )
    trainer._build_steps()
    dev = trainer._put(batch)
    losses = []
    state = trainer.state
    for _ in range(12):
        state, m = trainer._train_step(state, dev)
        losses.append(float(m["loss"]))
        dev = trainer._put(batch)  # donated, re-put
    assert losses[-1] < losses[0]
