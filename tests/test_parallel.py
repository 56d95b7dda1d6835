"""Mesh / sharding / halo-exchange tests on the 8-virtual-device CPU mesh
(SURVEY.md §4.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core.mesh import (
    DATA_AXIS,
    MeshContext,
    batch_sharding,
    make_mesh,
    shard_batch_pytree,
    param_sharding_rule_fn,
)
from tpuseg.parallel.spatial import spatial_partition_infer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_axes():
    mesh = make_mesh(data=4, model=2, space=1)
    assert mesh.shape == {"data": 4, "model": 2, "space": 1}
    mesh = make_mesh()  # all devices to data
    assert mesh.shape["data"] == len(jax.devices())


def test_batch_sharding_distributes():
    mesh = make_mesh(data=8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = shard_batch_pytree(mesh, {"x": x})["x"]
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_psum_over_sharded_batch():
    mesh = make_mesh(data=8)
    x = np.ones((8, 4), np.float32)
    arr = jax.device_put(x, batch_sharding(mesh, 2))
    total = jax.jit(lambda a: jnp.sum(a))(arr)
    assert float(total) == 32.0


def test_param_sharding_rule():
    mesh = make_mesh(data=4, model=2)
    rule = param_sharding_rule_fn(mesh, model_axis_min_size=16)
    big = np.zeros((3, 3, 3, 16, 32), np.float32)
    small = np.zeros((7,), np.float32)
    s_big = rule(big)
    s_small = rule(small)
    assert s_big.spec[-1] == "model"
    assert all(p is None for p in s_small.spec)


def test_spatial_partition_identity():
    """With apply_fn = identity, margins crop away exactly."""
    mesh = make_mesh(data=1, model=1, space=8)
    vol = np.random.default_rng(0).random((32, 8, 8, 1)).astype(np.float32)
    out = spatial_partition_infer(vol, lambda x: x, mesh, margin=2)
    np.testing.assert_allclose(np.asarray(out), vol, atol=1e-6)


def test_spatial_partition_conv_exact_with_sufficient_margin():
    """A depth-3 mean filter has receptive radius 1: margin>=1 must make the
    z-sharded result match the single-device SAME (zero-pad) conv exactly —
    including the global volume ends (boundary="zero" halo)."""
    mesh = make_mesh(data=1, model=1, space=8)
    rng = np.random.default_rng(1)
    vol = rng.random((32, 8, 8, 1)).astype(np.float32)
    k = jnp.ones((3, 1, 1, 1, 1), jnp.float32) / 3.0

    def conv(x):  # (D,H,W,C) SAME depth-conv (zero padding)
        return jax.lax.conv_general_dilated(
            x[None], k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    expect = np.asarray(conv(jnp.asarray(vol)))
    got = np.asarray(spatial_partition_infer(vol, conv, mesh, margin=1))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_spatial_partition_replicate_boundary():
    """boundary="replicate" matches a conv whose input is edge-replicated."""
    mesh = make_mesh(data=1, model=1, space=8)
    rng = np.random.default_rng(2)
    vol = rng.random((16, 8, 8, 1)).astype(np.float32)
    k = jnp.ones((3, 1, 1, 1, 1), jnp.float32) / 3.0

    def conv_valid(x):
        return jax.lax.conv_general_dilated(
            x[None], k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    xp = jnp.concatenate([jnp.asarray(vol)[:1], jnp.asarray(vol), jnp.asarray(vol)[-1:]], axis=0)
    expect = np.asarray(conv_valid(xp))[1:-1]
    got = np.asarray(
        spatial_partition_infer(vol, conv_valid, mesh, margin=1, boundary="replicate")
    )
    np.testing.assert_allclose(got, expect, atol=1e-6)
