"""Structured packed-conv kernel (kernels/packed_conv.py) — interpret-mode
exactness vs XLA's dense execution of the same 1/8-dense packed k3.

Reference behavior being accelerated: the fine k3 SAME convs of
/root/reference/networks/VNet3d.py:102-158 executed in the space-to-depth
packed domain (models/vnet_packed.py pack_k3_to_k3_coarse).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuseg.models.vnet_packed import DN, pack_k3_to_k3_coarse
from tpuseg.kernels.packed_conv import (
    packed_conv3d_structured, _taps, pack_weight_structured,
)


def _dense(x, w3, bias):
    y = jax.lax.conv_general_dilated(
        x, w3.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )
    return y + bias.astype(x.dtype)


def test_structural_k_is_8x8c():
    # the 27-tap 1/8-dense kernel has exactly 8 * 8C structural rows
    for cf in (2, 16):
        _, k_total = _taps(cf)
        assert k_total == 8 * 8 * cf


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("shape", [(2, 5, 4, 4), (1, 3, 6, 5)])
def test_packed_conv_kernel_matches_dense(shape, relu):
    rng = np.random.default_rng(0)
    cf = 2
    b, d, h, w = shape
    x = jnp.asarray(rng.normal(size=(b, d, h, w, 8 * cf)).astype(np.float32))
    wf = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cf, cf)) * 0.3).astype(np.float32)
    )
    w3 = pack_k3_to_k3_coarse(wf)
    bias = jnp.asarray(rng.normal(size=(8 * cf,)).astype(np.float32))

    want = _dense(x, w3, bias)
    if relu:
        want = jnp.maximum(want, 0.0)
    got = packed_conv3d_structured(
        x, w3, bias, c_fine=cf, relu=relu, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_stacked_weight_reproduces_dense_rows():
    # every structural row of the stacked weight is a row of the dense
    # packed kernel; zero rows of the dense kernel are exactly the ones
    # not covered by the schedule
    rng = np.random.default_rng(1)
    cf = 2
    wf = jnp.asarray(rng.normal(size=(3, 3, 3, cf, cf)).astype(np.float32))
    w3 = np.asarray(pack_k3_to_k3_coarse(wf))
    sched, k_total = _taps(cf)
    wk = np.asarray(pack_weight_structured(jnp.asarray(w3), cf, k_total))
    covered = np.zeros(w3.shape[:4], bool)
    row = 0
    for (a, b, c), (lo, hi), k_off in sched:
        assert k_off == row
        np.testing.assert_array_equal(wk[row:row + hi - lo], w3[a, b, c, lo:hi])
        covered[a, b, c, lo:hi] = True
        row += hi - lo
    assert row == k_total
    # the uncovered taps are structurally zero in the dense kernel
    np.testing.assert_array_equal(w3[~covered], 0.0)
