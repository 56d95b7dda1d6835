"""Pallas direct 3x3x3 conv3d for small-channel (C<=64) stem layers.

WHY: the zoo's hot op is the stride-1 SAME conv3 at C=16/32 full resolution
(`/root/reference/networks/Unet3d.py:36-62` via `modelUnet.py:879`; VNet
InputTransition/LUConv).  XLA's conv3d lowering reaches only ~2-7 TFLOP/s
at C=16 on v5e (BASELINE.md) because 16 output channels use 16/128 MXU
lanes.  This kernel reformulates the conv so the MXU tile is packed much
denser:

  * input is relaid out once (XLA-side) to (N, D+2, C, L) with the lane
    axis L = (H+2) rows x Wp 128-aligned columns — full 128-lane vectors
    regardless of C;
  * per output z-slice, ONE GEMM  Y = Wm @ A  with
      A  [(dz,dy,ci) = 9*Cin,  L_v = H*Wp]   (9 tile-aligned lane slices
                                              of 3 input slabs — no copy
                                              gather, no im2col in HBM)
      Wm [(dx,co)   = 3*Cout,  9*Cin]
    i.e. the z/y taps live in the contraction dim (K = 9*Cin = 144 for
    C=16, 288 for C=32) and the x taps ride the OUTPUT rows, recovered by
    two cheap lane rolls:  out = Y[0] + roll(Y[1],-1) + roll(Y[2],-2).
  * MXU utilization: C=16 -> (48/128)*(144/256) ~ 21%, C=32 -> 56%,
    versus the naive im2col's Cout/128 = 12.5% and XLA's measured ~3%.

The D axis is blocked (block_d slices per program) with the 2-slab halo
fetched through a second BlockSpec on the same array, so HBM reads are
~1+2/block_d x and Pallas double-buffers both streams automatically.

Forward only (inference is the north-star metric); `conv3d_small_vjp`
wraps it with a custom VJP whose backward falls back to XLA so the op is
safe under `value_and_grad`.  Exactness vs `lax.conv_general_dilated` is
pinned by tests in interpret mode (CPU) and on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
              strides, padding, dilation, groups: int) -> bool:
    """Shapes/modes this kernel handles (NDHWC, k=3, s=1, SAME, bf16-able)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if tuple(strides) != (1, 1, 1) or tuple(dilation) != (1, 1, 1):
        return False
    if groups != 1 or padding != "SAME":
        return False
    cin, cout = w_shape[3], w_shape[4]
    # below 8 input channels the GEMM K dim is too thin to beat XLA; above
    # 64 XLA's own lowering is already MXU-efficient
    if not (8 <= cin <= 64 and 2 <= cout <= 64):
        return False
    d, h, w = x_shape[1:4]
    if d < 1 or h < 1 or w < 1 or w + 2 > 512:
        return False
    return True


def _kernel(xm_ref, xh_ref, w_ref, o_ref, *, block_d, cin, cout, wp, lv):
    # xm (1, block_d, Cin, Lfull)  main slabs
    # xh (1, 2, Cin, Lfull)        halo slabs (next two z rows)
    # w  (3*Cout, 9*Cin)
    # o  (1, block_d, Cout, Lv)
    wm = w_ref[:]
    for bd in range(block_d):
        rows = []
        for dz in range(3):
            # z slab bd+dz out of the block_d+2 window
            slab = (
                xm_ref[0, bd + dz]
                if bd + dz < block_d
                else xh_ref[0, bd + dz - block_d]
            )  # (Cin, Lfull)
            for dy in range(3):
                # y tap = tile-aligned lane slice (wp is a lane multiple)
                rows.append(slab[:, dy * wp: dy * wp + lv])
        a = jnp.concatenate(rows, axis=0)  # (9*Cin, Lv)
        y = jnp.dot(wm, a, preferred_element_type=jnp.float32)  # (3*Cout, Lv)
        # out[l] += y_dx[l+dx]: pltpu.roll needs a non-negative shift, so
        # roll by lv-dx (equivalent mod lv)
        out = y[0:cout]
        out = out + pltpu.roll(y[cout: 2 * cout], lv - 1, axis=1)
        out = out + pltpu.roll(y[2 * cout: 3 * cout], lv - 2, axis=1)
        o_ref[0, bd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_d", "interpret"))
def conv3d_small(x, w, *, block_d: int = 4, interpret=None):
    """SAME stride-1 3x3x3 conv, NDHWC in / NDHWC out.

    `x` (N, D, H, W, Cin), `w` (3, 3, 3, Cin, Cout) — flax nn.Conv kernel
    layout, so a trained checkpoint runs unchanged through either path.
    `interpret=None` auto-enables the Pallas interpreter off-TPU so the
    same model code runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d, h, w_sp, cin = x.shape
    cout = w.shape[-1]
    wp = _roundup(w_sp + 2, 128)
    lfull = (h + 2) * wp
    lv = h * wp
    dp = _roundup(d, block_d)

    # ---- one-time relayout (fused XLA pad/transpose/reshape)
    xp = jnp.pad(x, ((0, 0), (1, 1 + dp - d), (1, 1), (1, 1), (0, 0)))
    xt = xp.transpose(0, 1, 4, 2, 3)  # (N, Dp+2, Cin, H+2, W+2)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, 0), (0, wp - (w_sp + 2))))
    xf = xt.reshape(n, dp + 2, cin, lfull)
    # Wm[(dx,co), (dz,dy,ci)] = w[dz,dy,dx,ci,co]
    wm = w.transpose(2, 4, 0, 1, 3).reshape(3 * cout, 9 * cin).astype(x.dtype)

    grid = (n, dp // block_d)
    kern = functools.partial(
        _kernel, block_d=block_d, cin=cin, cout=cout, wp=wp, lv=lv
    )
    out_flat = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_d, cin, lfull),
                lambda ni, di: (ni, di, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, cin, lfull),
                # halo rows db*block_d+block_d, +block_d+1, expressed in
                # units of 2-row blocks (block_d must be even)
                lambda ni, di: (ni, di * (block_d // 2) + block_d // 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_d, cout, lv),
            lambda ni, di: (ni, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, dp, cout, lv), x.dtype),
        interpret=interpret,
    )(xf, xf, wm)

    # ---- back to NDHWC, crop the D/W padding
    out = out_flat.reshape(n, dp, cout, h, wp)[:, :d, :, :, :w_sp]
    return out.transpose(0, 1, 3, 4, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_small_vjp(x, w, interpret=None):
    """conv3d_small with an XLA backward, safe under value_and_grad."""
    return conv3d_small(x, w, interpret=interpret)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def _fwd(x, w, interpret):
    return conv3d_small(x, w, interpret=interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(_xla_conv, x, w)
    return vjp(g.astype(x.dtype))


conv3d_small_vjp.defvjp(_fwd, _bwd)
