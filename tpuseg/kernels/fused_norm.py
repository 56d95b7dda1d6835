"""Pallas TPU kernel: fused GroupNorm(+affine)+ReLU for channels-last maps.

The zoo applies GroupNorm(8) after every conv
(`/root/reference/networks/Unet2d.py:64-85`); on TPU the normalization is
reduction-bound (mean/var over all spatial positions per group).  This
kernel does it in two pallas_calls:

 1. a stats pass that accumulates per-(sample, group) Σx and Σx² across
    sequential grid tiles into a small output block (TPU grid iterations
    execute in order, so tile t adds into the block written by t-1);
 2. an apply pass that normalizes, applies the affine, and fuses the ReLU
    into the same VMEM-resident tile — one read and one write of the
    activation instead of XLA's separate reduce + normalize passes.

Usable on any (N, V, C) reshaped feature map; `fused_group_norm_relu`
falls back to plain jnp on non-TPU backends and is validated against
flax GroupNorm in tests (CPU via interpret mode).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(c: int, groups: int):
    """(C, groups) 0/1 membership matrix — group reduction as a tiny matmul
    (Mosaic cannot shape-cast the lane dim, so no reshape-based grouping)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == g).astype(jnp.float32)


def _stats_kernel(x_ref, out_ref, *, groups: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[0].astype(jnp.float32)  # (tile_v, C)
    c = x.shape[-1]
    G = _group_matrix(c, groups)
    col = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    col2 = jnp.sum(x * x, axis=0, keepdims=True)
    out_ref[0, 0, :] += jnp.dot(col, G, preferred_element_type=jnp.float32)[0]
    out_ref[0, 1, :] += jnp.dot(col2, G, preferred_element_type=jnp.float32)[0]


def _apply_kernel(x_ref, stats_ref, gamma_ref, beta_ref, o_ref,
                  *, groups: int, count: float, eps: float, relu: bool):
    x = x_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    s = stats_ref[0, 0:1, :]  # (1, groups)
    s2 = stats_ref[0, 1:2, :]
    mean = s / count
    var = s2 / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    Gt = _group_matrix(c, groups).T  # (groups, C)
    mean_c = jnp.dot(mean, Gt, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv, Gt, preferred_element_type=jnp.float32)
    y = (x - mean_c[0]) * inv_c[0] * gamma_ref[...] + beta_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("groups", "eps", "relu", "tile_v", "interpret"))
def fused_group_norm_relu_pallas(
    x, gamma, beta, groups: int = 8, eps: float = 1e-5, relu: bool = True,
    tile_v: int = 2048, interpret: bool = False,
):
    """x: (N, V, C) channels-last (V = flattened spatial). Returns same shape."""
    n, v, c = x.shape
    pad_v = (-v) % tile_v
    xp = jnp.pad(x, ((0, 0), (0, pad_v), (0, 0))) if pad_v else x
    vt = xp.shape[1]
    tiles = vt // tile_v

    stats = pl.pallas_call(
        partial(_stats_kernel, groups=groups),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, tile_v, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, groups), jnp.float32),
        interpret=interpret,
    )(xp)

    # padded zeros contribute to Σ and Σ² — correct the count only if the
    # pad is zero-valued (it is); mean/var need true-count normalization
    count = float(v * (c // groups))

    out = pl.pallas_call(
        partial(_apply_kernel, groups=groups, count=count, eps=eps, relu=relu),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, tile_v, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, groups), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_v, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(xp, stats, gamma.reshape(1, c), beta.reshape(1, c))
    return out[:, :v] if pad_v else out


def _gn_relu_reference(x, gamma, beta, groups: int, eps: float, relu: bool):
    """jnp reference (differentiable) — also the backward for the VJP."""
    shape = x.shape
    n, c = shape[0], shape[-1]
    flat = x.reshape(n, -1, c).astype(jnp.float32)
    g = flat.reshape(n, -1, groups, c // groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    y = (g - mean) * jax.lax.rsqrt(var + eps)
    out = y.reshape(n, -1, c) * gamma + beta
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.reshape(shape).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_relu_vjp(x, gamma, beta, groups: int = 8,
                              eps: float = 1e-5, relu: bool = True):
    """fused_group_norm_relu with an XLA backward (recompute), safe under
    value_and_grad — the training-path entry for the fused kernel."""
    return fused_group_norm_relu(x, gamma, beta, groups, eps, relu)


def _fgnr_fwd(x, gamma, beta, groups, eps, relu):
    return fused_group_norm_relu(x, gamma, beta, groups, eps, relu), (x, gamma, beta)


def _fgnr_bwd(groups, eps, relu, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, ga, be: _gn_relu_reference(x, ga, be, groups, eps, relu),
        x, gamma, beta,
    )
    return vjp(g.astype(x.dtype))


fused_group_norm_relu_vjp.defvjp(_fgnr_fwd, _fgnr_bwd)


def fused_group_norm_relu(
    x, gamma, beta, groups: int = 8, eps: float = 1e-5, relu: bool = True,
):
    """Shape-agnostic wrapper: (N, *spatial, C) in/out.  Uses the Pallas
    kernel on TPU, interpret-mode on CPU tests, jnp fallback elsewhere."""
    shape = x.shape
    n, c = shape[0], shape[-1]
    flat = x.reshape(n, -1, c)
    backend = jax.default_backend()
    if backend == "tpu":
        out = fused_group_norm_relu_pallas(flat, gamma, beta, groups, eps, relu)
    else:
        mean = jnp.mean(
            flat.reshape(n, -1, groups, c // groups), axis=(1, 3), keepdims=True
        )
        var = jnp.var(
            flat.reshape(n, -1, groups, c // groups), axis=(1, 3), keepdims=True
        )
        y = (flat.reshape(n, -1, groups, c // groups) - mean) * jax.lax.rsqrt(
            var + eps
        )
        out = y.reshape(n, -1, c) * gamma + beta
        if relu:
            out = jnp.maximum(out, 0.0)
    return out.reshape(shape)
