"""Structured space-to-depth packed k3 conv — Pallas TPU kernel.

The packed execution of a fine k3 SAME conv (models/vnet_packed.py
pack_k3_to_k3_coarse) is a coarse k3 conv whose (3,3,3,8C,8F) kernel is
only 1/8 dense: per axis, the center coarse tap carries all four
(delta_in, delta_out) blocks but each extreme tap carries exactly one.
XLA executes it as a DENSE conv — measured at ~83% of MXU peak but
doing 3.375x the useful MACs (the 16.1 ms LUConv96 unit in the r4
fwd27 profile, BASELINE.md).

This kernel pays only the structural MACs.  Per (batch, output plane):

 * a rolling 4-slot VMEM buffer holds (H+2, W+2, 8C) zero-padded input
   planes, DMA'd from HBM once each (prefetch depth 1) — input HBM
   traffic is 1x, vs 3x for a naive 3-plane halo pipeline;
 * an im2col scratch Z (H, W, K) gathers, for each of the 27 coarse
   taps, only the VALID input-delta channel chunks (contiguous runs of
   the delta-major channel dim) at that tap's spatial shift;
 * one MXU GEMM  Z.reshape(H*W, K) @ Wk (K, 8F)  computes the plane,
   where Wk stacks the per-tap valid-row blocks of the packed kernel.
   K = sum over taps of valid channels = 8*8C (1024 for C=16) vs the
   dense 27*8C = 3456 — a 3.375x contraction-depth cut at full lane
   utilization (N = 8F = 128).

STATUS (measured, BASELINE.md round-4 ledger): exact in interpret mode
(tests/test_packed_conv_kernel.py), but Mosaic REJECTS the design on
real TPU — the halo-interior DMA writes and shifted-window reads slice
the sublane-tiled W dimension at offsets 1/2, which Mosaic cannot prove
8-aligned ("Failed to prove that a tile index in dimension 2 is
divisible by the tiling (8)").  Rather than fight the tiling with
value-level shifts (costed: ~6 GB of lane-shuffle traffic per conv to
build Z), the same 3.375x MAC cut is reachable in pure XLA: shift each
input-delta channel group by its own delta and the 1/8-dense coarse k3
becomes a dense-K k2 conv — models/vnet_packed.py packed_k3_conv
(USE_SHIFT_PACKED_K3), which supersedes this kernel.  Kept as the
interpret-verified record of the attempted design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_valid(u):
    """Valid (din, dout) pairs of one axis at coarse tap u (0/1/2), from
    t = 2(u-1) + din - dout + 1 in [0, 3) (vnet_packed._axis_select_packed):
    u=0 -> {(1,0)}, u=1 -> all four, u=2 -> {(0,1)}."""
    pairs = []
    for din in range(2):
        for dout in range(2):
            if 0 <= 2 * (u - 1) + din - dout + 1 < 3:
                pairs.append((din, dout))
    return pairs


def _tap_chunks(tap, c_fine):
    """For coarse tap (a, b, c): the valid input-delta set as contiguous
    channel runs [(lo, hi), ...] of the delta-major packed channel dim,
    with delta = (dd*2+dh)*2+dw and c_fine channels per delta."""
    din_sets = []
    for u in tap:
        dins = sorted({din for din, _ in _axis_valid(u)})
        din_sets.append(dins)
    deltas = sorted(
        (dd * 2 + dh) * 2 + dw
        for dd in din_sets[0] for dh in din_sets[1] for dw in din_sets[2]
    )
    runs = []
    for d in deltas:
        lo, hi = d * c_fine, (d + 1) * c_fine
        if runs and runs[-1][1] == lo:
            runs[-1] = (runs[-1][0], hi)
        else:
            runs.append((lo, hi))
    return runs


def _taps(c_fine):
    """Static schedule: [(tap(a,b,c), (lo,hi), k_offset), ...] and the
    total structural K."""
    sched = []
    k_off = 0
    for a in range(3):
        for b in range(3):
            for c in range(3):
                for lo, hi in _tap_chunks((a, b, c), c_fine):
                    sched.append(((a, b, c), (lo, hi), k_off))
                    k_off += hi - lo
    return sched, k_off


def pack_weight_structured(w3, c_fine, k_pad):
    """Dense packed kernel (3,3,3,8C,8F) -> stacked structural weight
    (k_pad, 8F): rows are the valid input channels of each tap, in the
    im2col column order of the kernel."""
    sched, k_total = _taps(c_fine)
    f8 = w3.shape[-1]
    rows = [w3[a, b, c, lo:hi, :] for (a, b, c), (lo, hi), _ in sched]
    wk = jnp.concatenate(rows, axis=0)
    if k_pad > k_total:
        wk = jnp.concatenate(
            [wk, jnp.zeros((k_pad - k_total, f8), wk.dtype)], axis=0
        )
    return wk


def _kernel(x_hbm, wk_ref, bias_ref, out_ref, planes, z_ref, sems,
            *, sched, k_total, d_size, h, w, c8, k_pad, relu):
    b = pl.program_id(0)
    d = pl.program_id(1)

    def dma(plane, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, plane], planes.at[slot, 1:h + 1, 1:w + 1, :],
            sems.at[slot],
        )

    # one-time zero of the rolling buffers: borders stay zero forever
    # (DMA only ever writes the interior), and so does Z's K padding
    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        planes[...] = jnp.zeros_like(planes)
        if k_pad > k_total:
            z_ref[:, :, k_total:] = jnp.zeros_like(z_ref[:, :, k_total:])

    # batch start: fetch planes 0 and 1, zero the "prev" slot interior
    # (plane index clamped so d_size==1 doesn't read out of bounds)
    @pl.when(d == 0)
    def _():
        nxt = jnp.minimum(1, d_size - 1)
        dma(0, 0).start()
        dma(nxt, 1).start()
        planes[3, 1:h + 1, 1:w + 1, :] = jnp.zeros(
            (h, w, c8), planes.dtype
        )
        dma(0, 0).wait()
        dma(nxt, 1).wait()

    # steady state: wait the prefetch issued last step for plane d+1
    @pl.when(d > 0)
    def _():
        dma(jnp.minimum(d + 1, d_size - 1), (d + 1) % 4).wait()

    # top boundary: the "next" plane must contribute zero
    @pl.when(d == d_size - 1)
    def _():
        planes[(d + 1) % 4, 1:h + 1, 1:w + 1, :] = jnp.zeros(
            (h, w, c8), planes.dtype
        )

    # im2col: for each tap, copy the valid channel runs of the shifted
    # window into Z's column block
    for (a, bb, cc), (lo, hi), k_off in sched:
        slot = (d + (a - 1)) % 4
        z_ref[:, :, k_off:k_off + (hi - lo)] = planes[
            slot, bb:bb + h, cc:cc + w, lo:hi
        ]

    acc = jax.lax.dot_general(
        z_ref[...].reshape(h * w, k_pad), wk_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + bias_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = acc.reshape(h, w, acc.shape[-1]).astype(out_ref.dtype)

    # prefetch plane d+2 into slot (d+2)%4 (distinct from the three in
    # use); skip on the last step so batch transitions stay clean
    @pl.when(d < d_size - 1)
    def _():
        dma(jnp.minimum(d + 2, d_size - 1), (d + 2) % 4).start()


@functools.partial(
    jax.jit, static_argnames=("c_fine", "relu", "interpret")
)
def packed_conv3d_structured(x, w3, bias, *, c_fine=16, relu=False,
                             interpret=False):
    """x: (B, D, H, W, 8C) delta-major packed bf16/f32.  w3: the DENSE
    packed kernel (3,3,3,8C,8F) (pack_k3_to_k3_coarse output).  bias:
    (8F,) packed.  Returns the SAME-padded coarse k3 conv, paying only
    the structural MACs."""
    bsz, d_size, h, w, c8 = x.shape
    f8 = w3.shape[-1]
    sched, k_total = _taps(c_fine)
    k_pad = -(-k_total // 128) * 128
    wk = pack_weight_structured(w3, c_fine, k_pad).astype(x.dtype)

    kernel = functools.partial(
        _kernel, sched=sched, k_total=k_total, d_size=d_size, h=h, w=w,
        c8=c8, k_pad=k_pad, relu=relu,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, d_size),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, f8), lambda b, d: (b, d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, d_size, h, w, f8), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, h + 2, w + 2, c8), x.dtype),   # rolling planes
            pltpu.VMEM((h, w, k_pad), x.dtype),           # im2col Z
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(x, wk, bias.astype(x.dtype).reshape(1, -1))
