"""Sublane-flat NDHWC conv3d formulation — timing probe (real TPU).

Layout: xflat (N, D+2, S, C) with S = (H+2)*Ws voxel rows on SUBLANES and
C on lanes (no transpose from NDHWC — just pad+reshape).  xcat holds the
dz lane-concat (N, D, S, 3C).  Kernel, per (n, d, s-chunk):
    Y = xc_rows[rows+halo, 3C] @ W2[3C, 9*Cout]        (one dot, f32 acc)
    out[s, co] = sum_{dy,dx} Y[s + dy*Ws + dx, (dy*3+dx)*Cout + co]
Variant b builds the dz lane-concat inside the kernel from 16-lane slabs.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


N, D, H, W, C = 8, 96, 96, 96, 16
COUT = 16
WS = 112
S = (H + 2) * WS          # 10976
SV = H * WS               # 10752 = 42*256
ROWS = 1792               # valid rows per chunk (6 chunks)
HALO = 256                # halo rows (>= 2*WS+2 = 226)
NCH = SV // ROWS          # 6
FLOPS_USEFUL = 2.0 * 27 * C * COUT * N * D * H * W

rng = np.random.default_rng(0)
xflat = jax.device_put(
    (rng.normal(size=(N, D + 2, S, C)) * 0.1).astype(np.float32).astype(jnp.bfloat16)
)
w2 = jax.device_put(
    (rng.normal(size=(3 * C, 9 * COUT)) * 0.05).astype(np.float32).astype(jnp.bfloat16)
)


@jax.jit
def build_xcat(xf):
    return jnp.concatenate([xf[:, i: i + D] for i in range(3)], axis=-1)


def assemble(y, o):
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = (dy * 3 + dx) * COUT
            piece = y[dy * WS + dx: dy * WS + dx + ROWS, t: t + COUT]
            acc = piece if acc is None else acc + piece
    o[0, 0] = acc.astype(o.dtype)


def kern_pre(xm, xh, w, o):
    xc = jnp.concatenate([xm[0, 0], xh[0, 0]], axis=0)  # (ROWS+HALO, 3C)
    y = jnp.dot(xc, w[:], preferred_element_type=jnp.float32)
    assemble(y, o)


def kern_cat(a0, a1, a2, b0, b1, b2, w, o):
    xc = jnp.concatenate(
        [
            jnp.concatenate([a0[0, 0], b0[0, 0]], axis=0),
            jnp.concatenate([a1[0, 0], b1[0, 0]], axis=0),
            jnp.concatenate([a2[0, 0], b2[0, 0]], axis=0),
        ],
        axis=-1,
    )
    y = jnp.dot(xc, w[:], preferred_element_type=jnp.float32)
    assemble(y, o)


GRID = (N, D, NCH)
OUT_SPEC = pl.BlockSpec(
    (1, 1, ROWS, COUT), lambda ni, di, si: (ni, di, si, 0), memory_space=pltpu.VMEM
)
OUT_SHAPE = jax.ShapeDtypeStruct((N, D, SV, COUT), jnp.bfloat16)


def main_spec(width, dz=0):
    return pl.BlockSpec(
        (1, 1, ROWS, width),
        lambda ni, di, si, dz=dz: (ni, di + dz, si, 0),
        memory_space=pltpu.VMEM,
    )


def halo_spec(width, dz=0):
    return pl.BlockSpec(
        (1, 1, HALO, width),
        lambda ni, di, si, dz=dz: (ni, di + dz, si * (ROWS // HALO) + ROWS // HALO, 0),
        memory_space=pltpu.VMEM,
    )


@jax.jit
def run_pre(xf):
    xc = build_xcat(xf)
    return pl.pallas_call(
        kern_pre,
        grid=GRID,
        in_specs=[main_spec(3 * C), halo_spec(3 * C),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=OUT_SPEC,
        out_shape=OUT_SHAPE,
    )(xc, xc, w2)


@jax.jit
def run_cat(xf):
    specs = [main_spec(C, dz) for dz in range(3)] + [halo_spec(C, dz) for dz in range(3)]
    return pl.pallas_call(
        kern_cat,
        grid=GRID,
        in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=OUT_SPEC,
        out_shape=OUT_SHAPE,
    )(xf, xf, xf, xf, xf, xf, w2)


@jax.jit
def run_xcat_only(xf):
    return build_xcat(xf)


def bench(tag, run):
    try:
        sync(run(xflat).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(3):
            sync(run(xflat).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag}: {dt*1e3:.2f} ms -> {FLOPS_USEFUL/dt/1e12:.2f} TF/s-useful", flush=True)
    except Exception as e:
        print(tag, "FAIL", str(e)[:1200], flush=True)


bench("a_prebuilt_xcat", run_pre)
bench("b_inkernel_cat", run_cat)
bench("xcat_build_alone", run_xcat_only)
print("KMICRO3 DONE", flush=True)
