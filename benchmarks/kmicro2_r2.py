"""Dot-formulation variants for the Pallas conv3d kernel (real TPU).

All at C16@96^3 b8 equivalent block shapes. Variants:
  v0: baseline dot [48,144]x[144,12288] -> f32   (per d, 4 dots/step)
  v1: same but preferred bf16 accumulate
  v2: M144/K48 packing: dot [144,48]x[48,12288] -> bf16
  v3: BD=2, one dot spanning both d rows [48,144]x[144,24576] bf16
  v4: transposed orientation: dot(A_T...) not tried (A build infeasible)
  v5: weights pre-padded K->256, dot [48,256]x[256,12288] bf16
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


N, D, H, W, C = 8, 96, 96, 96, 16
COUT = 16
WP = 128
LFULL = (H + 2) * WP
LV = H * WP
FLOPS_USEFUL = 2.0 * 27 * C * COUT * N * D * H * W

rng = np.random.default_rng(0)
xf_np = (rng.normal(size=(N, D + 2, C, LFULL)) * 0.1).astype(np.float32)
xf = jax.device_put(xf_np.astype(jnp.bfloat16))


def bench(run, tag):
    try:
        sync(run(xf).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(3):
            sync(run(xf).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag}: {dt*1e3:.2f} ms -> {FLOPS_USEFUL/dt/1e12:.2f} TF/s-useful", flush=True)
    except Exception as e:
        print(tag, "FAIL", str(e)[:1200], flush=True)


def variant(tag, bd, kpad, m_big, acc_bf16, fuse_lanes):
    m = 9 * COUT if m_big else 3 * COUT
    k = (3 * C) if m_big else (9 * C)
    kp = kpad if kpad else k
    wm = jax.device_put((rng.normal(size=(m, kp)) * 0.05).astype(np.float32).astype(jnp.bfloat16))
    acc_t = jnp.float32

    def kern(xm, xh, w, o):
        n_d = 1 if fuse_lanes else bd
        for i in range(n_d):
            rows = []
            ndz = 3 if m_big else 3
            ndy = 1 if m_big else 3
            for dz in range(3):
                for dy in range(ndy):
                    if fuse_lanes:
                        parts = []
                        for b in range(bd):
                            base = b + dz
                            slab = xm[0, base] if base < bd else xh[0, base - bd]
                            parts.append(slab[:, dy * WP: dy * WP + LV])
                        rows.append(jnp.concatenate(parts, axis=1))
                    else:
                        base = i + dz
                        slab = xm[0, base] if base < bd else xh[0, base - bd]
                        rows.append(slab[:, dy * WP: dy * WP + LV])
            a = jnp.concatenate(rows, axis=0)
            if kp != a.shape[0]:
                a = jnp.concatenate(
                    [a, jnp.zeros((kp - a.shape[0], a.shape[1]), a.dtype)], axis=0
                )
            y = jnp.dot(w[:], a, preferred_element_type=acc_t)
            if fuse_lanes:
                for b in range(bd):
                    o[0, b] = y[:COUT, b * LV:(b + 1) * LV].astype(o.dtype)
            else:
                o[0, i] = y[:COUT].astype(o.dtype)

    @jax.jit
    def run(xf):
        return pl.pallas_call(
            kern,
            grid=(N, D // bd),
            in_specs=[
                pl.BlockSpec((1, bd, C, LFULL), lambda ni, di: (ni, di, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C, LFULL), lambda ni, di: (ni, di * (bd // 2) + bd // 2, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bd, COUT, LV), lambda ni, di: (ni, di, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, D, COUT, LV), jnp.bfloat16),
        )(xf, xf, wm)

    bench(run, tag)


variant("v0_base_f32acc", 4, 0, False, False, False)
pass
variant("v2_m144_k48", 4, 0, True, True, False)
variant("v3_bd2_fusedlanes", 2, 0, False, True, True)
variant("v5_kpad256", 4, 256, False, True, False)
print("KMICRO2 DONE", flush=True)
