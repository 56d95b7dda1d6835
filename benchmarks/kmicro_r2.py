"""Isolate the Pallas conv3d kernel's cost components on the real TPU.

Measures, at the C16@96^3 block shape (Lfull=12544 lanes, Lv=12288):
 1. raw dot  [48,144]x[144,12288] looped BD times per grid step
 2. dot + A build (9 lane slices + concat)
 3. dot + A build + 2 rolls + out write  (= the full kernel body)
 4. the XLA-side relayout round-trip alone
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


N, D, H, W, C = 8, 96, 96, 96, 16
COUT = 16
BD = 4
WP = 128
LFULL = (H + 2) * WP
LV = H * WP
M, K = 3 * COUT, 9 * C
DP = D
GRID = (N, DP // BD)

rng = np.random.default_rng(0)
xf = jax.device_put((rng.normal(size=(N, DP + 2, C, LFULL)) * 0.1).astype(np.float32).astype(jnp.bfloat16))
wm = jax.device_put((rng.normal(size=(M, K)) * 0.05).astype(np.float32).astype(jnp.bfloat16))

FLOPS_USEFUL = 2.0 * 27 * C * COUT * N * D * H * W  # true conv flops equiv


def make(kind):
    def kern(xm, xh, w, o):
        for bd in range(BD):
            if kind == "dot_only":
                a = xm[0, 0 if bd == 0 else bd - 1 if False else 0][:, :LV]  # (C, LV)
                a9 = jnp.concatenate([a] * 9, axis=0)  # fake A, no slab walk
                y = jnp.dot(w[:], a9, preferred_element_type=jnp.float32)
                o[0, bd] = y[:COUT].astype(o.dtype)
            else:
                rows = []
                for dz in range(3):
                    slab = xm[0, bd + dz] if bd + dz < BD else xh[0, bd + dz - BD]
                    for dy in range(3):
                        rows.append(slab[:, dy * WP: dy * WP + LV])
                a = jnp.concatenate(rows, axis=0)
                y = jnp.dot(w[:], a, preferred_element_type=jnp.float32)
                if kind == "full":
                    out = y[0:COUT]
                    out = out + pltpu.roll(y[COUT:2 * COUT], LV - 1, axis=1)
                    out = out + pltpu.roll(y[2 * COUT:], LV - 2, axis=1)
                    o[0, bd] = out.astype(o.dtype)
                else:  # abuild
                    o[0, bd] = y[:COUT].astype(o.dtype)

    @jax.jit
    def run(xf, wm):
        return pl.pallas_call(
            kern,
            grid=GRID,
            in_specs=[
                pl.BlockSpec((1, BD, C, LFULL), lambda ni, di: (ni, di, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C, LFULL), lambda ni, di: (ni, di * (BD // 2) + BD // 2, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BD, COUT, LV), lambda ni, di: (ni, di, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, DP, COUT, LV), jnp.bfloat16),
        )(xf, xf, wm)

    return run


for kind in ("dot_only", "abuild", "full"):
    run = make(kind)
    try:
        sync(run(xf, wm).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(3):
            sync(run(xf, wm).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 3
        print(f"{kind}: {dt*1e3:.2f} ms -> {FLOPS_USEFUL/dt/1e12:.2f} TF/s-useful", flush=True)
    except Exception as e:
        print(kind, "FAIL", str(e)[:1500], flush=True)

# 4. relayout round trip alone
x_nd = jax.device_put((rng.normal(size=(N, D, H, W, C)) * 0.1).astype(np.float32).astype(jnp.bfloat16))


@jax.jit
def relayout(x):
    n, d, h, w_sp, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xt = xp.transpose(0, 1, 4, 2, 3)
    xt = jnp.pad(xt, ((0, 0),) * 4 + ((0, WP - (w_sp + 2)),))
    xf2 = xt.reshape(n, d + 2, cin, LFULL)
    # inverse (as the output path does)
    out = xf2[:, 1:-1, :, :LV].reshape(n, d, cin, h, WP)[:, :, :, :, :w_sp]
    return out.transpose(0, 1, 3, 4, 2)


sync(relayout(x_nd).astype(jnp.float32))
t0 = time.perf_counter()
for _ in range(3):
    sync(relayout(x_nd).astype(jnp.float32))
print(f"relayout_roundtrip: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)
print("KMICRO DONE", flush=True)
