"""Pallas conv3d_small vs XLA on the real TPU at bench shapes (bf16)."""
import gc
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.kernels.conv3d import conv3d_small


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def bench(batch, res, cin, cout, chain=6, reps=3, block_d=4):
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        (rng.normal(size=(batch, res, res, res, cin)) * 0.1).astype(np.float32).astype(jnp.bfloat16)
    )
    ws = [
        jax.device_put((rng.normal(size=(3, 3, 3, cin if i == 0 else cout, cout)) * 0.05)
                       .astype(np.float32).astype(jnp.bfloat16))
        for i in range(chain)
    ]

    @jax.jit
    def run_xla(x, ws):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16,
            )
        return x

    @jax.jit
    def run_pallas(x, ws):
        for w in ws:
            x = conv3d_small(x, w, block_d=block_d)
        return x

    flops = 0.0
    for i in range(chain):
        ci = cin if i == 0 else cout
        flops += 2.0 * 27 * ci * cout * batch * res ** 3

    out = {}
    for name, fn in (("xla", run_xla), ("pallas", run_pallas)):
        try:
            y = fn(x0, ws)
            sync(y.astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(reps):
                sync(fn(x0, ws).astype(jnp.float32))
            dt = (time.perf_counter() - t0) / reps
            out[name] = flops / dt / 1e12
        except Exception as e:
            out[name] = f"FAIL: {type(e).__name__}: {e}"
            print(out[name][:2000], flush=True)
    # numeric agreement (bf16 tolerance)
    try:
        a = np.asarray(run_xla(x0, ws[:1]).astype(jnp.float32))
        b = np.asarray(run_pallas(x0, ws[:1]).astype(jnp.float32))
        out["max_abs_diff_1layer"] = float(np.max(np.abs(a - b)))
    except Exception as e:
        out["max_abs_diff_1layer"] = f"FAIL {e}"
    del x0, ws
    gc.collect()
    return out


cases = [
    ("c16_96cube_b8", 8, 96, 16, 16, 4),
    ("c32_48cube_b8", 8, 48, 32, 32, 4),
]
if len(sys.argv) > 1 and sys.argv[1] == "big":
    cases += [("c16_96cube_b27", 27, 96, 16, 16, 4)]
for name, b, r, ci, co, bd in cases:
    res = bench(b, r, ci, co, block_d=bd)
    print(name, {k: (round(v, 3) if isinstance(v, float) else v) for k, v in res.items()}, flush=True)
print("KBENCH DONE", flush=True)
