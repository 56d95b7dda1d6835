"""Decompose the shift-stack packed-k3 loss (benchmarks/shift_packed_probe.py
measured 60.7 vs dense 16.1 ms/conv at full8 LUConv96): time the two
halves separately to find where the 45 ms over the FLOP model goes.

  stack  - shift_stack alone (8 per-group zero-pads + concat, 765 MB bf16)
  conv   - the k2 VALID conv alone on a pre-shifted (27,49,49,49,128) input
  fused  - pad+conv in one jit (the production form)
  conv48 - the same k2 conv on an even-extent (27,48,48,48,128) input
           (SAME padding) — isolates the odd-49-extent layout question

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shift_decomp_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import vnet_packed as vp

CHAIN = 8
FLOOR_MS = 30.0
AXES = (True, True, True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(27, 48, 48, 48, 128)) * 0.1)
                    .astype(np.float32)).astype(jnp.bfloat16)
    xs = jnp.asarray((rng.normal(size=(27, 49, 49, 49, 128)) * 0.1)
                     .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(3, 3, 3, 16, 16)) * 0.05)
                    .astype(np.float32))
    w2 = vp.pack_k3_axes_shift(w, AXES)  # (2,2,2,128,128)
    print("w2 shape", w2.shape, flush=True)

    def stack_chain(v):
        for _ in range(CHAIN):
            s = vp.shift_stack(v, AXES)
            v = s[:, :-1, :-1, :-1, :] * 0.1
        return v

    def conv_chain(v):
        for _ in range(CHAIN):
            y = vp._conv(v, w2, padding="VALID") * 0.1  # (...,48^3,128)
            v = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        return v

    def conv48_chain(v):
        for _ in range(CHAIN):
            v = vp._conv(v, w2, padding="SAME") * 0.1
        return v

    def fused_chain(v):
        for _ in range(CHAIN):
            v = vp.packed_k3_conv((v,), w, AXES) * 0.1
        return v

    cases = {
        "stack": (jax.jit(stack_chain), x),
        "conv": (jax.jit(conv_chain), xs),
        "conv48": (jax.jit(conv48_chain), x),
    }
    vp.USE_SHIFT_PACKED_K3 = True
    try:
        fused = jax.jit(fused_chain)
        t0 = time.perf_counter()
        out = fused(x)
        float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
        print(f"compile fused: {time.perf_counter()-t0:.1f}s", flush=True)
    finally:
        vp.USE_SHIFT_PACKED_K3 = False
    cases["fused"] = (fused, x)

    for k, (f, v) in cases.items():
        if k == "fused":
            continue
        t0 = time.perf_counter()
        out = f(v)
        float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
        print(f"compile {k}: {time.perf_counter()-t0:.1f}s", flush=True)

    ts = {k: [] for k in cases}
    for r in range(5):
        for k, (f, v) in cases.items():
            t0 = time.perf_counter()
            out = f(v)
            float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
            ts[k].append(time.perf_counter() - t0)
        print(f"rep {r}: " + " ".join(
            f"{k}={ts[k][-1]*1e3:.0f}ms" for k in cases), flush=True)
    for k in cases:
        v = np.asarray(ts[k]) * 1e3
        print(f"{k}: min {v.min():.1f} ms chain -> "
              f"~{(v.min()-FLOOR_MS)/CHAIN:.2f} ms/iter (floor-corrected)",
              flush=True)


if __name__ == "__main__":
    main()
