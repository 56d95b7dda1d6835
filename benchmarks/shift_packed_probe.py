"""Chip-measure the shift-stack packed k3 (models/vnet_packed.py
packed_k3_conv USE_SHIFT_PACKED_K3) vs the dense coarse k3 at the two
packed hot shapes:

 * full8 LUConv96: (27, 48, 48, 48, 128) bf16 — the 16.1 ms unit in the
   r4 fwd27 profile (dense pays 3.375x the structural MACs at ~83% MXU
   peak; the shift form pays 1x at k2-C128 rates, 512 vs 1728 CF).
 * part4 lv2 LUConv: (27, 48, 24, 24, 128) bf16 — 2.25x MAC cut.

Chains CHAIN convs back-to-back so the ~30 ms relay sync floor is
swamped; exactness checked on the first call; variants interleaved.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shift_packed_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import vnet_packed as vp

CHAIN = 8
REPS = 5
FLOOR_MS = 30.0


def bench_case(name, shape, c_fine, axes):
    rng = np.random.default_rng(0)
    p = 2 ** sum(axes)
    x = jnp.asarray(
        (rng.normal(size=shape) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.normal(size=(3, 3, 3, c_fine, c_fine)) * 0.05).astype(np.float32)
    )

    def chain(v, shift):
        vp.USE_SHIFT_PACKED_K3 = shift
        try:
            for _ in range(CHAIN):
                v = vp.packed_k3_conv((v,), w, axes) * 0.1
        finally:
            vp.USE_SHIFT_PACKED_K3 = False
        return v

    dense_chain = jax.jit(lambda v: chain(v, False))
    shift_chain = jax.jit(lambda v: chain(v, True))

    def sync(o):
        return float(jnp.sum(o[0, 0, 0, :8].astype(jnp.float32)))

    # exactness on chip (first chain call doubles as compile)
    fns = {"dense": dense_chain, "shift": shift_chain}
    outs = {}
    for k, f in fns.items():
        t0 = time.perf_counter()
        outs[k] = f(x)
        sync(outs[k])
        print(f"[{name}] compile {k}: {time.perf_counter()-t0:.1f}s",
              flush=True)
    diff = float(jnp.max(jnp.abs(
        outs["dense"].astype(jnp.float32) - outs["shift"].astype(jnp.float32)
    )))
    mag = float(jnp.max(jnp.abs(outs["dense"].astype(jnp.float32))))
    print(f"[{name}] max|dense-shift| {diff:.3e} (mag {mag:.3e})", flush=True)

    ts = {k: [] for k in fns}
    for r in range(REPS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            sync(f(x))
            ts[k].append(time.perf_counter() - t0)
        print(f"[{name}] rep {r}: " + " ".join(
            f"{k}={ts[k][-1]*1e3:.0f}ms" for k in fns), flush=True)

    res = {}
    for k in fns:
        v = np.asarray(ts[k]) * 1e3
        res[k] = (v.min() - FLOOR_MS) / CHAIN
        print(f"[{name}] {k}: min {v.min():.1f} ms chain -> "
              f"~{res[k]:.2f} ms/conv (floor-corrected)", flush=True)
    print(f"[{name}] shift speedup: {res['dense'] / res['shift']:.2f}x",
          flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    bench_case("full8 LUConv96", (27, 48, 48, 48, 128), 16,
               (True, True, True))
    bench_case("part4 lv2", (27, 48, 24, 24, 128), 32,
               (False, True, True))


if __name__ == "__main__":
    main()
