"""Chip-measure the structured packed-conv kernel (kernels/packed_conv.py)
vs XLA's dense execution of the same 1/8-dense packed k3 at the LUConv96
shape — the single largest op in the r4 packed fwd27 profile (16.1 ms,
~83% MXU peak on 3.375x redundant MACs).

Chains N convs back-to-back so the ~30 ms relay sync floor is swamped;
exactness checked on the first call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/packed_conv_kernel_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models.vnet_packed import DN, pack_k3_to_k3_coarse
from tpuseg.kernels.packed_conv import packed_conv3d_structured

CHAIN = 8


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    cf = 16
    # LUConv96 shape: (27, 48, 48, 48, 128) bf16
    x = jnp.asarray(
        (rng.normal(size=(27, 48, 48, 48, 8 * cf)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cf, cf)) * 0.05).astype(np.float32)
    )
    w3 = pack_k3_to_k3_coarse(w).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(8 * cf,)).astype(np.float32))

    @jax.jit
    def dense_chain(v):
        for _ in range(CHAIN):
            v = jax.lax.conv_general_dilated(
                v, w3, (1, 1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=v.dtype,
            ) + bias.astype(v.dtype)
            v = v * 0.1  # keep magnitudes sane through the chain
        return v

    @jax.jit
    def kernel_chain(v):
        for _ in range(CHAIN):
            v = packed_conv3d_structured(v, w3, bias, c_fine=cf)
            v = v * 0.1
        return v

    @jax.jit
    def dense_one(v):
        return jax.lax.conv_general_dilated(
            v, w3, (1, 1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=v.dtype,
        ) + bias.astype(v.dtype)

    @jax.jit
    def kernel_one(v):
        return packed_conv3d_structured(v, w3, bias, c_fine=cf)

    def sync(o):
        return float(jnp.sum(o[0, 0, 0, :8].astype(jnp.float32)))

    # exactness on chip (single conv)
    t0 = time.perf_counter()
    a = dense_one(x)
    sync(a)
    print(f"dense_one compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    b = kernel_one(x)
    sync(b)
    print(f"kernel_one compile {time.perf_counter()-t0:.1f}s", flush=True)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    mag = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    print(f"max|dense-kernel| {diff:.3e} (mag {mag:.3e})", flush=True)

    fns = {"dense": dense_chain, "kernel": kernel_chain}
    for k, f in fns.items():
        t0 = time.perf_counter()
        sync(f(x))
        print(f"compile {k}_chain: {time.perf_counter()-t0:.1f}s", flush=True)

    ts = {k: [] for k in fns}
    for r in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            sync(f(x))
            ts[k].append(time.perf_counter() - t0)
        print(f"rep {r}: " + " ".join(
            f"{k}={ts[k][-1]*1e3:.0f}ms" for k in fns), flush=True)

    floor = 30.0  # relay sync floor, ms
    for k in fns:
        v = np.asarray(ts[k]) * 1e3
        per = (v.min() - floor) / CHAIN
        print(f"{k}: min {v.min():.1f} ms chain -> ~{per:.2f} ms/conv "
              f"(floor-corrected)")


if __name__ == "__main__":
    main()
