"""Measure the r4 head fix: class-major packed logits + reshape-free
softmax/argmax vs the delta-major (...,8,K)-reshape head.

The r4 packed-fwd27 profile (BASELINE.md round-4 ledger) put ~16 ms/rep
in the head block — head conv 3.1 + softmax 2.6 + reduce_max 2.1 +
broadcast 1.4 + ~6 ms of T(2,128) transposed-layout fusions/copies, all
downstream of the (...,8,2) reshape that puts K=2 classes on the minor
dim.  The class-major head (models/vnet_packed.py pack_head_1x1) keeps
every op a contiguous channel slice of the (...,16) tensor.

Variants (interleaved, min+median over reps; each rep syncs via a host
scalar fetch — block_until_ready is a no-op through the relay):
  fwd_delta  - packed fwd27, return_packed, delta-major head (r3 path)
  fwd_class  - same, class-major head
  fwd_logits - class-major, logits only (no softmax at all — the
               whole-volume/argmax-only bound)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/head_layout_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.vnet import VNet
from tpuseg.models.vnet_packed import packed_vnet3d_apply, packed_vnet3d_probs


def main():
    PATCH = (96, 96, 96)
    B = 27
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, *PATCH, 1)), jnp.bfloat16
    )
    x = jax.device_put(x)

    @jax.jit
    def fwd_delta(v):
        return packed_vnet3d_probs(params, v, return_packed=True,
                                   packed_layout="delta")

    @jax.jit
    def fwd_class(v):
        return packed_vnet3d_probs(params, v, return_packed=True,
                                   packed_layout="class")

    @jax.jit
    def fwd_logits(v):
        lg, _ = packed_vnet3d_apply(params, v, num_classes=2,
                                    return_packed=True, packed_layout="class")
        return lg

    fns = {"fwd_delta": fwd_delta, "fwd_class": fwd_class,
           "fwd_logits": fwd_logits}

    # compile + warm
    for k, f in fns.items():
        t0 = time.perf_counter()
        out = f(x)
        s = float(jnp.sum(out[0, 0, 0, 0].astype(jnp.float32)))
        print(f"compile {k}: {time.perf_counter()-t0:.1f}s (sync {s:.3f})",
              flush=True)

    REPS = 7
    ts = {k: [] for k in fns}
    for r in range(REPS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            out = f(x)
            float(jnp.sum(out[0, 0, 0, 0].astype(jnp.float32)))
            ts[k].append(time.perf_counter() - t0)
        print(f"rep {r}: " + " ".join(
            f"{k}={ts[k][-1]*1e3:.1f}ms" for k in fns), flush=True)

    for k in fns:
        v = np.asarray(ts[k]) * 1e3
        print(f"{k}: min {v.min():.1f} ms  median {np.median(v):.1f} ms")


if __name__ == "__main__":
    main()
