"""USE_AFFINE_GN_LOWP A/B on the bench PRIMARY's hot program: fwd27
bf16 (packed VNet3d, class-major head, packed_levels=2 default).

The bf16 inference graph carries the same flax-style GN f32 round trip
the r5 train profile showed (stats in f32 + (g-mean)*inv normalize in
f32 + convert back); the affine form folds (mean, inv, scale, bias)
into a/b and applies one bf16 FMA.  Interleaved reps; min + median;
prob/argmax agreement cross-check between the two forms.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/affine_gn_fwd27_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main(reps=7, inner=2):
    import jax
    import jax.numpy as jnp
    import tpuseg.models.vnet_packed as vp
    from tpuseg.models.vnet import VNet
    from tpuseg.models.vnet_packed import packed_vnet3d_probs

    print("platform:", jax.devices()[0].platform, flush=True)
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    xb = jax.device_put(
        (np.random.default_rng(0).normal(size=(27, 96, 96, 96, 1)) * 0.3)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    fns = {}
    for name, flag in (("reshape", False), ("affine", True)):
        vp.USE_AFFINE_GN_LOWP = flag
        fn = jax.jit(
            lambda x: packed_vnet3d_probs(
                params, x, return_packed=True, packed_layout="class",
            )
        )
        t0 = time.perf_counter()
        sync(fn(xb))  # traces with `flag` baked
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns[name] = fn
    vp.USE_AFFINE_GN_LOWP = False

    a = np.asarray(fns["reshape"](xb), np.float32)
    b = np.asarray(fns["affine"](xb), np.float32)
    agree = (
        a.reshape(*a.shape[:4], 2, 8).argmax(-2)
        == b.reshape(*b.shape[:4], 2, 8).argmax(-2)
    ).mean()
    print(f"fwd27 reshape-vs-affine max prob diff {np.abs(a - b).max():.2e},"
          f" argmax agree {agree:.6f}")

    ts = {k: [] for k in fns}
    for _ in range(reps):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(inner):
                sync(fn(xb))
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        v = sorted(v)
        print(f"fwd27 {k}: min {v[0]/inner*1e3:.1f} ms  "
              f"median {v[len(v)//2]/inner*1e3:.1f} ms")
    print(f"affine speedup (min): {min(ts['reshape'])/min(ts['affine']):.3f}x")


if __name__ == "__main__":
    main()
