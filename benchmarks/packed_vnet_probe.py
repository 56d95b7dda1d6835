"""Time the packed-stem VNet3d forward at the bench shape (27x96^3 bf16)
vs the plain forward, both LUConv-96 modes, packed and fine outputs.
Run on TPU with an idle host."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main():
    import jax
    import jax.numpy as jnp
    from tpuseg.models.vnet import VNet
    from tpuseg.models import vnet_packed

    print("platform:", jax.devices()[0].platform)
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    xb = jax.device_put(
        (np.random.default_rng(0).normal(size=(27, 96, 96, 96, 1)) * 0.3)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    @jax.jit
    def fwd_plain(x):
        _, probs = model.apply(params, x)
        return probs

    def make_packed(mode, packed_out):
        vnet_packed.LUCONV96_MODE = mode

        @jax.jit
        def fwd(x):
            return vnet_packed.packed_vnet3d_probs(
                params, x, return_packed=packed_out
            )
        return fwd

    fns = {
        "plain": fwd_plain,
        "packed_k3dense_pout": make_packed("k3dense", True),
        "packed_k4s2_pout": make_packed("k4s2", True),
        "packed_k3dense_fine": make_packed("k3dense", False),
    }
    outs = {}
    for tag, fn in list(fns.items()):
        try:
            outs[tag] = fn(xb)
            sync(outs[tag])
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {e}")
            del fns[tag]
    # agreement sanity on device outputs
    import jax.numpy as jnp
    a = outs["plain"]
    for tag in ("packed_k3dense_fine",):
        if tag in outs:
            agree = float(
                (jnp.argmax(outs[tag], -1) == jnp.argmax(a, -1)).mean()
            )
            print(f"{tag} mask agreement vs plain: {agree:.6f}")
    ts = {}
    for _ in range(7):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            sync(fn(xb))
            ts.setdefault(tag, []).append(time.perf_counter() - t0)
    for tag, tt in ts.items():
        print(f"{tag}: min {min(tt)*1e3:.1f} ms  median {sorted(tt)[len(tt)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
