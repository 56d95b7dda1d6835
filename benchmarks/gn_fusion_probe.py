"""Does XLA's conv+GN-stats fusion HELP or HURT at stem sizes?

The fwd27 trace shows the hot ops are convolutions fused with the
GroupNorm stat reductions (~105 of ~171 ms).  This probe times a
stem-sized conv+GN+ReLU x3 chain with and without optimization_barrier
between conv and GN (barrier forbids the fusion).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))


class Chain(nn.Module):
    barrier: bool
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            x = nn.Conv(16, (3, 3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16)(x)
            if self.barrier:
                x = jax.lax.optimization_barrier(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x).astype(jnp.bfloat16)
        return x


def main():
    SHAPE = (16, 96, 96, 96, 16)
    x = jax.device_put(jnp.zeros(SHAPE, jnp.bfloat16) + 0.1)
    sync(x)

    results = {}
    for name, barrier in (("fused", False), ("barrier", True)):
        m = Chain(barrier=barrier)
        params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16))
        params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
        f = jax.jit(lambda p, v, m=m: m.apply(p, v))
        sync(f(params, x))
        results[name] = (f, params)

    times = {k: [] for k in results}
    for _ in range(7):
        for k, (f, p) in results.items():
            t0 = time.perf_counter()
            sync(f(p, x))
            times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        ts = np.array(v) * 1e3
        print(f"{k} conv+GN+relu x3 @ (16,96^3,16): median {np.median(ts):.1f} ms"
              f"  min {ts.min():.1f}", flush=True)
    print("FUSION PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
