"""Isolate the GroupNorm reduction pathology found by the fwd27 trace.

The xplane trace of VNet3d fwd27 shows ~105 of ~171 ms in GN
convert+reduce fusions (convs are only ~45 ms, ~50 TF/s!).  Hypothesis:
flax's GroupNorm reduces over spatial AND the minor channels-in-group
axis together, forcing a poorly-vectorized cross-lane reduce at C=16;
computing per-CHANNEL spatial sums first (lanes preserved) then combining
channel sums into group stats should be near-roofline.

Compares, chained x12 on a (27,96,96,96,16) bf16 tensor:
  * flax nn.GroupNorm(8)
  * fast GN: per-channel f32 spatial sums -> group stats -> normalize
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def fast_group_norm(x, scale, bias, groups, eps=1e-6):
    """Channels-last GroupNorm with lane-friendly reductions: reduce the
    SPATIAL axes per channel (minor dim preserved), then combine the
    C//G channel sums of each group on a tiny (B, C) array."""
    B, C = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    n = float(np.prod(spatial) * (C // groups))
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=tuple(range(1, x.ndim - 1)))  # (B, C)
    ss = jnp.sum(jnp.square(xf), axis=tuple(range(1, x.ndim - 1)))  # (B, C)
    gs = s.reshape(B, groups, C // groups).sum(-1)  # (B, G)
    gss = ss.reshape(B, groups, C // groups).sum(-1)
    mean = gs / n
    var = gss / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, C // groups, axis=-1).reshape(
        (B,) + (1,) * len(spatial) + (C,)
    )
    rstd_c = jnp.repeat(rstd, C // groups, axis=-1).reshape(
        (B,) + (1,) * len(spatial) + (C,)
    )
    out = (xf - mean_c) * rstd_c * scale + bias
    return out.astype(x.dtype)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))


def main():
    SHAPE = (8, 96, 96, 96, 16)
    G = 8
    x = jax.device_put(jnp.zeros(SHAPE, jnp.bfloat16) + 0.5)
    sync(x)
    gn = nn.GroupNorm(num_groups=G)
    params = gn.init(jax.random.key(0), x)
    scale = jnp.asarray(params["params"]["scale"], jnp.float32)
    bias = jnp.asarray(params["params"]["bias"], jnp.float32)

    CHAIN = 8

    @jax.jit
    def flax_chain(params, x):
        for _ in range(CHAIN):
            x = (gn.apply(params, x) + 0.001).astype(jnp.bfloat16)
        return x

    @jax.jit
    def fast_chain(scale, bias, x):
        for _ in range(CHAIN):
            x = (fast_group_norm(x, scale, bias, G) + 0.001).astype(jnp.bfloat16)
        return x

    a = flax_chain(params, x)
    b = fast_chain(scale, bias, x)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print("max diff:", diff, flush=True)
    del a, b

    fns = {"flax_gn": lambda: sync(flax_chain(params, x)),
           "fast_gn": lambda: sync(fast_chain(scale, bias, x))}
    times = {k: [] for k in fns}
    for _ in range(7):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            fn()
            times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        ts = np.array(v) * 1e3
        print(f"{k} x{CHAIN}: median {np.median(ts):.1f} ms  min {ts.min():.1f}"
              f"  ({(np.median(ts)-28)/CHAIN:.2f} ms/GN floor-corrected)", flush=True)
    print("GN PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
