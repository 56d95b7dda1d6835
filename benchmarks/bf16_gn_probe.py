"""Validate the GN-bf16 hypothesis with interleaved min-of-N timing.

Variants (same ConvGN stack, fwd+bwd):
  f32      — everything f32
  bf16     — everything bf16 (round-1 'mixed precision')
  bf16_gn32 — convs bf16, GroupNorm computed in f32, cast back to bf16
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


class ConvGN(nn.Module):
    gn_f32: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(4):
            x = ConvND(16, 3, 3, use_bias=False)(x)
            if self.gn_f32:
                x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x).astype(x.dtype)
            else:
                x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x)
        return x


def make(dtype, gn_f32):
    model = ConvGN(gn_f32=gn_f32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 64, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    def loss(p, x):
        xc = x.astype(dtype)
        pc = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v, p
        )
        y = model.apply(pc, xc)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    fn = jax.jit(jax.value_and_grad(loss))
    v, g = fn(params, x)
    sync(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32))
    return fn, params, x


cases = {
    "f32": make(jnp.float32, False),
    "bf16": make(jnp.bfloat16, False),
    "bf16_gn32": make(jnp.bfloat16, True),
}
best = {k: 1e9 for k in cases}
for _round in range(5):
    for k, (fn, params, x) in cases.items():
        t0 = time.perf_counter()
        for _ in range(3):
            v, g = fn(params, x)
        sync(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32))
        best[k] = min(best[k], (time.perf_counter() - t0) / 3)
for k, v in best.items():
    print(f"{k}: {v*1e3:8.2f} ms (min of 5 interleaved rounds)", flush=True)
print("GN PROBE DONE", flush=True)
