"""Root-cause the bf16 TRAINING slowdown (BASELINE.md round-1 mystery:
compute_dtype=bf16 measured 3.5-8x slower than f32).

Times value_and_grad at (2,64,64,64,16) for three module stacks x two
dtypes, and summarizes the conv ops in the optimized HLO of each.
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, ConvBlock


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(4):
            x = ConvND(16, 3, 3, use_bias=False)(x)
        return x


class ConvGN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(4):
            x = ConvND(16, 3, 3, use_bias=False)(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x)
        return x


class Block(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBlock(16, 3, dropout=0.2)(x, train=train)
        x = ConvBlock(16, 3, dropout=0.2)(x, train=train)
        return x


def bench(model_cls, dtype, tag, train=False, hlo=False):
    model = model_cls()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 64, 16)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    params = model.init(rngs, x, train=False)

    def loss(p, x, key):
        xc = x.astype(dtype)
        pc = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v, p
        )
        kw = {"rngs": {"dropout": key}} if train else {}
        y = model.apply(pc, xc, train=train, **kw)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    key = jax.random.key(2)
    v, g = grad_fn(params, x, key)
    sync(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        v, g = grad_fn(params, x, key)
    sync(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:8.2f} ms", flush=True)
    if hlo:
        txt = jax.jit(jax.value_and_grad(loss)).lower(params, x, key).compile().as_text()
        convs = re.findall(r"%?\S*convolution\S*\s*=\s*(\S+)\s.*?window={(.*?)}", txt)
        fusion_kinds = re.findall(r"fusion\(", txt)
        print(f"  convs: {len(convs)}  fusions: {len(fusion_kinds)}", flush=True)
        for dt_, win in convs:
            print(f"    conv -> {dt_}  window={win[:90]}", flush=True)
        path = f"/tmp/hlo_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"  hlo -> {path}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "conv"):
    bench(ConvOnly, jnp.float32, "convonly_f32", hlo=True)
    bench(ConvOnly, jnp.bfloat16, "convonly_bf16", hlo=True)
if which in ("all", "gn"):
    bench(ConvGN, jnp.float32, "convgn_f32")
    bench(ConvGN, jnp.bfloat16, "convgn_bf16")
if which in ("all", "block"):
    bench(Block, jnp.float32, "block_f32", train=True)
    bench(Block, jnp.bfloat16, "block_bf16", train=True)
print("BF16 PROBE DONE", flush=True)
