"""Measure USE_FUSED_GN_RELU on the real chip: VNet3d fwd (batch 27, bf16)
and a ConvBlock-stack train step (f32), flag off vs on, interleaved."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.nn import layers
from tpuseg.models.vnet import VNet


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


model = VNet(ndim=3, num_classes=2, features=16)
x1 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
params = model.init(jax.random.key(0), x1)
params_bf = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
x27 = jax.device_put(jnp.zeros((27, 96, 96, 96, 1), jnp.bfloat16) + 0.1)


def build_fwd(flag):
    layers.USE_FUSED_GN_RELU = flag

    @jax.jit
    def f(p, x):
        _, probs = model.apply(p, x)
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    f(params_bf, x27)
    layers.USE_FUSED_GN_RELU = False
    return f


def build_train(flag):
    layers.USE_FUSED_GN_RELU = flag
    from flax import linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = layers.ConvBlock(16, 3, dropout=0.2)(x, train=train)
            x = layers.ConvBlock(16, 3, dropout=0.2)(x, train=train)
            return x

    m = Stack()
    xt = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 64, 16)).astype(np.float32))
    p = m.init({"params": jax.random.key(0)}, xt, train=False)

    def loss(p, x, key):
        y = m.apply(p, x, train=True, rngs={"dropout": key})
        return jnp.sum(y ** 2)

    g = jax.jit(jax.value_and_grad(loss))
    key = jax.random.key(1)
    g(p, xt, key)
    layers.USE_FUSED_GN_RELU = False
    return lambda: g(p, xt, key)


fwd = {"off": build_fwd(False), "on": build_fwd(True)}
trn = {"off": build_train(False), "on": build_train(True)}
best_f = {k: 1e9 for k in fwd}
best_t = {k: 1e9 for k in trn}
for _ in range(4):
    for k, f in fwd.items():
        t0 = time.perf_counter()
        for _ in range(2):
            sync(f(params_bf, x27).astype(jnp.float32))
        best_f[k] = min(best_f[k], (time.perf_counter() - t0) / 2)
    for k, f in trn.items():
        t0 = time.perf_counter()
        for _ in range(3):
            v, grads = f()
        sync(jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32))
        best_t[k] = min(best_t[k], (time.perf_counter() - t0) / 3)
for k in ("off", "on"):
    print(f"vnet_fwd27 fused_gn={k}: {best_f[k]*1e3:8.1f} ms", flush=True)
for k in ("off", "on"):
    print(f"convblock_train fused_gn={k}: {best_t[k]*1e3:8.1f} ms", flush=True)
print("FUSED GN MEASURE DONE", flush=True)
