"""Probe: does the space-to-depth packed formulation win for TRAINING?

The round-3 packed-stem rewrite took VNet3d inference fwd27 216 -> 138 ms
by executing the finest level with 128 channels on the lanes.  The train
secondary metric (UNet3d 112x112x128 b1, f32) now reads 0.601x the
modeled A100 — and its finest level has the SAME pathology, worse:
batch 1 means XLA cannot even pack (C,B) onto the lanes, and the r2
train profile's largest single op was the spatial maxpool
select-and-scatter BACKWARD (8.6 ms) which the packed formulation
replaces with a channel-dim max.

This probe times value_and_grad of the UNet level-0 encoder block
(conv k3 1->16 nobias + GN8 + ReLU, conv k3 16->16 + GN8 + ReLU,
maxpool k2s2) in plain vs packed form at the exact train shape, f32
(the training default) and bf16, PLAIN weights as the differentiated
inputs in both cases (the packed weight transforms sit inside the
traced function, so grads flow back to the plain pytree exactly).

Run on the TPU with an idle host.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models.vnet_packed import (
    gn_fine,
    gn_packed,
    pack_k3_to_k4s2,
    pack_k3_to_k3_coarse,
    _conv,
)

SHAPE = (128, 112, 112)  # reference KiPA train config (D, H, W)


def sync(x):
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def make_weights(dtype):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(
        (rng.normal(size=s) * (1.0 / np.sqrt(np.prod(s[:-1])))).astype(np.float32),
        dtype,
    )
    return {
        "w1": mk(3, 3, 3, 1, 16),
        "w2": mk(3, 3, 3, 16, 16),
        "s1": jnp.ones((16,), dtype), "b1": jnp.zeros((16,), dtype),
        "s2": jnp.ones((16,), dtype), "b2": jnp.zeros((16,), dtype),
    }


def plain_block(ws, x):
    y = _conv(x, ws["w1"])
    y = jax.nn.relu(gn_fine(y, ws["s1"], ws["b1"]))
    y = _conv(y, ws["w2"])
    y = jax.nn.relu(gn_fine(y, ws["s2"], ws["b2"]))
    # spatial maxpool k2s2
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    )


def packed_block(ws, x):
    y = _conv(x, pack_k3_to_k4s2(ws["w1"]), strides=(2, 2, 2),
              padding=[(1, 2)] * 3)
    y = jax.nn.relu(gn_packed(y, ws["s1"], ws["b1"]))
    y = _conv(y, pack_k3_to_k3_coarse(ws["w2"]), padding="SAME")
    y = jax.nn.relu(gn_packed(y, ws["s2"], ws["b2"]))
    # fine spatial maxpool == max over the 8 delta channels
    n, d, h, w, c8 = y.shape
    return jnp.max(y.reshape(n, d, h, w, 8, c8 // 8), axis=-2)


def time_grad(name, block, ws, x, reps=5, inner=8):
    def loss(ws, x):
        return jnp.sum(block(ws, x).astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(loss))
    v, grads = g(ws, x)  # compile
    sync(grads["w1"])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            v, grads = g(ws, x)
        sync(grads["w1"])
        ts.append(time.perf_counter() - t0)
    t = min(ts) / inner
    print(f"{name}: {t*1e3:.1f} ms/step  (loss {float(v):.4f})")
    return t, v


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ws = make_weights(dt)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            (rng.normal(size=(1, *SHAPE, 1)) * 0.3).astype(np.float32), dt
        )
        tp, vp = time_grad(f"plain  {label}", plain_block, ws, x)
        tk, vk = time_grad(f"packed {label}", packed_block, ws, x)
        print(f"  -> packed/plain = {tp/tk:.2f}x speedup; "
              f"loss rel-diff {abs(float(vp)-float(vk))/abs(float(vp)):.2e}")
