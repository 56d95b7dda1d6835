"""Round-2 perf probe (real TPU via axon relay): decompose the
sliding-window benchmark into transfer / compute pieces and measure XLA's
conv3d throughput at the stem-layer shapes the Pallas kernel targets.

All timings end with a host scalar fetch (block_until_ready is a relay
no-op, CLAUDE.md).  Prints each result as it lands.
"""
import gc
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def emit(k, v):
    print(f"{k}: {v:.5f}", flush=True)


# ---- 1. H2D / D2H costs at benchmark sizes
vol_f32 = np.random.default_rng(0).normal(size=(160, 160, 192, 1)).astype(np.float32)
vol_bf16 = vol_f32.astype(jnp.bfloat16)


def h2d(a):
    d = jax.device_put(a)
    sync(d.astype(jnp.float32))


emit("h2d_f32_19.7MB_s", timeit(lambda: h2d(vol_f32)))
emit("h2d_bf16_9.8MB_s", timeit(lambda: h2d(vol_bf16)))

mask_dev = jnp.zeros((160, 160, 192), jnp.uint8) + 1
sync(mask_dev.astype(jnp.float32))
emit("d2h_u8_4.9MB_s", timeit(lambda: np.asarray(mask_dev)))
del mask_dev, vol_bf16
gc.collect()

# ---- 2. batch-27 VNet3d forward alone (device-resident input)
from tpuseg.models.vnet import VNet

model = VNet(ndim=3, num_classes=2, features=16)
x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
params = model.init(jax.random.key(0), x0)
params_bf = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
del params


@jax.jit
def fwd27(params, x):
    _, probs = model.apply(params, x)
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8)


x27 = jax.device_put(np.zeros((27, 96, 96, 96, 1), np.float16).astype(jnp.bfloat16))
emit("vnet3d_fwd_batch27_s", timeit(lambda: sync(fwd27(params_bf, x27).astype(jnp.float32))))
del x27
gc.collect()

# ---- 3. full sliding-window pipeline (matches bench.py)
from tpuseg.infer.sliding_window import sliding_window_inference


def apply_fn(patches):
    _, probs = model.apply(params_bf, patches.astype(jnp.bfloat16))
    return probs.astype(jnp.float32)


vol3 = vol_f32[..., 0]
emit(
    "sliding_window_full_s",
    timeit(lambda: sliding_window_inference(vol3, (96, 96, 96), apply_fn, 2, 27, return_mask=True)),
)
del params_bf
gc.collect()

# ---- 4. XLA conv3d throughput at kernel-target shapes (bf16, k3 s1 SAME)
def conv_tf(batch, res, cin, cout, reps=3, chain=6):
    x = jax.device_put(np.full((batch, res, res, res, cin), 0.01, np.float32).astype(jnp.bfloat16))
    ws = [
        jax.device_put(np.full((3, 3, 3, cin if i == 0 else cout, cout), 0.01, np.float32).astype(jnp.bfloat16))
        for i in range(chain)
    ]

    @jax.jit
    def run(x, ws):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16,
            ) * 1e-2
        return x

    sync(run(x, ws).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(run(x, ws).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / reps
    flops = 0.0
    for i in range(chain):
        ci = cin if i == 0 else cout
        flops += 2.0 * 27 * ci * cout * batch * res ** 3
    del x, ws
    gc.collect()
    return flops / dt / 1e12


emit("xla_c16_96cube_b8_tf", conv_tf(8, 96, 16, 16))
emit("xla_c32_48cube_b8_tf", conv_tf(8, 48, 32, 32))
emit("xla_c16_96cube_b1_tf", conv_tf(1, 96, 16, 16))
print("PROBE DONE", flush=True)
