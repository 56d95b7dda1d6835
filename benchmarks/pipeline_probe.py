"""Decompose the sliding-window pipeline + test Pallas-conv-in-VNet on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


from tpuseg.models.vnet import VNet
from tpuseg.infer.sliding_window import _sliding_window_jit, grid_positions

model = VNet(ndim=3, num_classes=2, features=16)
x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
params = model.init(jax.random.key(0), x0)
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)


def apply_fn(patches):
    _, probs = model.apply(params, patches.astype(jnp.bfloat16))
    return probs.astype(jnp.float32)


VOL = (160, 160, 192)
vol = np.random.default_rng(0).normal(size=(*VOL, 1)).astype(np.float32)
# positions are a STATIC arg of _sliding_window_jit (baked as HLO consts)
positions = tuple(map(tuple, grid_positions(VOL, (96, 96, 96), 0.5).tolist()))
pos25 = tuple(map(tuple, grid_positions(VOL, (96, 96, 96), 0.25).tolist()))
print("patches: 50%:", len(positions), "25%:", len(pos25), flush=True)

# (a) device-resident: extract+fwd+merge+argmax only
dev_vol = jax.device_put(jnp.asarray(vol))
sync(dev_vol)


def run_dev(pos, bs):
    probs, mask = _sliding_window_jit(dev_vol, pos, apply_fn, (96, 96, 96), bs, 2, False)
    return sync(mask.astype(jnp.float32))


print(f"jit_merge_fwd_dev50: {timeit(lambda: run_dev(positions, 27))*1e3:.1f} ms", flush=True)
print(f"jit_merge_fwd_dev25: {timeit(lambda: run_dev(pos25, 12))*1e3:.1f} ms", flush=True)

# (b) H2D as jit-arg: full pipeline with host input f32 vs bf16
def run_h2d(v):
    probs, mask = _sliding_window_jit(v, positions, apply_fn, (96, 96, 96), 27, 2, False)
    return sync(mask.astype(jnp.float32))


vol_bf = vol.astype(jnp.bfloat16)
print(f"pipeline_h2d_f32: {timeit(lambda: run_h2d(jnp.asarray(vol)))*1e3:.1f} ms", flush=True)
print(f"pipeline_h2d_bf16: {timeit(lambda: run_h2d(jnp.asarray(vol_bf)))*1e3:.1f} ms", flush=True)

# (c) D2H: full mask vs packed bits
probs, mask = _sliding_window_jit(dev_vol, positions, apply_fn, (96, 96, 96), 27, 2, False)
sync(mask.astype(jnp.float32))


@jax.jit
def packbits(m):
    b = m.reshape(-1, 8).astype(jnp.uint8)
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(b * w, axis=-1, dtype=jnp.uint8)


pk = packbits(mask)
sync(pk.astype(jnp.float32))
print(f"d2h_mask_u8: {timeit(lambda: np.asarray(jax.device_get(mask)))*1e3:.1f} ms", flush=True)
print(f"d2h_packed: {timeit(lambda: np.asarray(jax.device_get(pk)))*1e3:.1f} ms", flush=True)

# (d) VNet fwd batch27 with pallas conv flag on vs off
from tpuseg.nn import layers

x27 = jax.device_put(jnp.zeros((27, 96, 96, 96, 1), jnp.bfloat16) + 0.1)


def fwd_flag(flag):
    layers.USE_PALLAS_CONV3D = flag

    @jax.jit
    def f(params, x):
        _, probs = model.apply(params, x)
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    try:
        return timeit(lambda: sync(f(params, x27).astype(jnp.float32)))
    finally:
        layers.USE_PALLAS_CONV3D = False


print(f"vnet_fwd27_xla: {fwd_flag(False)*1e3:.1f} ms", flush=True)
print(f"vnet_fwd27_pallas: {fwd_flag(True)*1e3:.1f} ms", flush=True)
print("PIPELINE PROBE DONE", flush=True)
