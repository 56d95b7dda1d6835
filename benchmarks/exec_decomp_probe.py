"""Decompose the sliding-window EXEC time: fwd27 vs extract+merge+argmax.

Everything interleaved; device-resident inputs; sync via tiny scalar fetch
(block_until_ready is a relay no-op).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models.vnet import VNet
from tpuseg.infer.sliding_window import _sliding_window_jit, grid_positions

PATCH = (96, 96, 96)
VOL = (160, 160, 192)

model = VNet(ndim=3, num_classes=2, features=16)
params = model.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1), jnp.bfloat16))
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)


def apply_fn(patches):
    _, probs = model.apply(params, patches.astype(jnp.bfloat16))
    return probs.astype(jnp.float32)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))


rng0 = np.random.default_rng(0)
vol = rng0.normal(size=(*VOL, 1)).astype(np.float32)
codes = np.clip(np.round(vol * 40 + 100), 0, 255).astype(np.uint8)
dequant = jnp.asarray([0.025, -2.5], jnp.float32)
positions = tuple(map(tuple, grid_positions(VOL, PATCH, 0.5).tolist()))

dev_codes = jax.device_put(jnp.asarray(codes))
sync(dev_codes)

# full device-resident pipeline (u8 dequant + extract + fwd27 + merge +
# argmax + packbits), fetch only a tiny scalar
def exec_pipeline(bs=14):
    probs, mask = _sliding_window_jit(
        dev_codes, positions, apply_fn, PATCH, bs, 2, False, True, True, dequant
    )
    return sync(mask)


# fwd27 alone on a pre-extracted patch batch
x27 = jax.device_put(jnp.zeros((27, *PATCH, 1), jnp.bfloat16) + 0.1)
sync(x27)


@jax.jit
def fwd_only(params, x):
    _, probs = model.apply(params, x)
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8)


def exec_fwd():
    return sync(fwd_only(params, x27))


# extract+merge+argmax with a TRIVIAL network (isolates the non-fwd parts)
def trivial_apply(patches):
    s = patches.astype(jnp.float32)
    return jnp.concatenate([s, 1.0 - s], axis=-1)


def exec_scaffold():
    probs, mask = _sliding_window_jit(
        dev_codes, positions, trivial_apply, PATCH, 27, 2, False, True, True, dequant
    )
    return sync(mask)


probes = {
    "pipeline_b14": lambda: exec_pipeline(14),
    "pipeline_b9": lambda: exec_pipeline(9),
    "fwd27": exec_fwd,
    "scaffold": exec_scaffold,
}
for fn in probes.values():
    fn()
times = {k: [] for k in probes}
for _ in range(7):
    for k, fn in probes.items():
        t0 = time.perf_counter()
        fn()
        times[k].append(time.perf_counter() - t0)
for k, v in times.items():
    ts = np.array(v) * 1e3
    print(f"{k}: median {np.median(ts):.1f} ms  min {ts.min():.1f}  max {ts.max():.1f}", flush=True)
print("EXEC DECOMP DONE", flush=True)
