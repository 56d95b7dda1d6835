"""Interleaved A/B: uint8 HU-coded vs bf16 vs f32 sliding-window upload.

The full-bench sequential measurement showed u8 slower than bf16 on the
sliding path but 1.4x faster on the whole-volume path — inconsistent with
the transfer model. Interleaving reps cancels pool-contention drift.
Also times the raw H2D uploads of each dtype.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models.vnet import VNet
from tpuseg.infer.sliding_window import sliding_window_inference

PATCH = (96, 96, 96)
VOL = (160, 160, 192)

model = VNet(ndim=3, num_classes=2, features=16)
params = model.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1), jnp.bfloat16))
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)


def apply_fn(patches):
    _, probs = model.apply(params, patches.astype(jnp.bfloat16))
    return probs.astype(jnp.float32)


rng0 = np.random.default_rng(0)
hu = rng0.normal(0.0, 120.0, size=VOL)
hu[40:120, 40:120, 48:144] += rng0.normal(60.0, 30.0, size=(80, 80, 96))
vol_hu = np.round(hu).astype(np.float32)
trunc = np.clip(vol_hu, -100.0, 100.0)
mean, std = float(trunc.mean()), float(trunc.std())
vol = ((trunc - mean) / std).astype(np.float32)
codes = (trunc + 100.0).astype(np.uint8)
dequant = jnp.asarray(np.asarray((1.0 / std, (-100.0 - mean) / std), np.float32))

opts = dict(return_mask=True, pack_mask=True)


def run_u8():
    return sliding_window_inference(codes, PATCH, apply_fn, 2, 27, dequant=dequant, **opts)


def run_bf16():
    return sliding_window_inference(vol, PATCH, apply_fn, 2, 27, transfer_dtype="bfloat16", **opts)


def run_f32():
    return sliding_window_inference(vol, PATCH, apply_fn, 2, 27, **opts)


# raw H2D probes (sync by tiny reduce fetch)
import ml_dtypes

host_u8 = codes[..., None]
host_bf = vol[..., None].astype(ml_dtypes.bfloat16)
host_f32 = vol[..., None]


def h2d(a):
    d = jnp.asarray(a)
    return float(jnp.sum(d.astype(jnp.float32).ravel()[:8]))


probes = {
    "pipe_u8": run_u8, "pipe_bf16": run_bf16, "pipe_f32": run_f32,
    "h2d_u8": lambda: h2d(host_u8), "h2d_bf16": lambda: h2d(host_bf),
    "h2d_f32": lambda: h2d(host_f32),
}
times = {k: [] for k in probes}
for k, fn in probes.items():  # compile/warm
    fn()
REPS = 7
for r in range(REPS):
    for k, fn in probes.items():  # interleaved
        t0 = time.perf_counter()
        fn()
        times[k].append(time.perf_counter() - t0)
for k in probes:
    ts = np.array(times[k]) * 1e3
    print(f"{k}: median {np.median(ts):.1f} ms  min {ts.min():.1f}  max {ts.max():.1f}", flush=True)
print("AB PROBE DONE", flush=True)
