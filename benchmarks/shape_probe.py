"""Equal-voxel VNet3d forward shape probe: whole-volume b1 vs batched
patch-sized tiles (the BASELINE.md "whole-volume shape inefficiency" entry).
Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shape_probe.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from tpuseg.models.vnet import VNet

model = VNet(ndim=3, num_classes=2, features=16)
params = model.init(jax.random.key(0), jnp.zeros((1,96,96,96,1), jnp.bfloat16))
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

def sync(x): return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

@jax.jit
def fwd(params, v):
    _, probs = model.apply(params, v)
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

shapes = {
    "b1_160x160x192": (1,160,160,192,1),
    "b8_80x80x96":    (8,80,80,96,1),
    "b1_192x192x192": (1,192,192,192,1),
    "b8_96x96x96":    (8,96,96,96,1),
}
xs = {k: jax.device_put(jnp.zeros(s, jnp.bfloat16)+0.1) for k,s in shapes.items()}
for x in xs.values(): sync(x)
for k,x in xs.items():
    t0=time.perf_counter(); sync(fwd(params, x))
    print(f"compiled {k} in {time.perf_counter()-t0:.0f}s", flush=True)
times = {k: [] for k in xs}
for _ in range(7):
    for k,x in xs.items():
        t0=time.perf_counter(); sync(fwd(params,x)); times[k].append(time.perf_counter()-t0)
for k,v in times.items():
    ts=np.array(v)*1e3
    vox = float(np.prod(shapes[k][:4]))
    print(f"{k}: median {np.median(ts):.1f} ms  ({vox/1e6:.1f}M vox, {np.median(ts)/vox*1e6:.1f} us/Mvox)", flush=True)
print("SHAPE PROBE DONE", flush=True)
