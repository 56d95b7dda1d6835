"""In-net measurement of the shift-stack packed k3 (USE_SHIFT_PACKED_K3):

  * fwd27: the packed lv2 bf16 VNet3d forward at the primary config
    (27x96^3, class-major probs) — dense coarse k3 vs shift-stack.
  * train: the full UNet3d train step at the bench secondary config
    (112x112x128, 5 classes, f32, fine-domain loss) — dense vs shift.

The flag is read at trace time, so each variant is traced with the flag
pinned; exactness is asserted on the first (compile) call.  Variants are
interleaved round-robin (pool contention is one-sided); min+median
reported.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shift_innet_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import vnet_packed as vp
from tpuseg.models.vnet import VNet
from tpuseg.models.unet import UNet
from tpuseg.models.vnet_packed import packed_vnet3d_probs
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig

TRAIN_SHAPE = (128, 112, 112)


def fwd27_phase():
    PATCH = (96, 96, 96)
    B = 27
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, *PATCH, 1)), jnp.bfloat16
    )
    x = jax.device_put(x)

    def make(shift):
        @jax.jit
        def fwd(v):
            return packed_vnet3d_probs(params, v, return_packed=True,
                                       packed_layout="class")

        vp.USE_SHIFT_PACKED_K3 = shift
        try:
            t0 = time.perf_counter()
            out = fwd(x)
            s = float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
        finally:
            vp.USE_SHIFT_PACKED_K3 = False
        print(f"[fwd27] compile shift={shift}: "
              f"{time.perf_counter()-t0:.1f}s (sync {s:.4f})", flush=True)
        return fwd, out

    fns, outs = {}, {}
    for name, shift in (("dense", False), ("shift", True)):
        fns[name], outs[name] = make(shift)
    diff = float(jnp.max(jnp.abs(
        outs["dense"].astype(jnp.float32) - outs["shift"].astype(jnp.float32)
    )))
    print(f"[fwd27] max|probs dense-shift| = {diff:.3e}", flush=True)

    REPS = 7
    ts = {k: [] for k in fns}
    for r in range(REPS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            out = f(x)
            float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
            ts[k].append(time.perf_counter() - t0)
        print(f"[fwd27] rep {r}: " + " ".join(
            f"{k}={ts[k][-1]*1e3:.1f}ms" for k in fns), flush=True)
    for k in fns:
        v = np.asarray(ts[k]) * 1e3
        print(f"[fwd27] {k}: min {v.min():.1f} ms  "
              f"median {np.median(v):.1f} ms", flush=True)


def build_trainer(shift):
    unet = UNet(ndim=3, num_classes=5, features=16, dropout=0.2)
    tr = make_segmentation_trainer(
        unet,
        example_image=np.zeros((1, *TRAIN_SHAPE, 1), np.float32),
        num_classes=5,
        loss_name="MutilDiceLoss",
        alpha=[1.0] * 5,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
        packed_stem=True,
    )
    tr._build_steps()
    return tr


def train_phase():
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, *TRAIN_SHAPE, 1)).astype(np.float32),
        "label": rng.integers(0, 5, size=(1, *TRAIN_SHAPE)).astype(np.int32),
    }
    runners = {}
    for name, shift in (("dense", False), ("shift", True)):
        tr = build_trainer(shift)
        dev_batch = tr._put(batch)
        vp.USE_SHIFT_PACKED_K3 = shift
        try:
            t0 = time.perf_counter()
            state, m = tr._train_step(tr.state, dev_batch)
            loss0 = float(m["loss"])
        finally:
            vp.USE_SHIFT_PACKED_K3 = False
        print(f"[train] {name}: compile {time.perf_counter()-t0:.1f}s "
              f"first-step loss {loss0:.6f}", flush=True)
        holder = {"s": state}

        def run(tr=tr, dev_batch=dev_batch, holder=holder, steps=10):
            s = holder["s"]
            for _ in range(steps):
                s, mm = tr._train_step(s, dev_batch)
            holder["s"] = s
            return float(mm["loss"])

        runners[name] = run

    ts = {k: [] for k in runners}
    for r in range(5):
        for k, fn in runners.items():
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
        print(f"[train] rep {r}: " + " ".join(
            f"{k}={ts[k][-1]/10*1e3:.1f}ms/step" for k in runners),
            flush=True)
    for k, v in ts.items():
        print(f"[train] {k}: {min(v)/10*1e3:.1f} ms/step (min)  "
              f"{np.median(v)/10*1e3:.1f} ms/step (median)", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    fwd27_phase()
    train_phase()


if __name__ == "__main__":
    main()
