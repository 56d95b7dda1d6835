"""bf16 mixed-precision PACKED train step vs the f32 default.

Round-2 root-caused why bf16 training lost in the FINE domain (BASELINE.md):
the convs already run bf16 MXU passes under f32, while a bf16 graph adds
GN f32-promotion converts + 2.2x more backward layout copies at C<=32.
Both objections are specific to the fine lane-starved layout — in the
PACKED domain every tensor already has 128 channels on the lanes, the GN
promotion is a full-width elementwise pass, and backward layouts are
uniform.  This probe measures whether bf16 compute now wins the packed
UNet3d train step at the bench secondary config (112x112x128, 5 classes,
b1, MutilDiceLoss, Adam, fine-domain loss).

Mixed-precision form: f32 master params + Adam; params/image cast to
bf16 inside the loss; logits cast back to f32 for the loss.  Loss
trajectory over 30 steps is printed for both so a quality drift is
visible alongside the rate.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bf16_packed_train_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.core import optim as optim_lib
from tpuseg.losses import build_loss
from tpuseg.models.unet import UNet
from tpuseg.models.unet_packed import packed_unet3d_apply

TRAIN_SHAPE = (128, 112, 112)
K = 5


def make_step(params, compute_dtype):
    loss_obj = build_loss("MutilDiceLoss", K, alpha=[1.0] * K)
    tx = optim_lib.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, image, label):
        if compute_dtype is not None:
            p = jax.tree_util.tree_map(
                lambda t: t.astype(compute_dtype), p
            )
            image = image.astype(compute_dtype)
        logits, _ = packed_unet3d_apply(
            p, image, num_classes=K, features=16, levels=4,
            dropout=0.0, train=True, rng=None,
        )
        return loss_obj(logits.astype(jnp.float32), label)

    @jax.jit
    def step(state, image, label):
        p, o = state
        loss, grads = jax.value_and_grad(loss_fn)(p, image, label)
        updates, o = tx.update(grads, o, p)
        p = optim_lib.apply_updates(p, updates)
        return (p, o), loss

    return step, (params, opt_state)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    model = UNet(ndim=3, num_classes=K, features=16, dropout=0.0)
    x0 = jnp.zeros((1, *TRAIN_SHAPE, 1), jnp.float32)
    params = model.init(jax.random.key(0), x0)
    image = jax.device_put(
        jnp.asarray(rng.normal(size=(1, *TRAIN_SHAPE, 1)), jnp.float32)
    )
    label = jax.device_put(
        jnp.asarray(rng.integers(0, K, size=(1, *TRAIN_SHAPE)), jnp.int32)
    )

    runners = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        step, state = make_step(params, dt)
        t0 = time.perf_counter()
        state, l0 = step(state, image, label)
        l0 = float(l0)
        print(f"{name}: compile {time.perf_counter()-t0:.1f}s "
              f"first-step loss {l0:.6f}", flush=True)
        holder = {"s": state, "losses": [l0]}

        def run(step=step, holder=holder, steps=10):
            s = holder["s"]
            for _ in range(steps):
                s, l = step(s, image, label)
            holder["s"] = s
            holder["losses"].append(float(l))

        runners[name] = (run, holder)

    ts = {k: [] for k in runners}
    for _ in range(6):
        for k, (fn, _) in runners.items():  # interleaved round-robin
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        print(f"{k}: {min(v)/10*1e3:.1f} ms/step (min)  "
              f"{np.median(v)/10*1e3:.1f} ms/step (median)")
    print(f"bf16 speedup (min): {min(ts['f32'])/min(ts['bf16']):.2f}x")
    for k, (_, h) in runners.items():
        print(f"{k} loss trajectory (every 10 steps): "
              + " ".join(f"{l:.6f}" for l in h["losses"]))


if __name__ == "__main__":
    main()
