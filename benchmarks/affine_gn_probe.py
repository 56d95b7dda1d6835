"""USE_AFFINE_GN_LOWP A/B on the bf16 packed train step.

The r5 train-step xplane profile (BASELINE.md round-5 ledger,
benchmarks/train_step_profile.py + trainstep_trace_analyze.py) shows
the fused GN-stats reductions + f32 normalize round trips hold ~13.6
of the 54.1 ms/step bf16 op-line time.  The affine GN form
(models/vnet_packed.py: y = x*a + b with a/b folded in f32, one bf16
FMA over the activation instead of the f32 (g-mean)*inv round trip)
targets exactly that traffic; this probe measures it interleaved
against the default reshape form at the bench secondary config
(UNet3d packed stem, 112x112x128, 5 classes, b1, MutilDiceLoss, Adam,
compute_dtype=bfloat16).

The flag is baked at trace time, so each variant compiles its own jit
program with the module constant monkeypatched; loss trajectories are
printed for a quality cross-check (the forms differ only by bf16
rounding of the cancellation, unit-tested <=2e-2 relative on the
activation).

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/affine_gn_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.core import optim as optim_lib
from tpuseg.losses import build_loss
from tpuseg.models import vnet_packed
from tpuseg.models.unet import UNet
from tpuseg.models.unet_packed import packed_unet3d_apply

TRAIN_SHAPE = (128, 112, 112)
K = 5


def make_step(params):
    loss_obj = build_loss("MutilDiceLoss", K, alpha=[1.0] * K)
    tx = optim_lib.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, image, label):
        p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
        logits, _ = packed_unet3d_apply(
            p, image.astype(jnp.bfloat16), num_classes=K, features=16,
            levels=4, dropout=0.0, train=True, rng=None,
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
    for name, flag in (("reshape", False), ("affine", True)):
        vnet_packed.USE_AFFINE_GN_LOWP = flag
        step, state = make_step(params)
        t0 = time.perf_counter()
        state, l0 = step(state, image, label)  # traces with `flag` baked
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
    vnet_packed.USE_AFFINE_GN_LOWP = False

    ts = {k: [] for k in runners}
    for _ in range(6):
        for k, (fn, _) in runners.items():  # interleaved round-robin
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        print(f"{k}: {min(v)/10*1e3:.1f} ms/step (min)  "
              f"{np.median(v)/10*1e3:.1f} ms/step (median)")
    print("affine speedup (min): "
          f"{min(ts['reshape'])/min(ts['affine']):.3f}x")
    for k, (_, h) in runners.items():
        print(f"{k} loss trajectory (every 10 steps): "
              + " ".join(f"{l:.6f}" for l in h["losses"]))


if __name__ == "__main__":
    main()
