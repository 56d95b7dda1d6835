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


def make_step(params, compute_dtype=jnp.bfloat16):
    loss_obj = build_loss("MutilDiceLoss", K, alpha=[1.0] * K)
    tx = optim_lib.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, image, label):
        if compute_dtype is not None:
            p = jax.tree_util.tree_map(
                lambda t: t.astype(compute_dtype), p)
            image = image.astype(compute_dtype)
        logits, _ = packed_unet3d_apply(
            p, image, num_classes=K, features=16,
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

    # (name, USE_AFFINE_GN_LOWP, USE_GEMM_STEM_DW, compute_dtype) —
    # gemm-dw targets the 2.13 ms stem filter-grad fusion from the same
    # r5 profile; the f32 pair checks the lever on the product default
    # (affine-gn self-gates OFF for f32 inputs, so only gemm-dw applies)
    variants = (
        ("baseline", False, False, jnp.bfloat16),
        ("affine-gn", True, False, jnp.bfloat16),
        ("gemm-dw", False, True, jnp.bfloat16),
        ("both", True, True, jnp.bfloat16),
        ("f32-baseline", False, False, None),
        ("f32-gemm-dw", False, True, None),
    )
    import sys
    if len(sys.argv) > 1:  # optional variant-name filter
        keep = set(sys.argv[1].split(","))
        variants = tuple(v for v in variants if v[0] in keep)
    runners = {}
    for name, gn_flag, dw_flag, dt in variants:
        vnet_packed.USE_AFFINE_GN_LOWP = gn_flag
        vnet_packed.USE_GEMM_STEM_DW = dw_flag
        step, state = make_step(params, dt)
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
    vnet_packed.USE_GEMM_STEM_DW = False

    ts = {k: [] for k in runners}
    for _ in range(6):
        for k, (fn, _) in runners.items():  # interleaved round-robin
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        print(f"{k}: {min(v)/10*1e3:.1f} ms/step (min)  "
              f"{np.median(v)/10*1e3:.1f} ms/step (median)")
    for k in ts:
        ref = "f32-baseline" if k.startswith("f32") else "baseline"
        if k != ref and ref in ts:
            print(f"{k} speedup vs {ref} (min): "
                  f"{min(ts[ref])/min(ts[k]):.3f}x")
    for k, (_, h) in runners.items():
        print(f"{k} loss trajectory (every 10 steps): "
              + " ".join(f"{l:.6f}" for l in h["losses"]))


if __name__ == "__main__":
    main()
