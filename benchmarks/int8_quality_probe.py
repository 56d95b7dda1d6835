"""int8 inference quality + speed on a TRAINED net (VERDICT r2 #2 gate).

Trains the config-3 setup briefly (BinaryUNet3d on synthetic blobs, as in
benchmarks/bench_configs.py config3), then runs sliding-window inference on
held-out volumes through (a) the bf16 path and (b) the int8 W8A8 path
(nn/layers.py int8_inference), reporting per-volume dice vs ground truth,
the dice delta, and voxel agreement — the BASELINE.json north-star gate is
dice parity <=1e-4.  Also times VNet3d fwd27 bf16 vs int8 (the bench's hot
program) with interleaved floor-swamped reps.

Run on the TPU with an idle host:  python benchmarks/int8_quality_probe.py
"""
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from bench_configs import blobs3d, write_3d, dice_of  # noqa: E402


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main():
    import jax
    import jax.numpy as jnp

    from tpuseg.compat import BinaryUNet3dModel
    from tpuseg.infer.sliding_window import sliding_window_inference
    from tpuseg.models.vnet import VNet
    from tpuseg.nn.layers import int8_inference

    print("platform:", jax.devices()[0].platform)
    tmp = tempfile.mkdtemp()
    shape = (96, 96, 96)
    tv, tm = blobs3d(10, shape, 4)
    vv, vm = blobs3d(3, (160, 160, 192), 5)
    tcsv = write_3d(tmp, tv, tm, "q3t")
    import pandas as pd

    t = pd.read_csv(tcsv)
    m = BinaryUNet3dModel(96, 96, 96, 1, 1, 2, "BinaryDiceLoss")
    m.trainprocess(list(t.Image), list(t.Mask), list(t.Image)[:4],
                   list(t.Mask)[:4], os.path.join(tmp, "q3run"), epochs=8)

    params_bf = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        m.trainer.state["params"],
    )

    def apply_bf16(patches):
        _, probs = m.model.apply(params_bf, patches.astype(jnp.bfloat16))
        return probs.astype(jnp.float32)

    def apply_int8(patches):
        # trace-time flag: entered inside the traced function body so the
        # int8 branch is taken whenever this closure is (re)traced
        with int8_inference():
            _, probs = m.model.apply(params_bf, patches.astype(jnp.bfloat16))
        return probs.astype(jnp.float32)

    masks = {}
    for tag, fn in (("bf16", apply_bf16), ("int8", apply_int8)):
        dices = []
        ms = []
        for v_, g_ in zip(vv, vm):
            mask = sliding_window_inference(
                v_, shape, fn, 1, 27, overlap=0.5, return_mask=True,
                transfer_dtype="uint8",
            )
            ms.append(np.asarray(mask))
            dices.append(dice_of(np.asarray(mask), g_))
        masks[tag] = ms
        print(f"{tag}: dice vs gt per vol {['%.6f' % d for d in dices]} "
              f"mean {np.mean(dices):.6f}")
    agree = np.mean([
        (a == b).mean() for a, b in zip(masks["bf16"], masks["int8"])
    ])
    d_bf = np.mean([dice_of(a, g) for a, g in zip(masks["bf16"], vm)])
    d_i8 = np.mean([dice_of(a, g) for a, g in zip(masks["int8"], vm)])
    print(f"RESULT dice_bf16={d_bf:.6f} dice_int8={d_i8:.6f} "
          f"delta={abs(d_bf - d_i8):.2e} voxel_agreement={agree:.6f}")

    # ---- fwd27 timing: VNet3d (the bench net), bf16 vs int8 ----
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
    vp = model.init(jax.random.key(0), x0)
    vp = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vp)
    xb = jax.device_put(
        (np.random.default_rng(0).normal(size=(27, 96, 96, 96, 1)) * 0.3)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    @jax.jit
    def fwd_bf16(x):
        _, probs = model.apply(vp, x)
        return probs

    with int8_inference():
        @jax.jit
        def fwd_int8(x):
            _, probs = model.apply(vp, x)
            return probs

    fns = {"bf16": fwd_bf16, "int8": fwd_int8}
    for fn in fns.values():
        sync(fn(xb))
    ts = {}
    for _ in range(7):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            sync(fn(xb))
            ts.setdefault(tag, []).append(time.perf_counter() - t0)
    for tag, tt in ts.items():
        print(f"fwd27 {tag}: min {min(tt)*1e3:.1f} ms  "
              f"median {sorted(tt)[len(tt)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
