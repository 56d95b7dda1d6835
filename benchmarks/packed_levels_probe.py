"""packed_levels=1 vs 2: does packing the 48^3-scale C32 level too pay?

(a) fwd27 bf16 — the bench primary's hot program (class-major head,
    matching bench.py's packed_layout="class" since round 4 — VERDICT
    r4 #5 asked for a post-fold-merge/post-class-major revalidation)
(b) VNet3d 96^3 b1 f32 train step via the public factory

Interleaved reps (pool-contention rule, CLAUDE.md); min + median.
Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/packed_levels_probe.py [fwd|train]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def _stats(ts, inner):
    ts = sorted(ts)
    return ts[0] / inner * 1e3, ts[len(ts) // 2] / inner * 1e3


def probe_fwd(reps=7, inner=2):
    import jax
    import jax.numpy as jnp
    from tpuseg.models.vnet import VNet
    from tpuseg.models.vnet_packed import packed_vnet3d_probs

    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    xb = jax.device_put(
        (np.random.default_rng(0).normal(size=(27, 96, 96, 96, 1)) * 0.3)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    fns = {}
    for lv in (1, 2):
        fns[lv] = jax.jit(
            lambda x, lv=lv: packed_vnet3d_probs(
                params, x, return_packed=True, packed_levels=lv,
                packed_layout="class",
            )
        )
    outs = {lv: sync(fn(xb)) for lv, fn in fns.items()}
    # exactness cross-check on the real program (class-major: [K, 8])
    a = np.asarray(fns[1](xb), np.float32)
    b = np.asarray(fns[2](xb), np.float32)
    print(f"fwd27 lv1-vs-lv2 max prob diff {np.abs(a - b).max():.2e}, "
          f"argmax agree "
          f"{(a.reshape(*a.shape[:4],2,8).argmax(-2) == b.reshape(*b.shape[:4],2,8).argmax(-2)).mean():.6f}")
    ts = {lv: [] for lv in fns}
    for _ in range(reps):
        for lv, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(inner):
                sync(fn(xb))
            ts[lv].append(time.perf_counter() - t0)
    for lv in fns:
        mn, md = _stats(ts[lv], inner)
        print(f"fwd27 packed_levels={lv}: min {mn:.1f} ms  median {md:.1f} ms")


def probe_train(reps=5, inner=8):
    import tpuseg.models.vnet_packed as vp
    from tpuseg.models.vnet import VNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, 96, 96, 96, 1)).astype(np.float32),
        "label": (rng.random(size=(1, 96, 96, 96)) > 0.7).astype(np.int32),
    }
    runners = {}
    for lv in (1, 2):
        vp.PACKED_LEVELS_DEFAULT = lv
        tr = make_segmentation_trainer(
            VNet(ndim=3, num_classes=2, features=16, dropout=0.2),
            example_image=np.zeros_like(batch["image"]),
            num_classes=2,
            loss_name="MutilDiceLoss",
            alpha=[1.0, 1.0],
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
            packed_stem=True,
        )
        tr._build_steps()
        db = tr._put(batch)
        state, m = tr._train_step(tr.state, db)
        print(f"train packed_levels={lv}: first loss {float(m['loss']):.5f}")
        holder = {"s": state}

        def run(tr=tr, db=db, holder=holder):
            s = holder["s"]
            for _ in range(inner):
                s, mm = tr._train_step(s, db)
            holder["s"] = s
            return float(mm["loss"])

        runners[lv] = run
    vp.PACKED_LEVELS_DEFAULT = 1

    ts = {lv: [] for lv in runners}
    for _ in range(reps):
        for lv, fn in runners.items():
            t0 = time.perf_counter()
            fn()
            ts[lv].append(time.perf_counter() - t0)
    for lv in runners:
        mn, md = _stats(ts[lv], inner)
        print(f"train 96^3 b1 packed_levels={lv}: min {mn:.1f} ms  median {md:.1f} ms")


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform)
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("fwd", "both"):
        probe_fwd()
    if mode in ("train", "both"):
        probe_train()
