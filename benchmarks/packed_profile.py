"""Profile the NEW walls after the round-3 packed rewrites:
  (a) packed VNet3d fwd27 (~138 ms)    — bench primary's hot program
  (b) packed UNet3d train step (~66 ms) — bench secondary

Prints the top device ops from the xplane trace so the next lever can be
chosen from data, like the r3 stage profile that found the 96^3 layout
wall.  Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/packed_profile.py [fwd|train]
"""
import glob
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def report(trace_dir, label):
    from xplane_ops import parse

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    assert pbs, "no xplane produced"
    for plane, (durs, counts) in parse(pbs[-1]).items():
        if not durs or ("TPU" not in plane and "/device" not in plane.lower()):
            continue
        total = sum(durs.values())
        print(f"\n=== {label}: plane {plane} (total {total/1e9:.1f} ms over 3 reps)")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {d/1e9:8.2f} ms x{counts[name]:<4d} {name[:100]}")


def profile_fwd():
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

    @jax.jit
    def fwd(x):
        # class-major head (r4): the packed softmax is slice arithmetic
        return packed_vnet3d_probs(params, x, return_packed=True,
                                   packed_layout="class")

    sync(fwd(xb))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(fwd(xb))
    print(f"packed fwd27 wall {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/rep")
    trace_dir = "/tmp/packed_fwd_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            sync(fwd(xb))
    report(trace_dir, "packed fwd27")


def profile_train():
    import jax
    from tpuseg.models.unet import UNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    TRAIN_SHAPE = (128, 112, 112)
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
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, *TRAIN_SHAPE, 1)).astype(np.float32),
        "label": rng.integers(0, 5, size=(1, *TRAIN_SHAPE)).astype(np.int32),
    }
    db = tr._put(batch)
    state, m = tr._train_step(tr.state, db)
    print("first loss", float(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = tr._train_step(state, db)
    _ = float(m["loss"])
    print(f"packed train wall {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms/step")
    trace_dir = "/tmp/packed_train_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = tr._train_step(state, db)
        _ = float(m["loss"])
    report(trace_dir, "packed train step")


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform)
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("fwd", "both"):
        profile_fwd()
    if mode in ("train", "both"):
        profile_train()
