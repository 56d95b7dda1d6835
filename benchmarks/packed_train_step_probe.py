"""Full UNet3d train step, plain vs packed stem, at the bench secondary
config (112x112x128, 5 classes, bs 1, f32, MutilDiceLoss, Adam).

Run on the TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/packed_train_step_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models.unet import UNet
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig

TRAIN_SHAPE = (128, 112, 112)


def build(packed, grid=False, cls=False, dtype="float32", lv=1):
    # loss-domain flags (tasks/segmentation.py): grid = delta-major
    # packed-grid loss, cls = class-major slice-form loss
    # (losses/packed_class.py); both off = fine-domain loss (d2s pair in
    # the train graph).  lv: UNet packed levels (models/unet_packed.py).
    from tpuseg.models import unet_packed
    from tpuseg.tasks import segmentation

    unet_packed.UNET_PACKED_LEVELS_DEFAULT = lv

    segmentation.USE_PACKED_GRID_LOSS = grid
    segmentation.USE_PACKED_CLASS_LOSS = cls
    unet = UNet(ndim=3, num_classes=5, features=16, dropout=0.2)
    tr = make_segmentation_trainer(
        unet,
        example_image=np.zeros((1, *TRAIN_SHAPE, 1), np.float32),
        num_classes=5,
        loss_name="MutilDiceLoss",
        alpha=[1.0] * 5,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam",
                             compute_dtype=jnp.dtype(dtype)),
        packed_stem=packed,
    )
    tr._build_steps()
    return tr


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, *TRAIN_SHAPE, 1)).astype(np.float32),
        "label": rng.integers(0, 5, size=(1, *TRAIN_SHAPE)).astype(np.int32),
    }
    runners = {}
    variants = (
        ("plain", False, False, False, "float32"),
        ("packed_fineloss", True, False, False, "float32"),  # r4 default
        ("packed_gridloss", True, True, False, "float32"),   # delta-major grid loss
        ("packed_classloss", True, False, True, "float32"),  # class-major slice loss
        ("packed_bf16", True, False, False, "bfloat16"),     # mixed precision
        ("packed_bf16_grid", True, True, False, "bfloat16"), # bf16 + grid loss
        ("packed_bf16_cls", True, False, True, "bfloat16"),  # bf16 + class loss
        ("packed_lv2", True, False, False, "float32", 2),    # 2 packed levels
        ("packed_bf16_lv2", True, False, False, "bfloat16", 2),
    )
    if len(sys.argv) > 1:  # e.g. "plain,packed_fineloss,packed_bf16"
        keep = set(sys.argv[1].split(","))
        variants = tuple(v for v in variants if v[0] in keep)
    for name, packed, grid, cls, dtype, *rest in variants:
        tr = build(packed, grid, cls, dtype, lv=(rest[0] if rest else 1))
        dev_batch = tr._put(batch)
        state, m = tr._train_step(tr.state, dev_batch)
        loss0 = float(m["loss"])
        holder = {"s": state}

        def run(tr=tr, dev_batch=dev_batch, holder=holder, steps=10):
            s = holder["s"]
            for _ in range(steps):
                s, mm = tr._train_step(s, dev_batch)
            holder["s"] = s
            return float(mm["loss"])

        runners[name] = run
        print(f"{name}: first-step loss {loss0:.5f}")

    ts = {k: [] for k in runners}
    for _ in range(5):
        for k, fn in runners.items():
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        print(f"{k}: {min(v)/10*1e3:.1f} ms/step (min)  "
              f"{np.median(v)/10*1e3:.1f} ms/step (median)")
    if "plain" in ts and len(ts) > 1:
        best = min(min(ts[k]) for k in ts if k != "plain")
        print(f"speedup (min, best packed variant): "
              f"{min(ts['plain'])/best:.2f}x")


if __name__ == "__main__":
    main()
