"""VNet3d train step, plain vs packed stem, via the public factory.

Shapes: 96^3 b1 (reference LIDC-style patch training) and 64^3 b4
(BASELINE config-4 vessel shape).  Run on TPU with an idle host.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax

from tpuseg.models.vnet import VNet
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig


def measure(shape, batch_size, steps=10, reps=4):
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(batch_size, *shape, 1)).astype(np.float32),
        "label": (rng.random(size=(batch_size, *shape)) > 0.7).astype(np.int32),
    }
    runners = {}
    for name, packed in (("plain", False), ("packed", True)):
        tr = make_segmentation_trainer(
            VNet(ndim=3, num_classes=2, features=16, dropout=0.2),
            example_image=np.zeros((batch_size, *shape, 1), np.float32),
            num_classes=2,
            loss_name="MutilDiceLoss",
            alpha=[1.0, 1.0],
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
            packed_stem=packed,
        )
        tr._build_steps()
        db = tr._put(batch)
        state, m = tr._train_step(tr.state, db)
        _ = float(m["loss"])
        holder = {"s": state}

        def run(tr=tr, db=db, holder=holder):
            s = holder["s"]
            for _ in range(steps):
                s, mm = tr._train_step(s, db)
            holder["s"] = s
            return float(mm["loss"])

        runners[name] = run

    ts = {k: [] for k in runners}
    for _ in range(reps):
        for k, fn in runners.items():
            t0 = time.perf_counter()
            fn()
            ts[k].append(time.perf_counter() - t0)
    mins = {k: min(v) / steps for k, v in ts.items()}
    print(f"VNet3d {shape} b{batch_size}: plain {mins['plain']*1e3:.1f} ms  "
          f"packed {mins['packed']*1e3:.1f} ms  "
          f"speedup {mins['plain']/mins['packed']:.2f}x")


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    measure((96, 96, 96), 1)
    measure((64, 64, 64), 4)
