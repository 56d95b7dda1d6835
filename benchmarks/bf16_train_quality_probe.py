"""Trained-net quality gate for bf16 mixed-precision training.

Trains the SAME UNet3d (packed stem, reference 3D config: Adam,
MutilDiceLoss) twice — compute_dtype f32 vs bf16 — on synthetic 3D
blob volumes with identical seeds/data order, and compares the final
validation dice and the per-epoch trajectories.  Gate for making the
bf16 step the bench secondary headline (BASELINE.md round-4 ledger).

VERDICT r4 #6: one seed is a low-powered gate — the synthetic task's
late epochs are admittedly noisy (f32 swings 0.53<->0.80 epoch to
epoch).  Multi-seed mode reports the best-checkpoint dice DELTA
DISTRIBUTION across seeds, not one endpoint.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/bf16_train_quality_probe.py [epochs] [nseeds]
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

SHAPE = (96, 96, 96)
K = 3  # multiclass, like the reference KiPA config (5-class); 3 keeps it light


def blobs(n, seed):
    rng = np.random.default_rng(seed)
    vols, masks = [], []
    for _ in range(n):
        vol = rng.normal(0, 1, SHAPE).astype(np.float32)
        mask = np.zeros(SHAPE, np.int32)
        for c in range(1, K):
            for _ in range(3):
                ctr = [rng.integers(s // 4, 3 * s // 4) for s in SHAPE]
                r = rng.integers(min(SHAPE) // 8, min(SHAPE) // 5)
                zz, yy, xx = np.ogrid[: SHAPE[0], : SHAPE[1], : SHAPE[2]]
                m = (
                    (zz - ctr[0]) ** 2 + (yy - ctr[1]) ** 2 + (xx - ctr[2]) ** 2
                    < r * r
                )
                mask[m] = c
                vol[m] += 1.0 + 0.5 * c
        vols.append(vol[..., None])
        masks.append(mask)
    return np.stack(vols), np.stack(masks)


def run(dtype, epochs, train, val, seed=0):
    model = UNet(ndim=3, num_classes=K, features=16, dropout=0.2)
    tr = make_segmentation_trainer(
        model,
        example_image=train[0][:1],
        num_classes=K,
        loss_name="MutilDiceLoss",
        alpha=[1.0] * K,
        config=TrainerConfig(
            epochs=epochs, lr=1e-3, optimizer="adam",
            compute_dtype=jnp.dtype(dtype), donate_state=True,
        ),
        packed_stem=True,
        seed=seed,
    )

    def batches(arrs):
        def gen():
            imgs, msks = arrs
            for i in range(len(imgs)):
                yield {"image": imgs[i : i + 1], "label": msks[i : i + 1]}
        return gen

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        hist = tr.fit(batches(train), batches(val), td)
        wall = time.perf_counter() - t0
    return hist, wall


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nseeds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print("platform:", jax.devices()[0].platform, flush=True)
    deltas_best, deltas_final = [], []
    for seed in range(nseeds):
        # fresh data AND fresh init per seed (identical between dtypes)
        train = blobs(8, 1 + 100 * seed)
        val = blobs(2, 2 + 100 * seed)
        out = {}
        for dtype in ("float32", "bfloat16"):
            hist, wall = run(dtype, epochs, train, val, seed=seed)
            out[dtype] = hist["valdation_accuracy"]
            print(f"[seed {seed}][{dtype}] {wall:.1f}s  val dice by epoch: "
                  + " ".join(f"{d:.5f}" for d in out[dtype]), flush=True)
        f32, bf16 = out["float32"], out["bfloat16"]
        d_best = max(bf16) - max(f32)
        d_final = bf16[-1] - f32[-1]
        deltas_best.append(d_best)
        deltas_final.append(d_final)
        print(f"[seed {seed}] best-ckpt dice: f32 {max(f32):.6f}  "
              f"bf16 {max(bf16):.6f}  delta {d_best:+.4f}   "
              f"final delta {d_final:+.4f}", flush=True)
    if nseeds > 1:
        db, df = np.array(deltas_best), np.array(deltas_final)
        print(f"\n=== {nseeds}-seed gate (bf16 - f32; negative = bf16 worse)")
        print(f"best-ckpt delta: mean {db.mean():+.4f}  min {db.min():+.4f}  "
              f"max {db.max():+.4f}  per-seed "
              + " ".join(f"{d:+.4f}" for d in db))
        print(f"final     delta: mean {df.mean():+.4f}  min {df.min():+.4f}  "
              f"max {df.max():+.4f}  per-seed "
              + " ".join(f"{d:+.4f}" for d in df))


if __name__ == "__main__":
    main()
