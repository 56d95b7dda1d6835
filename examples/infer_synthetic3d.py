"""End-to-end 3D sliding-window inference driver (verify flow #2).

Builds a small VNet3d, fabricates an integer-HU synthetic CT volume, and
runs the full `inference_patch` pipeline (`/root/reference/model/
modelUnet.py:707-763` capability) through every transfer mode:

  * default f32 upload of the host-normalized volume,
  * bfloat16 upload,
  * LOSSLESS uint8 HU-coded upload (the HU window spans <= 255 integer
    levels, so 1 byte/voxel is exact — see infer_volume_patched),

plus the whole-volume `inference` path, and checks the masks agree.
Runs on CPU (small shapes) or the real TPU chip unchanged.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
if "--cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.data.geometry import Volume
from tpuseg.infer.volume import infer_volume, infer_volume_patched
from tpuseg.models.vnet import VNet


def main():
    patch = (32, 32, 32)
    vol_shape = (48, 48, 64)
    num_classes = 2

    rng = np.random.default_rng(0)
    hu = np.round(rng.normal(0.0, 120.0, size=vol_shape)).astype(np.float32)
    hu[12:36, 12:36, 16:48] += 80.0  # a bright "lesion"
    src = Volume(hu, spacing=(1.0, 1.0, 1.0))

    model = VNet(ndim=3, num_classes=num_classes, features=8)
    params = model.init(jax.random.key(0), np.zeros((1, *patch, 1), np.float32))

    def apply_fn(patches):
        _, probs = model.apply(params, patches)
        return probs

    hu_window = (100, -100, "meanstd")
    t0 = time.time()
    m_f32 = infer_volume_patched(
        src, apply_fn, patch, num_classes, hu_window=hu_window, batch_size=4
    )
    print(f"f32 upload: mask shape {m_f32.array.shape}, "
          f"fg {int(m_f32.array.sum())}, {time.time() - t0:.1f}s (incl. compile)")

    m_bf16 = infer_volume_patched(
        src, apply_fn, patch, num_classes, hu_window=hu_window, batch_size=4,
        transfer_dtype="bfloat16",
    )
    agree_bf16 = float((m_bf16.array == m_f32.array).mean())
    print(f"bf16 upload: voxel agreement vs f32 = {agree_bf16:.5f}")

    m_u8 = infer_volume_patched(
        src, apply_fn, patch, num_classes, hu_window=hu_window, batch_size=4,
        transfer_dtype="uint8", pack_mask=True,
    )
    agree_u8 = float((m_u8.array == m_f32.array).mean())
    print(f"uint8 HU-coded upload: voxel agreement vs f32 = {agree_u8:.5f}")

    m_whole = infer_volume(
        src,
        lambda b: np.asarray(apply_fn(b)),
        new_size_xyz=(32, 32, 32),
        num_classes=num_classes,
    )
    assert m_whole.array.shape == src.array.shape
    print(f"whole-volume inference: mask shape {m_whole.array.shape}, "
          f"fg {int(m_whole.array.sum())}")

    assert agree_u8 > 0.999, agree_u8
    assert agree_bf16 > 0.99, agree_bf16
    assert m_f32.array.shape == vol_shape
    print("OK")


if __name__ == "__main__":
    main()
