"""Resume the config-4 trained-dice eval from its saved checkpoint.

The round-5 bench_configs config4 run trained to completion (12 epochs,
val dice 0.80665, /tmp/cfg4.log) but the session died before the
packed-vs-plain eval phase.  The run dir (best/ checkpoint) and the
seed-deterministic synthetic data (tubes3d seed 6/7) let us finish the
eval without retraining: this reloads the best checkpoint through the
same compat entry (`BinaryVNet3dModel(inference=True, model_path=...)`)
and runs exactly the config4 eval block (whole-volume f32 forward, plain
vs packed `_probs_apply` dispatch).

Usage: python benchmarks/cfg4_resume_eval.py <run_dir> [--cpu]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
if "--cpu" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bench_configs import dice_of, tubes3d  # noqa: E402


def main(run_dir):
    import jax.numpy as jnp

    from tpuseg.compat import BinaryVNet3dModel

    shape = (64, 64, 64)
    vv, vm = tubes3d(4, shape, 7)  # same seed as bench_configs.config4

    m = BinaryVNet3dModel(64, 64, 64, 1, 1, 2, "BinaryClDiceLoss",
                          inference=True, model_path=run_dir)

    prev = m.packed_inference
    try:
        m.packed_inference = False
        fn_plain, jf_plain, got_plain = m._probs_apply(shape)
        m.packed_inference = True
        fn_packed, jf_packed, got_packed = m._probs_apply(shape)
    finally:
        m.packed_inference = prev
    assert not got_plain and got_packed, (got_plain, got_packed)
    d_plain, d_packed, agree = [], [], []
    for v_, g_ in zip(vv, vm):
        x = jnp.asarray(np.asarray(v_, np.float32)[None, ..., None])
        mk_pl = (np.asarray(jf_plain(x))[0, ..., 0] > 0.5).astype(np.uint8)
        mk_pk = (np.asarray(jf_packed(x))[0, ..., 0] > 0.5).astype(np.uint8)
        d_plain.append(dice_of(mk_pl, g_))
        d_packed.append(dice_of(mk_pk, g_))
        agree.append(float((mk_pl == mk_pk).mean()))
    out = {
        "config": 4,
        "resumed_from": run_dir,
        "val_dice": 0.80665,  # final epoch, /tmp/cfg4.log (train completed)
        "trained_dice_plain_f32": float(np.mean(d_plain)),
        "trained_dice_packed_f32": float(np.mean(d_packed)),
        "trained_dice_packed_minus_plain": float(
            np.mean(d_packed) - np.mean(d_plain)),
        "trained_packed_vs_plain_voxel_agreement": float(np.mean(agree)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    main(args[0] if args else "/tmp/tpuseg_cfgbench_r864_ijk/c4run")
