"""Profile the bench PRIMARY program end-to-end on device: u8-coded
volume -> dequant -> extract 27 patches -> packed fwd27 (class-major
head) -> packed scatter-merge -> packed argmax -> d2s -> bit-packed mask.

The r2 exec decomposition measured ~40 ms of non-forward exec
(extract/merge/argmax) before the packed rewrite; this names where the
non-fwd milliseconds are NOW, so the merge-side levers can be ranked.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/merge_profile.py
"""
import glob
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def main():
    import jax
    import jax.numpy as jnp
    from tpuseg.models.vnet import VNet
    from tpuseg.models.vnet_packed import packed_vnet3d_probs
    from tpuseg.infer.sliding_window import _sliding_window_jit, grid_positions
    from tpuseg.infer.volume import hu_code_volume

    PATCH = (96, 96, 96)
    VOL = (160, 160, 192)
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def apply_fn_packed(patches):
        return packed_vnet3d_probs(
            params, patches.astype(jnp.bfloat16), return_packed=True,
            packed_layout="class",
        ).astype(jnp.float32)

    rng0 = np.random.default_rng(0)
    hu = rng0.normal(0.0, 120.0, size=VOL)
    vol_hu = np.round(hu).astype(np.float32)
    codes, dq = hu_code_volume(vol_hu, 100.0, -100.0, "meanstd")
    dequant = jnp.asarray(np.asarray(dq, np.float32))
    padded = codes[..., None]
    positions = grid_positions(VOL, PATCH, 0.5)
    vol_dev = jax.device_put(jnp.asarray(padded))  # exclude upload from trace

    def run():
        _, mask = _sliding_window_jit(
            vol_dev, tuple(map(tuple, positions.tolist())), apply_fn_packed,
            PATCH, 27, 2, False, True, True, dequant, True, "class",
        )
        return int(np.asarray(mask)[:64].sum())

    t0 = time.perf_counter()
    run()
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    print(f"device-resident exec {(time.perf_counter()-t0)/3*1e3:.1f} ms/rep",
          flush=True)

    trace_dir = "/tmp/merge_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            run()

    from xplane_ops import parse

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    for plane, (durs, counts) in parse(pbs[-1]).items():
        if not durs or ("TPU" not in plane and "/device" not in plane.lower()):
            continue
        total = sum(durs.values())
        print(f"\n=== plane {plane} (total {total/1e9:.1f} ms / 3 reps)")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {d/1e9:8.2f} ms x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
