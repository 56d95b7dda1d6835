"""Cost the k3-conv execution options for the packed levels.

The r3 packed fwd27 profile (benchmarks/packed_profile.py) shows ~48 of
97 ms device time in 1/8-dense k3-coarse convs (8x FLOP redundancy from
full 2x2x2 space-to-depth packing).  Candidates per level:

  full8  : k3-coarse on (m^3, 8C)      — 8x redundant (current lv>=1)
  part4  : k3 on (2m, m, m, 4C)        — 4x redundant, z stays fine
  part2  : k3 on (2m, 2m, m, 2C)       — 2x redundant
  fine   : k3 on (8m^3..., C) fine     — 1x (lv0 baseline, lane-starved)

Each case is a CH-times-chained (k3 conv + GN + ReLU)x2 block inside ONE
jit (the >=28 ms relay sync floor must be swamped — CLAUDE.md), at both
hot shapes:
  A: 96^3-level C16 (fine 96^3 b27)  — the 16 ms LUConv96
  B: 48^3-level C32 (fine 48^3 b27)  — the 4x 8 ms LUConvs

The probe times semantically-equivalent dense stand-ins (real packers
exist only for full8); rates transfer because cost is set by shape +
density, not weight values.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/partial_pack_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

CH = 4  # chained block applications per jit call (8 convs)


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform)

    B = 27

    def gn_relu(x):
        n, d, h, w, c = x.shape
        mu = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        return jax.nn.relu((x - mu) * jax.lax.rsqrt(var + 1e-5))

    def make_case(shape, c, red):
        k1 = jnp.asarray(np.random.default_rng(0).normal(
            size=(3, 3, 3, c, c)) * (0.05 / np.sqrt(c)), jnp.bfloat16)
        k2 = jnp.asarray(np.random.default_rng(1).normal(
            size=(3, 3, 3, c, c)) * (0.05 / np.sqrt(c)), jnp.bfloat16)

        def block(x):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k1.shape, ("NDHWC", "DHWIO", "NDHWC"))
            y = jax.lax.conv_general_dilated(
                x, k1, (1, 1, 1), "SAME", dimension_numbers=dn)
            y = gn_relu(y).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1, 1), "SAME", dimension_numbers=dn)
            return gn_relu(y).astype(jnp.bfloat16)

        @jax.jit
        def chain(x):
            for _ in range(CH):
                x = block(x)
            return x

        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(B, *shape, c)) * 0.3,
            jnp.bfloat16,
        )
        return chain, x, red

    cases = {
        "A full8 (48^3,128)": make_case((48, 48, 48), 128, 8.0),
        "A part4 (96,48,48,64)": make_case((96, 48, 48), 64, 4.0),
        "A part2 (96,96,48,32)": make_case((96, 96, 48), 32, 2.0),
        "A fine  (96^3,16)": make_case((96, 96, 96), 16, 1.0),
        "B full8 (24^3,256)": make_case((24, 24, 24), 256, 8.0),
        "B part4 (48,24,24,128)": make_case((48, 24, 24), 128, 4.0),
        "B part2 (48,48,24,64)": make_case((48, 48, 24), 64, 2.0),
        "B fine  (48^3,32)": make_case((48, 48, 48), 32, 1.0),
    }

    # sync-floor measurement: identity jit on a tiny array
    tiny = jnp.zeros((8,), jnp.float32)
    ident = jax.jit(lambda t: t + 1.0)
    sync(ident(tiny))
    floors = []
    for _ in range(7):
        t0 = time.perf_counter()
        sync(ident(tiny))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"sync floor {floor*1e3:.1f} ms")

    for name, (fn, x, _) in cases.items():
        sync(fn(x))
        print("compiled", name, flush=True)

    reps = 5
    ts = {k: [] for k in cases}
    for _ in range(reps):
        for name, (fn, x, _) in cases.items():
            t0 = time.perf_counter()
            sync(fn(x))
            ts[name].append(time.perf_counter() - t0)

    print()
    for name, (fn, x, red) in cases.items():
        t = max(min(ts[name]) - floor, 1e-9) / CH  # per 2-conv block
        n, d, h, w, c = x.shape
        dense_flops = 2 * (2 * n * d * h * w * 27 * c * c)
        true_flops = dense_flops / red
        print(f"{name}: {t*1e3:7.2f} ms/block  raw {dense_flops/t/1e12:6.1f}"
              f" TF/s  true-equiv {true_flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
