"""Partial-packing probe, v2: use the REAL in-net block structure.

partial_pack_probe.py's dense stand-ins did NOT reproduce the in-net
rates (full8 level-B measured 69.6 TF/s raw there vs 164 TF/s in the
actual packed fwd27 profile — instance-norm + isolated-chain layouts
differ from the gn_packed fusion XLA builds in the net), so its
part2-beats-full8 conclusion is unusable.  This probe rebuilds the
EXACT packed LUConv block (pack_k3_to_k3_coarse weights via a per-axis
generalization, gn_packed group statistics over (space, delta,
group-channels), bf16, bias, relu) for every per-axis packing choice:

  full8 : pack (D,H,W)   — P=8, 8x redundant  (current implementation)
  part4 : pack (H,W)     — P=4, 4x redundant
  part2 : pack (W)       — P=2, 2x redundant
  fine  : no packing     — P=1 (the lane-starved baseline)

at the two hot levels of the packed VNet3d fwd27 program:
  A: 96^3-scale C16 level (the 16 ms LUConv96 fusion)
  B: 48^3-scale C32 level (the 4x 8 ms LUConv fusions)

Validity gate: the full8 rows must reproduce the in-net per-block
times (~2x16.1 ms at A, ~2x8.1 ms at B) — if they do, the relative
part4/part2 numbers are decision-grade.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/partial_pack_probe2.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

CH = 4  # chained 2-conv blocks per jit call (8 convs) — swamp the sync floor
GROUPS = 8
GN_EPS = 1e-6


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def axis_select_packed():
    """A[u, din, dout, t] = 1 iff fine tap t = 2(u-1)+din-dout+1 in [0,3)."""
    a = np.zeros((3, 2, 2, 3), np.float32)
    for u in range(3):
        for din in range(2):
            for dout in range(2):
                t = 2 * (u - 1) + din - dout + 1
                if 0 <= t < 3:
                    a[u, din, dout, t] = 1.0
    return a


def axis_select_fine():
    """Identity: coarse tap u == fine tap t, no sub-position split."""
    a = np.zeros((3, 1, 1, 3), np.float32)
    for u in range(3):
        a[u, 0, 0, u] = 1.0
    return a


def pack_k3_axes(w, packed_axes):
    """(3,3,3,C,F) -> k3 conv on the per-axis-packed grid.

    packed_axes: bool triple (pack_d, pack_h, pack_w).  Output kernel
    (3,3,3, P*C, P*F) with P = 2**sum(packed_axes); delta-major,
    f-minor channel order with axis deltas composed d-major (matching
    nn/layers.py space_to_depth restricted to the packed axes)."""
    import jax.numpy as jnp
    sel = [axis_select_packed() if p else axis_select_fine()
           for p in packed_axes]
    a0, a1, a2 = (jnp.asarray(s, w.dtype) for s in sel)
    c, f = w.shape[-2:]
    w3 = jnp.einsum("aAdt,bBeu,cCgv,tuvxy->abcABCxdegy", a0, a1, a2, w)
    p = int(np.prod([s.shape[1] for s in sel]))
    return w3.reshape(3, 3, 3, p * c, p * f)


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform)
    B = 27

    def make_case(fine_shape, c, packed_axes):
        p = int(np.prod([2 if x else 1 for x in packed_axes]))
        shape = tuple(s // 2 if x else s
                      for s, x in zip(fine_shape, packed_axes))
        rng = np.random.default_rng(0)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * (0.3 / np.sqrt(27 * c)),
                         jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * (0.3 / np.sqrt(27 * c)),
                         jnp.float32)
        k1 = pack_k3_axes(w1, packed_axes).astype(jnp.bfloat16)
        k2 = pack_k3_axes(w2, packed_axes).astype(jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def gn_packed(x):
            # EXACT tpuseg.models.vnet_packed.gn_packed semantics, tile=p
            n = x.shape[0]
            f = x.shape[-1] // p
            g = x.reshape(n, -1, p, GROUPS, f // GROUPS).astype(jnp.float32)
            mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
            mean2 = jnp.mean(g * g, axis=(1, 2, 4), keepdims=True)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            y = (g - mean) * jax.lax.rsqrt(var + GN_EPS)
            y = y.reshape(x.shape).astype(x.dtype)
            return y * jnp.tile(scale, p).astype(x.dtype) + jnp.tile(
                bias, p).astype(x.dtype)

        dn = ("NDHWC", "DHWIO", "NDHWC")

        def block(x):
            y = jax.lax.conv_general_dilated(
                x, k1, (1, 1, 1), "SAME",
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, k1.shape, dn),
                preferred_element_type=x.dtype)
            y = jax.nn.relu(gn_packed(y))
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1, 1), "SAME",
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    y.shape, k2.shape, dn),
                preferred_element_type=y.dtype)
            return jax.nn.relu(gn_packed(y))

        @jax.jit
        def chain(x):
            for _ in range(CH):
                x = block(x)
            return x

        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(B, *shape, p * c)) * 0.3,
            jnp.bfloat16)
        return chain, x, float(p)

    cases = {
        "A full8": make_case((96, 96, 96), 16, (True, True, True)),
        "A part4": make_case((96, 96, 96), 16, (False, True, True)),
        "A part2": make_case((96, 96, 96), 16, (False, False, True)),
        "A fine ": make_case((96, 96, 96), 16, (False, False, False)),
        "B full8": make_case((48, 48, 48), 32, (True, True, True)),
        "B part4": make_case((48, 48, 48), 32, (False, True, True)),
        "B part2": make_case((48, 48, 48), 32, (False, False, True)),
        "B fine ": make_case((48, 48, 48), 32, (False, False, False)),
    }

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
        n, d, h, w, cp = x.shape
        dense_flops = 2 * (2 * n * d * h * w * 27 * cp * cp)
        true_flops = dense_flops / red
        print(f"{name}: {t*1e3:7.2f} ms/block  raw {dense_flops/t/1e12:6.1f}"
              f" TF/s  true-equiv {true_flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
