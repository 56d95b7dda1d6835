"""int8 conv rates at the PACKED hot shapes (round-3 follow-up).

int8_probe.py closed XLA-int8 for the FINE-layout net shapes (C16@96^3
etc. all lose to bf16).  The packed execution changed the hot shapes to
dense C128/C256 convs — much closer to the clean-matmul regime where the
v5e's int8 MXU measured ~2x bf16 (476 TOP/s vs 231 TF/s).  This probe
asks whether XLA's int8 conv lowering wins at THOSE shapes:

  A  k3 (27,48,48,48,128)->(...,128)   — the full8 LUConv96 (16 ms in-net)
  B  k3 (27,48,24,24,128)->(...,128)   — the part4 level-B LUConvs
  C  k3 (27,24,24,24,64)->(...,64)     — fine level-C LUConvs
  D  k3 (27,12,12,12,256)->(...,256)   — deep level

Each is a 8-conv chain in one jit (sync floor >=28 ms — CLAUDE.md), bf16
vs int8 (int32 accum), floor-corrected, interleaved reps.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_packed_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np

CH = 8


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def make(shape, c, dtype):
        rng = np.random.default_rng(0)
        if dtype == "int8":
            k = jnp.asarray(
                rng.integers(-4, 5, size=(3, 3, 3, c, c)), jnp.int8)
            x = jnp.asarray(
                rng.integers(-4, 5, size=(27, *shape, c)), jnp.int8)

            def conv(x):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1, 1), "SAME",
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        x.shape, k.shape, dn),
                    preferred_element_type=jnp.int32)
                # requantize so the chain stays int8 (shift keeps it cheap)
                return (y >> 7).astype(jnp.int8)
        else:
            k = jnp.asarray(
                rng.normal(size=(3, 3, 3, c, c)) * (0.3 / np.sqrt(27 * c)),
                jnp.bfloat16)
            x = jnp.asarray(
                rng.normal(size=(27, *shape, c)) * 0.3, jnp.bfloat16)

            def conv(x):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1, 1), "SAME",
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        x.shape, k.shape, dn),
                    preferred_element_type=jnp.bfloat16)

        @jax.jit
        def chain(x):
            for _ in range(CH):
                x = conv(x)
            return x

        return chain, x

    shapes = {
        "A (48^3,128)": ((48, 48, 48), 128),
        "B (48,24,24,128)": ((48, 24, 24), 128),
        "C (24^3,64)": ((24, 24, 24), 64),
        "D (12^3,256)": ((12, 12, 12), 256),
    }
    cases = {}
    for nm, (shape, c) in shapes.items():
        for dt in ("bf16", "int8"):
            cases[f"{nm} {dt}"] = make(shape, c, dt) + (shape, c)

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

    for name, (fn, x, _, _) in cases.items():
        sync(fn(x))
        print("compiled", name, flush=True)

    ts = {k: [] for k in cases}
    for _ in range(5):
        for name, (fn, x, _, _) in cases.items():
            t0 = time.perf_counter()
            sync(fn(x))
            ts[name].append(time.perf_counter() - t0)

    print()
    for name, (fn, x, shape, c) in cases.items():
        t = max(min(ts[name]) - floor, 1e-9) / CH
        d, h, w = shape
        flops = 2 * 27 * d * h * w * 27 * c * c
        print(f"{name}: {t*1e3:7.2f} ms/conv  {flops/t/1e12:6.1f} T{'OP' if 'int8' in name else 'F'}/s")

    # -------- phase 2: IN-NET — packed VNet3d fwd27 bf16 vs W8A8 --------
    # (models/vnet_packed.py int8_packed_inference; per-channel weight
    # scales fold to consts, per-tensor dynamic activation scales)
    from tpuseg.models import vnet_packed as vp
    from tpuseg.models.vnet import VNet

    rng = np.random.default_rng(0)
    xb = jnp.asarray(
        rng.normal(size=(27, 96, 96, 96, 1)).astype(np.float32),
        jnp.bfloat16,
    )
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    params = model.init(jax.random.key(0), np.zeros((1, 32, 32, 32, 1), np.float32))

    fwd_bf16 = jax.jit(lambda v: vp.packed_vnet3d_probs(
        params, v, num_classes=2, return_packed=True))
    with vp.int8_packed_inference():
        fwd_int8 = jax.jit(lambda v: vp.packed_vnet3d_probs(
            params, v, num_classes=2, return_packed=True))

    p_ref = fwd_bf16(xb)
    p_q = fwd_int8(xb)
    agree = float(jnp.mean(
        (jnp.argmax(p_ref.reshape(*p_ref.shape[:4], 8, 2), -1)
         == jnp.argmax(p_q.reshape(*p_q.shape[:4], 8, 2), -1)
         ).astype(jnp.float32)))
    print(f"\nfwd27 argmax agreement int8 vs bf16: {agree:.5f}", flush=True)

    fs = {"bf16": [], "int8": []}
    for _ in range(6):
        for nm, fn in (("bf16", fwd_bf16), ("int8", fwd_int8)):
            t0 = time.perf_counter()
            sync(fn(xb))
            fs[nm].append(time.perf_counter() - t0)
    for nm, v in fs.items():
        print(f"fwd27 packed {nm}: min {min(v)*1e3:.1f} ms  "
              f"med {sorted(v)[len(v)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
