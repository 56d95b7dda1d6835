"""Probe: does the v5e run int8 convs/matmuls at ~2x bf16 through XLA?

VERDICT r2 #2 groundwork: quantized inference is the one untouched
TPU-hardware lever (v5e MXU int8 peak ~394 TOP/s vs ~197 TF/s bf16).
Before building a quantized VNet path, measure what XLA actually delivers:

 1. matmul peak: 4096^2 chain, bf16 vs int8 (dot, preferred int32)
 2. conv3d chains at bench shapes: C16@96^3 b8 and C64@48^3 b8,
    bf16 vs int8 (conv_general_dilated on int8 operands -> int32,
    requantize between layers like a real quantized net would)

Timing: floor-swamped 12-16 op chains (every relay sync costs >=28 ms),
host-scalar-fetch sync, min over interleaved reps (pool drift is
one-sided; CLAUDE.md).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


RPC_FLOOR = 0.028


def timed(fn, args, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return ts


def matmul_probe(n=4096, chain=16, reps=5):
    rng = np.random.default_rng(0)
    a16 = jax.device_put(
        (rng.normal(size=(n, n)) * 0.05).astype(np.float32).astype(jnp.bfloat16)
    )
    b16 = jax.device_put(
        (rng.normal(size=(n, n)) * 0.05).astype(np.float32).astype(jnp.bfloat16)
    )
    a8 = jax.device_put(rng.integers(-127, 127, size=(n, n)).astype(np.int8))
    b8 = jax.device_put(rng.integers(-127, 127, size=(n, n)).astype(np.int8))

    @jax.jit
    def run_bf16(a, b):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            x = (x * 1e-3).astype(jnp.bfloat16)  # keep magnitudes sane
        return x

    @jax.jit
    def run_int8(a, b):
        x = a
        for _ in range(chain):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize: scale down + clip to int8 (what a real net pays)
            x = jnp.clip(y // 512, -127, 127).astype(jnp.int8)
        return x

    flops = 2.0 * n * n * n * chain
    out = {}
    for name, fn, args in (("bf16", run_bf16, (a16, b16)),
                           ("int8", run_int8, (a8, b8))):
        sync(fn(*args))
        ts = {}
        # interleave below instead
        out[name] = (fn, args)
    res = {}
    for _ in range(reps):
        for name, (fn, args) in out.items():
            t0 = time.perf_counter()
            sync(fn(*args))
            res.setdefault(name, []).append(time.perf_counter() - t0)
    for name, ts in res.items():
        t = min(ts)
        print(f"matmul {name}: wall {t*1e3:.1f} ms  "
              f"{flops / max(t - RPC_FLOOR, 1e-9) / 1e12:.1f} TOP/s "
              f"(floor-corrected)")


def conv_probe(batch, res, cin, cout, chain=12, reps=5):
    rng = np.random.default_rng(1)
    x16 = jax.device_put(
        (rng.normal(size=(batch, res, res, res, cin)) * 0.1)
        .astype(np.float32).astype(jnp.bfloat16)
    )
    w16 = [
        jax.device_put((rng.normal(size=(3, 3, 3, cin if i == 0 else cout, cout)) * 0.05)
                       .astype(np.float32).astype(jnp.bfloat16))
        for i in range(chain)
    ]
    x8 = jax.device_put(
        rng.integers(-127, 127, size=(batch, res, res, res, cin)).astype(np.int8)
    )
    w8 = [
        jax.device_put(rng.integers(-127, 127,
                                    size=(3, 3, 3, cin if i == 0 else cout, cout))
                       .astype(np.int8))
        for i in range(chain)
    ]

    dn = ("NDHWC", "DHWIO", "NDHWC")

    @jax.jit
    def run_bf16(x, ws):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16,
            )
            x = (x * 0.05).astype(jnp.bfloat16)
        return x

    @jax.jit
    def run_int8(x, ws):
        for w in ws:
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            x = jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
        return x

    flops = 0.0
    for i in range(chain):
        ci = cin if i == 0 else cout
        flops += 2.0 * 27 * ci * cout * batch * res ** 3

    fns = {"bf16": (run_bf16, (x16, w16)), "int8": (run_int8, (x8, w8))}
    res_t = {}
    for name, (fn, args) in fns.items():
        try:
            sync(fn(*args))
        except Exception as e:
            print(f"conv C{cin}->{cout}@{res} {name}: FAIL {type(e).__name__}: {e}")
            fns[name] = None
    for _ in range(reps):
        for name, v in fns.items():
            if v is None:
                continue
            fn, args = v
            t0 = time.perf_counter()
            sync(fn(*args))
            res_t.setdefault(name, []).append(time.perf_counter() - t0)
    for name, ts in res_t.items():
        t = min(ts)
        print(f"conv C{cin}->{cout}@{res}^3 b{batch} {name}: wall {t*1e3:.1f} ms  "
              f"{flops / max(t - RPC_FLOOR, 1e-9) / 1e12:.2f} TOP/s "
              f"(floor-corrected)")


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    matmul_probe()
    conv_probe(8, 96, 16, 16, chain=12)
    conv_probe(8, 48, 64, 64, chain=12)
    conv_probe(27, 96, 16, 16, chain=8)
