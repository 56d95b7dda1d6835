"""Probe: space-to-depth PACKED conv rates — the XLA-native stem lever.

Idea (round 3): a k3s1 conv on (96^3, C16) is exactly expressible in the
space-to-depth domain as a k2s1 conv on (48^3, C=8*16=128) whose weight
tensor is 42% structurally dense (2^3 taps x 8 sub-positions, nonzero only
where the composite offset lies in [-1,1]).  Dense execution wastes
1024/432 = 2.37x FLOPs but swaps the N=Cout=16-lane-capped MXU shape
(measured ceiling ~24.6 TF/s, XLA at 21.6) for a C128-wide conv (measured
C64@48^3 at 88 TF/s, C256 at 120+).  If the k2/C128@48^3 rate R satisfies
R / 2.37 > 21.6, the stem stages win with NO custom kernel and NO layout
boundary (the whole net stays packed; k2s2 transitions become 1x1 convs).

This probe measures the packed-shape rates and prints the EFFECTIVE rate
(R / 2.37) to compare against the 21.6 TF/s bar.

Run on the TPU with an idle host.
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
DENSITY_WASTE = 1024.0 / 432.0  # dense k2*8delta taps vs true k3 taps


def conv_chain_rate(batch, res, cin, cout, k, chain, reps=5, label=""):
    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.normal(size=(batch, res, res, res, cin)) * 0.1)
        .astype(np.float32).astype(jnp.bfloat16)
    )
    ws = [
        jax.device_put(
            (rng.normal(size=(k, k, k, cin if i == 0 else cout, cout)) * 0.05)
            .astype(np.float32).astype(jnp.bfloat16)
        )
        for i in range(chain)
    ]

    @jax.jit
    def run(x, ws):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            x = (x * 0.05).astype(jnp.bfloat16)
        return x

    flops = 0.0
    for i in range(chain):
        ci = cin if i == 0 else cout
        flops += 2.0 * (k ** 3) * ci * cout * batch * res ** 3
    try:
        sync(run(x, ws))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {e}")
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x, ws))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    rate = flops / max(t - RPC_FLOOR, 1e-9) / 1e12
    print(f"{label}: wall {t*1e3:.1f} ms  {rate:.1f} TF/s  "
          f"effective-if-packed {rate / DENSITY_WASTE:.1f} TF/s")
    return rate


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    # the bar: XLA's fused conv+GN units at C16@96^3 b27 run 21.6 TF/s
    # packed twin of C16@96^3 b27: k2 C128@48^3 b27
    conv_chain_rate(27, 48, 128, 128, 2, 8, label="k2 C128@48^3 b27 (packed stem twin)")
    # packed twin of C32@48^3 b27: k2 C256@24^3 b27
    conv_chain_rate(27, 24, 256, 256, 2, 8, label="k2 C256@24^3 b27 (packed lvl2 twin)")
    # k3 comparisons at the same channel widths (is k2 lowered worse?)
    conv_chain_rate(27, 48, 128, 128, 3, 6, label="k3 C128@48^3 b27")
    conv_chain_rate(27, 24, 256, 256, 3, 6, label="k3 C256@24^3 b27")
    # unpacked baselines at bench batch
    conv_chain_rate(27, 96, 16, 16, 3, 6, label="k3 C16@96^3 b27 (unpacked stem)")
    conv_chain_rate(27, 48, 32, 32, 3, 6, label="k3 C32@48^3 b27 (unpacked lvl2)")
