"""D-split batching pre-test for whole-volume inference.

Whole-volume (b1) conv+GN units pack the MXU/VPU lanes with B*Cout=16 of
128; batched patch tiles measured 1.7x more voxel-efficient, but
quality-margin overlap (32 vox) cancels the win.  This probe tests the
EXACT alternative: split D into B' chunks with CONV halos only (1 voxel
per conv), run convs valid-in-D on the batch, and compute GN stats
globally across chunks (bitwise-equivalent semantics to the b1 form).

Pattern: conv3(SAME) -> GN(8) -> ReLU, twice (the InputTransition-ish
stem), on (1,160,160,192,16) bf16 vs the 8-chunk D-split formulation.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))


D, H, W, C = 160, 160, 192, 16
G = 8
NCHUNK = 8
CD = D // NCHUNK  # 20
NCONV = 2  # convs per fused segment -> halo width per side


def init_weights(key):
    ks = jax.random.split(key, 2 * NCONV)
    ws, scales, biases = [], [], []
    for i in range(NCONV):
        w = jax.random.normal(ks[2 * i], (3, 3, 3, C, C), jnp.float32) * 0.05
        ws.append(w.astype(jnp.bfloat16))
        scales.append(jnp.ones((C,), jnp.float32))
        biases.append(jnp.zeros((C,), jnp.float32))
    return ws, scales, biases


def gn_apply(x, mean, rstd, scale, bias):
    # stats are GLOBAL over the sample: broadcast over the chunk batch
    mean_c = jnp.repeat(mean, C // G, axis=-1).reshape(1, 1, 1, 1, C)
    rstd_c = jnp.repeat(rstd, C // G, axis=-1).reshape(1, 1, 1, 1, C)
    return (x.astype(jnp.float32) - mean_c) * rstd_c * scale + bias


def stats_of(x, n_valid):
    """Per-(sample, group) mean/rstd; reduces over batch-chunk axis too
    (the chunks are ONE sample).  x f32-convertible, n_valid = D*H*W*C/G."""
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=tuple(range(0, x.ndim - 1)))  # (C,)
    ss = jnp.sum(jnp.square(xf), axis=tuple(range(0, x.ndim - 1)))
    gs = s.reshape(G, C // G).sum(-1)
    gss = ss.reshape(G, C // G).sum(-1)
    mean = gs / n_valid
    var = gss / n_valid - jnp.square(mean)
    return mean[None], jax.lax.rsqrt(var + 1e-6)[None]


@jax.jit
def plain(ws, scales, biases, x):
    # reference b1 whole-volume: SAME convs + flax GN
    for i in range(NCONV):
        x = jax.lax.conv_general_dilated(
            x, ws[i], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        mean, rstd = stats_of(x[0], float(D * H * W * C // G))
        x = nn.relu(gn_apply(x, mean, rstd, scales[i], biases[i])).astype(jnp.bfloat16)
    return x


@jax.jit
def dsplit(ws, scales, biases, x):
    """Exact D-split: pad D by NCONV (the halo for NCONV chained convs),
    extract NCHUNK overlapping chunks of CD+2*NCONV, run convs VALID in D
    (SAME in H/W), shrinking the halo by 1 per conv; GN stats from the
    valid interiors only."""
    halo = NCONV
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0), (0, 0)))
    chunks = jnp.stack(
        [
            jax.lax.dynamic_slice(
                xp[0], (i * CD, 0, 0, 0), (CD + 2 * halo, H, W, C)
            )
            for i in range(NCHUNK)
        ]
    )  # (NCHUNK, CD+2*halo, H, W, C)
    h = halo
    for i in range(NCONV):
        chunks = jax.lax.conv_general_dilated(
            chunks, ws[i], (1, 1, 1),
            [(0, 0), (1, 1), (1, 1)],  # VALID in D, SAME in H/W
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        h -= 1
        valid = chunks[:, h : h + CD] if h else chunks
        mean, rstd = stats_of(valid, float(D * H * W * C // G))
        chunks = nn.relu(
            gn_apply(chunks, mean, rstd, scales[i], biases[i])
        ).astype(jnp.bfloat16)
    out = chunks  # h == 0: all slices valid
    return out.reshape(1, D, H, W, C)


def main():
    ws, scales, biases = init_weights(jax.random.key(0))
    x = jax.device_put(
        (jax.random.normal(jax.random.key(1), (1, D, H, W, C)) * 0.5).astype(
            jnp.bfloat16
        )
    )
    sync(x)
    a = plain(ws, scales, biases, x)
    b = dsplit(ws, scales, biases, x)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print("max |plain - dsplit|:", diff, flush=True)
    del a, b

    fns = {"plain_b1": lambda: sync(plain(ws, scales, biases, x)),
           "dsplit_b8": lambda: sync(dsplit(ws, scales, biases, x))}
    times = {k: [] for k in fns}
    for _ in range(7):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            fn()
            times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        ts = np.array(v) * 1e3
        print(f"{k} (conv3+GN+relu x{NCONV} @ 160x160x192 C16): "
              f"median {np.median(ts):.1f} ms  min {ts.min():.1f}", flush=True)
    print("DSPLIT PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
