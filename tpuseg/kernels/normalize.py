"""Device-side intensity normalization (jit-able).

`percentile_zscore_device` reproduces the host pipeline's
percentile-clipped nonzero z-score (`dataprocess/utils.py:182` normalize,
tpuseg.data.normalize.percentile_zscore) with static shapes: nonzero
values are sorted to the front by mapping zeros to +inf, percentile
positions are gathered at traced indices, and the final statistics use
masked sums — the whole thing fuses into the inference program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def percentile_zscore_device(x, lower: float = 5.0, upper: float = 95.0):
    """x: any-shape float array → same shape, float32."""
    x = x.astype(jnp.float32)
    flat = x.reshape(-1)
    nz_mask = flat != 0
    n_nz = jnp.sum(nz_mask)
    # sort with zeros pushed to the end: nonzero values occupy [0, n_nz)
    sort_key = jnp.where(nz_mask, flat, jnp.inf)
    s = jnp.sort(sort_key)

    def pct(p):
        pos = p / 100.0 * jnp.maximum(n_nz - 1, 0).astype(jnp.float32)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, jnp.maximum(n_nz - 1, 0)).astype(jnp.int32)
        frac = pos - lo
        return s[lo] * (1 - frac) + s[hi] * frac

    lo_v, hi_v = pct(lower), pct(upper)
    clipped = jnp.clip(x, lo_v, hi_v)
    cmask = clipped != 0
    cnt = jnp.maximum(jnp.sum(cmask), 1)
    mean = jnp.sum(jnp.where(cmask, clipped, 0.0)) / cnt
    var = jnp.sum(jnp.where(cmask, (clipped - mean) ** 2, 0.0)) / cnt
    std = jnp.where(var > 0, jnp.sqrt(var), 1.0)
    out = (clipped - mean) / std
    # empty nonzero set → identity (host behavior)
    return jnp.where(n_nz > 0, out, x)


def truncate_and_normalize_device(x, upper: float, lower: float,
                                  method: str = "meanstd"):
    """Device twin of data.normalize.truncate_and_normalize (HU window)."""
    x = jnp.clip(x.astype(jnp.float32), min(lower, upper), max(lower, upper))
    if method == "maxmin":
        rng = jnp.maximum(jnp.max(x) - jnp.min(x), 1e-12)
        return (x - jnp.min(x)) / rng
    std = jnp.std(x)
    return (x - jnp.mean(x)) / jnp.where(std > 0, std, 1.0)
