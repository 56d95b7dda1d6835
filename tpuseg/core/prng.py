"""PRNG plumbing: cheap per-step key derivation without recompiles.

The reference relies on torch's global RNG for its everywhere-dropout
(p=0.2-0.5 inside every block, e.g. `/root/reference/networks/Unet2d.py:75`).
JAX needs explicit keys; deriving the per-step dropout key by folding the
step counter into a base key keeps the jitted train step signature static.
"""
from __future__ import annotations

import jax


def step_key(base: jax.Array, step) -> jax.Array:
    """Derive a per-step key from a base key and an int32 step (traced ok)."""
    return jax.random.fold_in(base, step)


def split_tree(key: jax.Array, names):
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
