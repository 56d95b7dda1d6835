"""Spatial partitioning of 3D volumes over the mesh ``space`` axis.

The conv-net analog of sequence/context parallelism (SURVEY.md §2.3/§5):
volumes too large for one chip's HBM are sharded along depth (z), with
halo slabs exchanged between neighbouring devices over ICI
(`jax.lax.ppermute` inside `shard_map`).  The reference has no equivalent
— it downsamples (`dataprocess/data3dpreparewithSize.py:25-33`) or runs
serial patches (`modelUnet.py:707-763`).

Two layers of API:

 * ``halo_exchange(x, axis_name, halo, boundary)`` — the primitive:
   append the neighbour's boundary slab on each side of the sharded
   leading axis.  At the global ends of the device line the halo is
   zero-filled (``boundary="zero"``, matching SAME-conv zero padding) or
   edge-replicated (``boundary="replicate"``).  Building block for
   layer-by-layer spatially-partitioned convolutions.
 * ``spatial_partition_infer`` — overlap-tile decomposition of a whole
   fully-convolutional forward: each device gets its z-shard plus a
   ``margin`` halo, runs the network locally with replicated params,
   crops the margin, and the shards are reassembled.  *Interior* shard
   boundaries are exact when ``margin`` covers the network's
   receptive-field radius.  At the global volume ends a single SAME conv
   layer is also exact with ``boundary="zero"``; deeper stacks see a
   slightly different boundary condition there (each layer of the
   unpartitioned net re-pads zeros, the tile sees convolved halo values)
   — an overlap-tile approximation confined to the receptive field of
   the outermost ``margin`` voxels.  Use per-layer halo convs
   (``HaloConvND``) for bit-exact distributed forward/backward.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpuseg.core.mesh import SPACE_AXIS


def halo_exchange(x, axis_name: str, halo: int, boundary: str = "zero"):
    """Inside shard_map: pad the sharded leading axis of `x` with `halo`
    slabs from the previous/next device on `axis_name`.

    At the ends of the device line the halo is filled per `boundary`:
    ``"zero"`` (matches an unpartitioned SAME conv's zero padding) or
    ``"replicate"`` (edge replicate, for resampling-style ops)."""
    assert boundary in ("zero", "replicate"), boundary
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # slab I send right = my last `halo`; slab I send left = my first `halo`
    send_right = x[-halo:]
    send_left = x[:halo]
    # receive from left neighbor (i-1 -> i) and right neighbor (i+1 -> i)
    from_left = jax.lax.ppermute(
        send_right, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        send_left, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # global line ends: zero-fill or replicate own edge instead of wrap-around
    if boundary == "zero":
        end_left = jnp.zeros_like(from_left)
        end_right = jnp.zeros_like(from_right)
    else:
        end_left = jnp.broadcast_to(x[:1], from_left.shape)
        end_right = jnp.broadcast_to(x[-1:], from_right.shape)
    from_left = jnp.where(idx == 0, end_left, from_left)
    from_right = jnp.where(idx == n - 1, end_right, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def spatial_partition_infer(
    volume: np.ndarray,  # (D, H, W, C), D divisible by n_space
    apply_fn: Callable,  # (d, H, W, C) -> (d, H, W, K) local forward
    mesh: Mesh,
    margin: int = 16,
    boundary: str = "zero",
):
    """Run `apply_fn` over z-shards of `volume` with `margin`-voxel halos.

    `apply_fn` sees (shard_d + 2*margin, H, W, C) and must return the same
    leading extent (fully convolutional, SAME padding); the margin is
    cropped after the call.  Interior shard seams are exact for margin ≥
    receptive-field radius; see the module docstring for the global-end
    boundary condition.
    """
    n_space = mesh.shape[SPACE_AXIS]
    d = volume.shape[0]
    assert d % n_space == 0, (d, n_space)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(SPACE_AXIS, None, None, None),
        out_specs=P(SPACE_AXIS, None, None, None),
        check_vma=False,
    )
    def run(vol_shard):
        padded = halo_exchange(vol_shard, SPACE_AXIS, margin, boundary)
        out = apply_fn(padded)
        return out[margin:-margin]

    vol = jnp.asarray(volume)
    vol = jax.device_put(vol, NamedSharding(mesh, P(SPACE_AXIS, None, None, None)))
    return run(vol)
