"""Packed-stem UNet3d on z-SHARDED volumes — the packed x spatial
composition.

Composes the two training accelerators that were mutually exclusive
through round 4 (tasks/segmentation.py raised on packed_stem with
space>1): the space-to-depth packed execution of the finest level(s)
(models/unet_packed.py — 128 channels on the lanes where batch-1 C16
ops starve the MXU) and z-sharded spatial parallelism (parallel/
spatial.py — volumes too large for one chip's HBM, halo slabs over ICI).
The reference has neither (it downsamples to fit one GPU,
`/root/reference/dataprocess/data3dpreparewithSize.py:25-33`).

Runs INSIDE shard_map with the volume depth (axis 1 of (N, D, H, W, C))
sharded over ``axis_name``.  Exactly the math of
``packed_unet3d_apply`` (and therefore of the plain UNet(ndim=3)):

 * the fine->packed k4s2 stem conv (globally SAME with (1, 2) padding)
   exchanges a 2-slab fine halo and drops the leading slab, so each
   shard sees [1 left; 2 right] neighbour slabs — zero-filled at the
   global ends, which IS the SAME padding;
 * packed->packed coarse k3 convs exchange a 1-cell packed halo
   (z-VALID conv over the extended shard);
 * fine k3 convs at the unpacked levels exchange a 1-voxel halo
   (mirroring parallel/spatial.py SpatialConvND);
 * GroupNorm statistics are psum'd over ``axis_name``
   (fast-variance on global sums — SpatialGroupNorm's math in the
   packed channel layout);
 * maxpool (= channel max over deltas when packed; k2s2 windows aligned
   to even z when fine), k2s2 transpose convs, concat, 1x1 head and
   softmax are all shard-local — stride-2 windows never straddle an
   even-aligned shard boundary.

ChannelDropout masks depend only on (N, C) and the key, so every shard
draws the identical mask from the replicated key — the sharded step is
exact INCLUDING dropout (for data=1; with data>1 the caller folds the
data-shard index into the key, tasks/spatial.py module doc).

Requires local z (D / n_space) divisible by 2**levels, like
SpatialUNet3d.  Parameter tree is the PLAIN UNet(ndim=3) pytree —
train sharded+packed, infer anywhere.  Exactness: tests/
test_packed_spatial.py (fwd + grads vs the single-device packed apply
on an 8-virtual-device CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.models.unet_packed import _concat_perm
from tpuseg.models.vnet_packed import (
    GN_EPS,
    GROUPS,
    _conv,
    _conv_t,
    channel_dropout,
    depth_to_space3d,
    pack_head_1x1,
    pack_k3_axes,
    pack_k3_to_k4s2,
    pack_transpose_k2s2_to_1x1,
    packed_softmax,
    tile_channel_packed,
)
from tpuseg.parallel.spatial import halo_exchange_axis


# ---------------------------------------------------------------------------
# psum'd GroupNorm on fine / packed shards
# ---------------------------------------------------------------------------


def gn_fine_sp(x, scale, bias, axis_name):
    """gn_fine with the (sample, group) statistics psum'd over the space
    axis — exactly flax GroupNorm(8)'s fast-variance math on the full
    volume (cf. parallel/spatial.py SpatialGroupNorm)."""
    n = x.shape[0]
    c = x.shape[-1]
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    g = x.reshape(n, -1, GROUPS, c // GROUPS).astype(stat_dt)
    s = jax.lax.psum(jnp.sum(g, axis=(1, 3)), axis_name)  # (N, G)
    s2 = jax.lax.psum(jnp.sum(g * g, axis=(1, 3)), axis_name)
    cnt = jax.lax.psum(
        jnp.asarray(g.shape[1] * g.shape[3], stat_dt), axis_name
    )
    mean = s / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    y = (g - mean[:, None, :, None]) * inv[:, None, :, None]
    y = y.reshape(x.shape).astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def gn_packed_sp(x, scale, bias, axis_name, p=8):
    """gn_packed (GroupNorm(8) in the packed channel layout) with psum'd
    statistics: the p delta copies of a fine channel join its group's
    reduction, then the per-(sample, group) sums go global."""
    n = x.shape[0]
    f = x.shape[-1] // p
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    g = x.reshape(n, -1, p, GROUPS, f // GROUPS).astype(stat_dt)
    s = jax.lax.psum(jnp.sum(g, axis=(1, 2, 4)), axis_name)  # (N, G)
    s2 = jax.lax.psum(jnp.sum(g * g, axis=(1, 2, 4)), axis_name)
    cnt = jax.lax.psum(
        jnp.asarray(g.shape[1] * g.shape[2] * g.shape[4], stat_dt), axis_name
    )
    mean = s / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    y = (g - mean[:, None, None, :, None]) * inv[:, None, None, :, None]
    y = y.reshape(x.shape).astype(x.dtype)
    return y * tile_channel_packed(scale, p).astype(
        x.dtype
    ) + tile_channel_packed(bias, p).astype(x.dtype)


# ---------------------------------------------------------------------------
# halo'd convolutions (z = axis 1, sharded)
# ---------------------------------------------------------------------------


def _conv_fine_sp(x, w, axis_name):
    """Fine k3 SAME conv on a z-shard: 1-voxel zero-boundary halo, then
    z-VALID conv (the zero fill at the global line ends IS the SAME
    padding)."""
    xh = halo_exchange_axis(x, axis_name, 1, axis=1, boundary="zero")
    return _conv(xh, w, padding=[(0, 0), (1, 1), (1, 1)])


def _stem_conv_sp(x, w_fine, axis_name):
    """Fine->packed k4s2 entry on a z-shard.  Globally the packed stem is
    a k4 stride-2 conv with (1, 2) padding (pack_k3_to_k4s2); on a shard
    we exchange a 2-slab halo and drop the leading slab, giving exactly
    [1 left; 2 right] context with zero fill at the global ends."""
    xh = halo_exchange_axis(x, axis_name, 2, axis=1, boundary="zero")
    xh = jax.lax.slice_in_dim(xh, 1, xh.shape[1], axis=1)
    return _conv(
        xh, pack_k3_to_k4s2(w_fine), strides=(2, 2, 2),
        padding=[(0, 0), (1, 2), (1, 2)],
    )


def packed_k3_conv_sp(parts, w_fine, axis_name, in_perm=None):
    """packed_k3_conv (dense coarse k3, all axes packed) on a z-shard:
    1-cell packed halo on the sharded axis, z-VALID conv."""
    w3 = pack_k3_axes(w_fine, (True, True, True))
    if in_perm is not None:
        w3 = jnp.take(w3, in_perm, axis=3)
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    xh = halo_exchange_axis(x, axis_name, 1, axis=1, boundary="zero")
    return _conv(xh, w3, padding=[(0, 0), (1, 1), (1, 1)])


# ---------------------------------------------------------------------------
# blocks (sharded mirrors of models/unet_packed.py)
# ---------------------------------------------------------------------------


def _convblock_fine_sp(x, p, rate, rngs, axis_name):
    for i in range(2):
        w = p[f"ConvND_{i}"]["Conv_0"]["kernel"]
        x = _conv_fine_sp(x, w, axis_name)
        g = p[f"GroupNorm_{i}"]
        x = gn_fine_sp(x, g["scale"], g["bias"], axis_name)
        x = channel_dropout(x, rate, rngs[i], tile=1)
        x = jax.nn.relu(x)
    return x


def _convblock_packed_sp(x, p, rate, rngs, first_fine_input, axis_name):
    w0 = p["ConvND_0"]["Conv_0"]["kernel"]
    if first_fine_input:
        x = _stem_conv_sp(x, w0, axis_name)
    else:
        x = packed_k3_conv_sp((x,), w0, axis_name)
    g = p["GroupNorm_0"]
    x = gn_packed_sp(x, g["scale"], g["bias"], axis_name)
    x = channel_dropout(x, rate, rngs[0], tile=8)
    x = jax.nn.relu(x)

    w1 = p["ConvND_1"]["Conv_0"]["kernel"]
    x = packed_k3_conv_sp((x,), w1, axis_name)
    g = p["GroupNorm_1"]
    x = gn_packed_sp(x, g["scale"], g["bias"], axis_name)
    x = channel_dropout(x, rate, rngs[1], tile=8)
    return jax.nn.relu(x)


def _convblock_packed_concat_sp(up_p, skip_p, p, rate, rngs, f, axis_name):
    w0 = p["ConvND_0"]["Conv_0"]["kernel"]
    x = packed_k3_conv_sp(
        (up_p, skip_p), w0, axis_name,
        in_perm=jnp.asarray(_concat_perm(f)),
    )
    g = p["GroupNorm_0"]
    x = gn_packed_sp(x, g["scale"], g["bias"], axis_name)
    x = channel_dropout(x, rate, rngs[0], tile=8)
    x = jax.nn.relu(x)

    w1 = p["ConvND_1"]["Conv_0"]["kernel"]
    x = packed_k3_conv_sp((x,), w1, axis_name)
    g = p["GroupNorm_1"]
    x = gn_packed_sp(x, g["scale"], g["bias"], axis_name)
    x = channel_dropout(x, rate, rngs[1], tile=8)
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# the z-sharded packed forward
# ---------------------------------------------------------------------------


def packed_unet3d_apply_sp(params, x, *, axis_name, num_classes: int,
                           features: int = 16, levels: int = 4,
                           dropout: float = 0.2, train: bool = False,
                           rng=None, packed_levels: int = 1):
    """``packed_unet3d_apply`` on a z-shard inside shard_map.

    `x`: the LOCAL shard (N, D/n_space, H, W, Cin); local D divisible by
    2**levels, H/W by 2**levels.  Returns local fine-domain
    (logits, probs) — z-sharded like the input, ready for
    ``spatial_seg_loss``.  Same plain-UNet param pytree and the same
    dropout key schedule as the unsharded packed apply (exactness incl.
    dropout; tests/test_packed_spatial.py)."""
    if packed_levels not in (1, 2):
        raise ValueError(f"packed_levels must be 1 or 2, got {packed_levels}")
    if levels <= packed_levels:
        raise ValueError(
            f"packed execution needs at least one plain level below the "
            f"packed ones (levels={levels} <= packed_levels={packed_levels})"
        )
    f = features
    rate = dropout if train else 0.0

    rng_ctr = 0

    def take_rng():
        nonlocal rng_ctr
        if rate == 0.0 or rng is None:
            return None
        r = jax.random.fold_in(rng, rng_ctr)
        rng_ctr += 1
        return r

    p = params["params"]

    # ---- level 0 encoder, packed; pool == max over deltas (local) ----
    skip0p = _convblock_packed_sp(
        x, p["ConvBlock_0"], rate, (take_rng(), take_rng()),
        first_fine_input=True, axis_name=axis_name,
    )
    n, d2, h2, w2, _ = skip0p.shape
    y = jnp.max(skip0p.reshape(n, d2, h2, w2, 8, f), axis=-2)

    # ---- level 1 encoder: packed (packed_levels=2) or plain ----
    skip1p = None
    if packed_levels >= 2:
        skip1p = _convblock_packed_sp(
            y, p["ConvBlock_1"], rate, (take_rng(), take_rng()),
            first_fine_input=True, axis_name=axis_name,
        )
        n1, d4, h4, w4, _ = skip1p.shape
        y = jnp.max(skip1p.reshape(n1, d4, h4, w4, 8, 2 * f), axis=-2)

    # ---- remaining encoder levels + bottleneck, fine (halo convs) ----
    skips = []
    for lvl in range(packed_levels, levels):
        y = _convblock_fine_sp(
            y, p[f"ConvBlock_{lvl}"], rate, (take_rng(), take_rng()),
            axis_name,
        )
        skips.append(y)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
            "VALID",
        )
    y = _convblock_fine_sp(
        y, p[f"ConvBlock_{levels}"], rate, (take_rng(), take_rng()),
        axis_name,
    )

    # ---- decoder levels-1..packed_levels, fine ----
    for i, lvl in enumerate(reversed(range(packed_levels, levels))):
        t = p[f"ConvTransposeND_{i}"]["ConvTranspose_0"]
        y = _conv_t(y, t["kernel"]) + t["bias"].astype(y.dtype)
        y = jnp.concatenate([y, skips[lvl - packed_levels]], axis=-1)
        y = _convblock_fine_sp(
            y, p[f"ConvBlock_{levels + 1 + i}"], rate,
            (take_rng(), take_rng()), axis_name,
        )

    # ---- decoder level 1, packed (packed_levels=2) ----
    if packed_levels >= 2:
        i1 = levels - 1 - 1
        t = p[f"ConvTransposeND_{i1}"]["ConvTranspose_0"]
        upp1 = _conv(y, pack_transpose_k2s2_to_1x1(t["kernel"]),
                     padding="VALID")
        upp1 = upp1 + tile_channel_packed(t["bias"]).astype(y.dtype)
        y = _convblock_packed_concat_sp(
            upp1, skip1p, p[f"ConvBlock_{levels + 1 + i1}"], rate,
            (take_rng(), take_rng()), 2 * f, axis_name,
        )
        y = depth_to_space3d(y)

    # ---- decoder level 0, packed ----
    t = p[f"ConvTransposeND_{levels - 1}"]["ConvTranspose_0"]
    upp = _conv(y, pack_transpose_k2s2_to_1x1(t["kernel"]), padding="VALID")
    upp = upp + tile_channel_packed(t["bias"]).astype(y.dtype)
    outp = _convblock_packed_concat_sp(
        upp, skip0p, p[f"ConvBlock_{2 * levels}"], rate,
        (take_rng(), take_rng()), f, axis_name,
    )

    wh = p["OutputHead_0"]["ConvND_0"]["Conv_0"]
    wp, bp = pack_head_1x1(
        wh["kernel"][0, 0, 0], wh["bias"], num_classes, f, layout="delta"
    )
    logitsp = _conv(outp, wp, padding="VALID") + bp.astype(outp.dtype)
    probsp = packed_softmax(logitsp, num_classes, layout="delta")
    return depth_to_space3d(logitsp), depth_to_space3d(probsp)
