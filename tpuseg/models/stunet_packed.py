"""Space-to-depth packed execution of STUNet3d's full-resolution level.

STUNet3d (models/stunet3d.py, capability parity with
`/root/reference/networks/STUNet3d.py`) differs from the other packed
twins in two ways that need new weight transforms:

* its downsampling is a DUAL-PATH pair — a k3 stride-2 SAME conv plus a
  1x1 stride-2 VALID conv through a shared InstanceNorm — not the k2s2
  convs of UNet/VNet/ResUNet.  Consuming the packed level-0 tensor:
  - the k3s2 SAME conv becomes a k2 stride-1 conv with per-axis padding
    (0, 1) on the packed grid (`pack_k3s2_same_from_packed`): flax SAME
    for stride 2 on an even axis pads (0, 1), so fine output o reads
    fine taps 2o+s, s in {0,1,2}, i.e. packed cells o+t with
    s = 2t + delta (the (t=1, delta=1) pair falls outside the kernel).
  - the 1x1 stride-2 VALID conv reads only even fine positions — the
    delta-(0,0,0) block of the packed channels — so it is a 1x1 conv
    whose packed weight is zero outside that block
    (`pack_k1s2_from_packed`).
* its norm is InstanceNorm (flax GroupNorm(group_size=1)) + LeakyReLU:
  `in_packed`/`in_fine` compute the per-(sample, fine-channel) stats
  with the delta copies folded into the reduction, mirroring
  vnet_packed.gn_packed's treatment of GroupNorm(8).

The decoder's full-res entry is nearest-x2-upsample + 1x1: nearest
upsampling writes the SAME coarse value to all 8 deltas of a cell, so
conv1x1(nearest(x)) == delta-major channel-tile of conv1x1(x) — the
packed form runs the 1x1 at coarse resolution (8x fewer MACs) and
tiles.  Everything between the stem and the final stage stays in the
fine domain.

Same parameter pytree as the plain STUNet3d (checkpoints unchanged);
exact forward and grads — tests/test_stunet_packed.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.models.vnet_packed import (
    GN_EPS,
    _conv,
    block_diag_1x1_packed,
    conv_k4s2_fine2packed,
    channel_dropout,
    depth_to_space3d,
    pack_head_1x1,
    pack_k1_to_k2s2,
    pack_k3_to_k4s2,
    packed_k3_conv,
    packed_softmax,
    tile_channel_packed,
)
from tpuseg.nn.layers import upsample_nd


# ---------------------------------------------------------------------------
# weight transforms (trace-time, on params)
# ---------------------------------------------------------------------------


def pack_k3s2_same_from_packed(w):
    """Fine k3 stride-2 SAME conv (3,3,3,C,F) consuming PACKED input ->
    k2 stride-1 conv (2,2,2,8C,F); use with per-axis padding (0, 1).

    Tap map per axis: fine input 2o+s (s in {0,1,2}; flax SAME pads
    (0,1) for stride 2 on even sizes) lives at packed cell o+t, delta d
    with s = 2t + d; (t, d) = (1, 1) has no fine tap -> zero block."""
    _, _, _, c, f = w.shape
    w2 = jnp.zeros((2, 2, 2, 8 * c, f), w.dtype)
    for td in range(2):
        for th in range(2):
            for tw in range(2):
                for dd in range(2):
                    for dh in range(2):
                        for dw_ in range(2):
                            sd, sh, sw = 2 * td + dd, 2 * th + dh, 2 * tw + dw_
                            if sd > 2 or sh > 2 or sw > 2:
                                continue
                            dflat = (dd * 2 + dh) * 2 + dw_
                            w2 = w2.at[
                                td, th, tw,
                                dflat * c:(dflat + 1) * c, :,
                            ].set(w[sd, sh, sw])
    return w2


def pack_k1s2_from_packed(w1):
    """Fine 1x1 stride-2 VALID conv (1,1,1,C,F) consuming PACKED input:
    fine output o reads fine 2o == packed cell o, delta (0,0,0) — a 1x1
    conv on the delta-0 channel block."""
    c, f = w1.shape[-2:]
    w2 = jnp.zeros((1, 1, 1, 8 * c, f), w1.dtype)
    return w2.at[0, 0, 0, :c, :].set(w1[0, 0, 0])


# ---------------------------------------------------------------------------
# InstanceNorm (flax GroupNorm(group_size=1)) on fine / packed tensors
# ---------------------------------------------------------------------------


def in_fine(x, scale, bias):
    """flax-equivalent InstanceNorm: per-(sample, channel) stats over
    the spatial dims; fast-variance formula, stats promoted to >= f32."""
    n = x.shape[0]
    c = x.shape[-1]
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    g = x.reshape(n, -1, c).astype(stat_dt)
    mean = jnp.mean(g, axis=1, keepdims=True)
    mean2 = jnp.mean(g * g, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    y = ((g - mean) * inv).reshape(x.shape).astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def in_packed(x, scale, bias, p=8):
    """InstanceNorm on packed (N, D', H', W', p*F) == in_fine on the
    fine tensor: the p delta copies of a fine channel join its spatial
    reduction."""
    n = x.shape[0]
    f = x.shape[-1] // p
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    g = x.reshape(n, -1, p, f).astype(stat_dt)
    mean = jnp.mean(g, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(g * g, axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    y = ((g - mean) * inv).reshape(x.shape).astype(x.dtype)
    return y * tile_channel_packed(scale, p).astype(
        x.dtype
    ) + tile_channel_packed(bias, p).astype(x.dtype)


# ---------------------------------------------------------------------------
# fine-domain building blocks (raw-param mirrors of models/stunet3d.py)
# ---------------------------------------------------------------------------


def _luconv_in_fine(x, p, rate, rng):
    """_LUConvIN: k3 conv + bias -> InstanceNorm -> dropout -> leaky."""
    w = p["ConvND_0"]["Conv_0"]
    y = _conv(x, w["kernel"]) + w["bias"].astype(x.dtype)
    g = p["GroupNorm_0"]
    y = in_fine(y, g["scale"], g["bias"])
    y = channel_dropout(y, rate, rng, tile=1)
    return jax.nn.leaky_relu(y)


def _dualpath_fine(x, p, stride):
    """_DualPathDown in the fine domain: k3 SAME ∥ 1x1 VALID (stride s)
    through a SHARED InstanceNorm, leaky each, add, leaky."""
    g = p["GroupNorm_0"]
    wa = p["ConvND_0"]["Conv_0"]
    a = _conv(x, wa["kernel"], strides=(stride,) * 3)
    a = a + wa["bias"].astype(x.dtype)
    a = jax.nn.leaky_relu(in_fine(a, g["scale"], g["bias"]))
    wb = p["ConvND_1"]["Conv_0"]
    b = _conv(x, wb["kernel"], strides=(stride,) * 3, padding="VALID")
    b = b + wb["bias"].astype(x.dtype)
    b = jax.nn.leaky_relu(in_fine(b, g["scale"], g["bias"]))
    return jax.nn.leaky_relu(a + b)


# ---------------------------------------------------------------------------
# the forward
# ---------------------------------------------------------------------------


def packed_stunet3d_apply(params, x, *, num_classes: int,
                          features: int = 16, dropout: float = 0.2,
                          train: bool = False, rng=None,
                          return_packed: bool = False,
                          packed_layout: str = "delta"):
    """Exact STUNet3d forward with the full-res level executed packed.

    `params`: the PLAIN STUNet3d param pytree.  `x`: (N, D, H, W, Cin)
    with D/H/W divisible by 16 (4 stride-2 downsamples).  Returns
    (logits, probs) in the fine domain — or, with return_packed=True,
    in the packed (N, D/2, H/2, W/2, 8K) layout (delta- or class-major
    per packed_layout).
    """
    f = features
    rate = dropout if train else 0.0
    p = params["params"]

    rng_ctr = 0

    def take_rng():
        nonlocal rng_ctr
        if rate == 0.0 or rng is None:
            return None
        r = jax.random.fold_in(rng, rng_ctr)
        rng_ctr += 1
        return r

    # ---- stem _DualPathDown_0 (stride 1), packed ----
    d0 = p["_DualPathDown_0"]
    g0 = d0["GroupNorm_0"]
    wa = d0["ConvND_0"]["Conv_0"]
    a = conv_k4s2_fine2packed(x, pack_k3_to_k4s2(wa["kernel"]))
    a = a + tile_channel_packed(wa["bias"]).astype(x.dtype)
    a = jax.nn.leaky_relu(in_packed(a, g0["scale"], g0["bias"]))
    wb = d0["ConvND_1"]["Conv_0"]
    b = _conv(x, pack_k1_to_k2s2(wb["kernel"]), strides=(2, 2, 2),
              padding="VALID")
    b = b + tile_channel_packed(wb["bias"]).astype(x.dtype)
    b = jax.nn.leaky_relu(in_packed(b, g0["scale"], g0["bias"]))
    skip0p = jax.nn.leaky_relu(a + b)  # packed (N, D/2, H/2, W/2, 8f)

    # ---- _DualPathDown_1 (stride 2): packed input -> fine D/2 ----
    d1 = p["_DualPathDown_1"]
    g1 = d1["GroupNorm_0"]
    wa = d1["ConvND_0"]["Conv_0"]
    a = _conv(skip0p, pack_k3s2_same_from_packed(wa["kernel"]),
              padding=[(0, 1)] * 3)
    a = a + wa["bias"].astype(x.dtype)
    a = jax.nn.leaky_relu(in_fine(a, g1["scale"], g1["bias"]))
    wb = d1["ConvND_1"]["Conv_0"]
    b = _conv(skip0p, pack_k1s2_from_packed(wb["kernel"]), padding="VALID")
    b = b + wb["bias"].astype(x.dtype)
    b = jax.nn.leaky_relu(in_fine(b, g1["scale"], g1["bias"]))
    down = jax.nn.leaky_relu(a + b)  # fine (N, D/2, H/2, W/2, 2f)

    # ---- encoder levels 1-4, fine ----
    skips = []
    lu = 0
    cur_down = down
    for lvl in range(1, 5):
        if lvl > 1:
            cur_down = _dualpath_fine(cur, p[f"_DualPathDown_{lvl}"], 2)
        out = cur_down
        for _ in range(2):
            out = _luconv_in_fine(out, p[f"_LUConvIN_{lu}"], rate, take_rng())
            lu += 1
        cur = jax.nn.leaky_relu(out + cur_down)
        skips.append(cur)

    # ---- decoder, fine until the full-res stage ----
    conv_i = 0
    for n_convs, skip in ((3, skips[2]), (3, skips[1]), (2, skips[0])):
        up = upsample_nd(cur, 3, 2, "nearest")
        w = p[f"ConvND_{conv_i}"]["Conv_0"]
        conv_i += 1
        up = _conv(up, w["kernel"], padding="VALID") + w["bias"].astype(x.dtype)
        w = p[f"ConvND_{conv_i}"]["Conv_0"]
        conv_i += 1
        cat = _conv(jnp.concatenate([up, skip], -1), w["kernel"],
                    padding="VALID") + w["bias"].astype(x.dtype)
        out = cat
        for _ in range(n_convs):
            out = _luconv_in_fine(out, p[f"_LUConvIN_{lu}"], rate, take_rng())
            lu += 1
        cur = jax.nn.leaky_relu(out + cat)

    # ---- full-res decoder stage, packed ----
    # nearest x2 writes one coarse value to all 8 deltas, so the 1x1
    # runs at coarse resolution and the result channel-tiles to packed.
    w6 = p["ConvND_6"]["Conv_0"]
    upf = _conv(cur, w6["kernel"], padding="VALID") + w6["bias"].astype(x.dtype)
    up_p = jnp.tile(upf, (1, 1, 1, 1, 8))  # delta-major: channel d*f+c
    w7 = p["ConvND_7"]["Conv_0"]
    wk = w7["kernel"][0, 0, 0]  # (2f, f): rows [up; skip]
    wp7 = block_diag_1x1_packed(None, extra_in_blocks=(wk[:f], wk[f:]))
    cat_p = _conv(jnp.concatenate([up_p, skip0p], -1), wp7, padding="VALID")
    cat_p = cat_p + tile_channel_packed(w7["bias"]).astype(x.dtype)

    lu16 = p["_LUConvIN_16"]
    wl = lu16["ConvND_0"]["Conv_0"]
    out = packed_k3_conv((cat_p,), wl["kernel"], (True, True, True))
    out = out + tile_channel_packed(wl["bias"]).astype(x.dtype)
    gl = lu16["GroupNorm_0"]
    out = in_packed(out, gl["scale"], gl["bias"])
    out = channel_dropout(out, rate, take_rng(), tile=8)
    out = jax.nn.leaky_relu(out)
    cur_p = jax.nn.leaky_relu(out + cat_p)

    layout = packed_layout if return_packed else "delta"
    w8 = p["ConvND_8"]["Conv_0"]
    wp, bp = pack_head_1x1(w8["kernel"][0, 0, 0], w8["bias"], num_classes,
                           f, layout=layout)
    logitsp = _conv(cur_p, wp, padding="VALID") + bp.astype(x.dtype)
    probsp = packed_softmax(logitsp, num_classes, layout=layout)
    if return_packed:
        return logitsp, probsp
    return depth_to_space3d(logitsp), depth_to_space3d(probsp)
