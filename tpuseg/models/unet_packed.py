"""Packed-stem UNet3d — space-to-depth training/inference forward.

The train secondary metric (UNet3d at the reference KiPA config
112x112x128, batch 1, f32 — `/root/reference/train.py:34` via
`modelUnet.py:879`) has the same finest-level pathology the packed VNet
fixed for inference, but worse: at batch 1 XLA cannot even pack (C,B)
onto the MXU/VPU lanes, so every level-0 op runs at C=16 of 128 lanes.

Fix: execute the level-0 encoder block, the level-0 decoder block and
the head in the space-to-depth domain (activations (N, D/2, H/2, W/2,
8*C) with 128 channels on the lanes), mapping the PLAIN UNet(ndim=3)
parameter pytree through compile-time weight transforms — training
state, checkpoints, torch import/export all unchanged, and gradients
flow back to the plain pytree exactly (the transforms are linear).

Measured (benchmarks/packed_train_probe.py, level-0 encoder block
fwd+bwd at the train shape): plain f32 69.8 ms -> packed 20.7 ms
(3.37x); the spatial maxpool (whose select-and-scatter backward was the
largest single op in the round-2 train-step profile) becomes a channel
max over the 8 deltas.

Weight-transform vocabulary shared with models/vnet_packed.py:
 * k3s1 SAME conv   == k4s2 conv, fine -> packed
 * k3s1 packed->packed == k3 coarse conv, 1/8-dense (64/27 FLOP waste
   at a ~3.3x better rate)
 * k2s2 transpose   == 1x1 conv, coarse -> packed
 * maxpool k2s2     == channelwise max over the 8 delta channels
 * GroupNorm / ChannelDropout / ReLU / concat / 1x1 head — exact in the
   packed channel layout (delta-major, f-minor)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.vnet_packed import (
    _conv,
    _conv_t,
    conv_k4s2_fine2packed,
    channel_dropout as _channel_dropout_impl,
    depth_to_space3d,
    gn_fine,
    gn_packed,
    pack_head_1x1,
    pack_k3_to_k4s2,
    pack_transpose_k2s2_to_1x1,
    packed_k3_conv,
    packed_softmax,
    tile_channel_packed,
)


def _concat_perm(f: int):
    """Input-channel permutation mapping pack_k3_to_k3_coarse's (delta, c)
    row order onto the packed-concat layout [(delta, up_f); (delta, skip_f)]
    for a fine concat of two f-channel tensors (c = up 0..f-1, skip f..2f-1)."""
    idx = np.empty((16 * f,), np.int32)
    for j in range(16 * f):
        if j < 8 * f:
            delta, c = j // f, j % f
        else:
            delta, c = (j - 8 * f) // f, f + (j - 8 * f) % f
        idx[j] = delta * 2 * f + c
    return idx


_channel_dropout = _channel_dropout_impl  # shared impl (vnet_packed.py)


def _convblock_fine(x, p, rate, rngs):
    for i in range(2):
        w = p[f"ConvND_{i}"]["Conv_0"]["kernel"]
        x = _conv(x, w)
        g = p[f"GroupNorm_{i}"]
        x = gn_fine(x, g["scale"], g["bias"])
        x = _channel_dropout(x, rate, rngs[i], tile=1)
        x = jax.nn.relu(x)
    return x


def _convblock_packed(x, p, rate, rngs, first_fine_input: bool):
    """ConvBlock with packed activations.  first_fine_input: x is still in
    the fine domain (level-0 encoder entry) -> the first conv is the
    fine->packed k4s2; otherwise both convs are packed->packed k3-coarse."""
    w0 = p["ConvND_0"]["Conv_0"]["kernel"]
    if first_fine_input:
        x = conv_k4s2_fine2packed(x, pack_k3_to_k4s2(w0))
    else:
        x = packed_k3_conv((x,), w0, (True, True, True))
    g = p["GroupNorm_0"]
    x = gn_packed(x, g["scale"], g["bias"])
    x = _channel_dropout(x, rate, rngs[0], tile=8)
    x = jax.nn.relu(x)

    w1 = p["ConvND_1"]["Conv_0"]["kernel"]
    x = packed_k3_conv((x,), w1, (True, True, True))
    g = p["GroupNorm_1"]
    x = gn_packed(x, g["scale"], g["bias"])
    x = _channel_dropout(x, rate, rngs[1], tile=8)
    return jax.nn.relu(x)


def _convblock_packed_concat(up_p, skip_p, p, rate, rngs, f: int):
    """Decoder level-0 block consuming the packed concat [up; skip]
    (each 8f channels): the first k3 conv's packed weight rows are
    permuted from (delta, c)-order to the concat layout at trace time."""
    w0 = p["ConvND_0"]["Conv_0"]["kernel"]  # (3,3,3, 2f, f)
    x = packed_k3_conv(
        (up_p, skip_p), w0, (True, True, True),
        in_perm=jnp.asarray(_concat_perm(f)),
    )
    g = p["GroupNorm_0"]
    x = gn_packed(x, g["scale"], g["bias"])
    x = _channel_dropout(x, rate, rngs[0], tile=8)
    x = jax.nn.relu(x)

    w1 = p["ConvND_1"]["Conv_0"]["kernel"]
    x = packed_k3_conv((x,), w1, (True, True, True))
    g = p["GroupNorm_1"]
    x = gn_packed(x, g["scale"], g["bias"])
    x = _channel_dropout(x, rate, rngs[1], tile=8)
    return jax.nn.relu(x)


def _head_packed(x, p, num_classes: int, f: int, layout: str = "delta"):
    """1x1 head on packed input: block-diagonal (8f -> 8K) weight."""
    wp, bp = pack_head_1x1(
        p["ConvND_0"]["Conv_0"]["kernel"][0, 0, 0],
        p["ConvND_0"]["Conv_0"]["bias"], num_classes, f, layout=layout,
    )
    logits = _conv(x, wp, padding="VALID")
    return logits + bp.astype(x.dtype)


# How many U-levels execute packed (1 = finest only; 2 also packs the
# level-1 encoder/decoder blocks as packed-of-(D/2) with 8*2f channels —
# NO new weight transforms: the encoder entry reuses the fine->packed
# k4s2 form on the pooled fine tensor, the decoder entry reuses the
# transpose->1x1 form, and the level-0 up-transition consumes a
# depth-to-space of the packed level-1 output).  Default chosen by
# measurement (BASELINE.md round-4 ledger).
UNET_PACKED_LEVELS_DEFAULT = 1


def packed_unet3d_apply(params, x, *, num_classes: int, features: int = 16,
                        levels: int = 4, dropout: float = 0.2,
                        train: bool = False, rng=None,
                        return_packed: bool = False,
                        packed_layout: str = "delta",
                        packed_levels: int | None = None):
    """Exact UNet(ndim=3) forward with the finest level(s) executed packed.

    `params`: the PLAIN UNet(ndim=3) param pytree (models/unet.py).
    `x`: (N, D, H, W, Cin), D/H/W divisible by 2**levels.  Returns
    (logits, probs) in the fine domain — or, with return_packed=True,
    in the packed (N, D/2, H/2, W/2, 8K) delta-major layout (losses and
    metrics that reduce over voxels are permutation-invariant, so
    training can stay packed end-to-end; see tasks/segmentation.py).

    Reference anchor: `/root/reference/networks/Unet3d.py` via
    `modelUnet.py:879` (trainprocess) — behavior matched through the
    plain flax model, see tests/test_unet_packed.py.
    """
    if packed_levels is None:
        packed_levels = UNET_PACKED_LEVELS_DEFAULT
    if packed_levels not in (1, 2):
        raise ValueError(f"packed_levels must be 1 or 2, got {packed_levels}")
    if levels <= packed_levels:
        raise ValueError(
            f"packed execution needs at least one plain level below the "
            f"packed ones (levels={levels} <= packed_levels={packed_levels})"
        )
    f = features
    rate = dropout if train else 0.0

    def take_rng():
        nonlocal rng_ctr
        if rate == 0.0 or rng is None:
            return None
        r = jax.random.fold_in(rng, rng_ctr)
        rng_ctr += 1
        return r

    rng_ctr = 0
    p = params["params"]

    # ---- level 0 encoder, packed; pool == max over deltas ----
    skip0p = _convblock_packed(
        x, p["ConvBlock_0"], rate, (take_rng(), take_rng()),
        first_fine_input=True,
    )
    n, d2, h2, w2, _ = skip0p.shape
    y = jnp.max(skip0p.reshape(n, d2, h2, w2, 8, f), axis=-2)

    # ---- level 1 encoder: packed (packed_levels=2) or plain ----
    skip1p = None
    if packed_levels >= 2:
        # y is the fine level-1 input: the block's first k3 conv doubles
        # as the fine->packed k4s2 entry, exactly like level 0.
        skip1p = _convblock_packed(
            y, p["ConvBlock_1"], rate, (take_rng(), take_rng()),
            first_fine_input=True,
        )
        n1, d4, h4, w4, _ = skip1p.shape
        y = jnp.max(skip1p.reshape(n1, d4, h4, w4, 8, 2 * f), axis=-2)

    # ---- remaining encoder levels + bottleneck, plain ----
    skips = []
    for lvl in range(packed_levels, levels):
        y = _convblock_fine(
            y, p[f"ConvBlock_{lvl}"], rate, (take_rng(), take_rng())
        )
        skips.append(y)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
            "VALID",
        )
    y = _convblock_fine(
        y, p[f"ConvBlock_{levels}"], rate, (take_rng(), take_rng())
    )

    # ---- decoder levels-1..packed_levels, plain ----
    for i, lvl in enumerate(reversed(range(packed_levels, levels))):
        t = p[f"ConvTransposeND_{i}"]["ConvTranspose_0"]
        y = _conv_t(y, t["kernel"]) + t["bias"].astype(y.dtype)
        y = jnp.concatenate([y, skips[lvl - packed_levels]], axis=-1)
        y = _convblock_fine(
            y, p[f"ConvBlock_{levels + 1 + i}"], rate,
            (take_rng(), take_rng()),
        )

    # ---- decoder level 1, packed (packed_levels=2) ----
    if packed_levels >= 2:
        i1 = levels - 1 - 1  # the transpose/ConvBlock index for level 1
        t = p[f"ConvTransposeND_{i1}"]["ConvTranspose_0"]
        upp1 = _conv(y, pack_transpose_k2s2_to_1x1(t["kernel"]),
                     padding="VALID")
        upp1 = upp1 + tile_channel_packed(t["bias"]).astype(y.dtype)
        y = _convblock_packed_concat(
            upp1, skip1p, p[f"ConvBlock_{levels + 1 + i1}"], rate,
            (take_rng(), take_rng()), 2 * f,
        )
        # packed-of-(D/2) at the D/4 grid -> fine level-1 layout for the
        # level-0 up-transition (one full-width copy pass)
        y = depth_to_space3d(y)

    # ---- decoder level 0, packed ----
    t = p[f"ConvTransposeND_{levels - 1}"]["ConvTranspose_0"]
    upp = _conv(y, pack_transpose_k2s2_to_1x1(t["kernel"]), padding="VALID")
    upp = upp + tile_channel_packed(t["bias"]).astype(y.dtype)
    outp = _convblock_packed_concat(
        upp, skip0p, p[f"ConvBlock_{2 * levels}"], rate,
        (take_rng(), take_rng()), f,
    )

    layout = packed_layout if return_packed else "delta"
    logitsp = _head_packed(outp, p["OutputHead_0"], num_classes, f,
                           layout=layout)
    probsp = packed_softmax(logitsp, num_classes, layout=layout)
    if return_packed:
        return logitsp, probsp
    return depth_to_space3d(logitsp), depth_to_space3d(probsp)


def space_to_depth_labels(labels):
    """(N, D, H, W) int labels -> (N, D/2, H/2, W/2, 8) delta-major — the
    label-side twin of the packed logits layout.  Voxel-reduction losses
    (CE/dice/focal/tversky/...) are permutation-invariant over voxels, so
    loss(packed_logits reshaped to (N, S*8, K), packed_labels reshaped to
    (N, S*8)) == loss(fine_logits, fine_labels) exactly."""
    n, d, h, w = labels.shape
    y = labels.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6)
    return y.reshape(n, d // 2, h // 2, w // 2, 8)
