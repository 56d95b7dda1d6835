"""Space-to-depth packed execution of ResUNet3d's finest level.

The round-4 skip rationale assumed ResUNet3d needed a new k3s2-VALID
packed transform and trilinear full-res heads — but the tpuseg model
(models/resunet3d.py, the reference-defect-corrected geometry of
`/root/reference/networks/ResUnet3d.py:110-141`) downsamples with k2s2
VALID convs, upsamples with transpose-k2s2, and its heads are 1x1: every
weight transform it needs already exists in vnet_packed/unet_packed.
This twin executes the full-resolution level packed (the level-0
ConvBlock, the first downsample consumed as a 1x1 on the packed tensor,
the last upsample producing packed channels, the level-0 decoder block +
residual, and the 1x1 head), with the aux deep-supervision heads and all
coarser levels in the plain fine domain.

Same parameter pytree as the plain ResUNet3d (checkpoints unchanged);
exact forward and grads — tests/test_resunet_packed.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.models.unet_packed import (
    _convblock_fine,
    _convblock_packed,
    _convblock_packed_concat,
)
from tpuseg.models.vnet_packed import (
    _conv,
    _conv_t,
    channel_dropout,
    depth_to_space3d,
    gn_fine,
    gn_packed,
    pack_down_k2s2_to_1x1,
    pack_head_1x1,
    pack_transpose_k2s2_to_1x1,
    packed_softmax,
    tile_channel_packed,
)
from tpuseg.nn.layers import upsample_nd


def _down_fine(x, p, rate, rng):
    """_DownSample in the fine domain: k2s2 VALID conv + GN + drop + relu."""
    w = p["ConvND_0"]["Conv_0"]["kernel"]
    x = _conv(x, w, strides=(2, 2, 2), padding="VALID")
    g = p["GroupNorm_0"]
    x = gn_fine(x, g["scale"], g["bias"])
    x = channel_dropout(x, rate, rng, tile=1)
    return jax.nn.relu(x)


def _up_fine(x, p, rate, rng):
    """_UpSample in the fine domain: transpose-k2s2 + GN + drop + relu."""
    w = p["ConvTransposeND_0"]["ConvTranspose_0"]["kernel"]
    x = _conv_t(x, w)
    g = p["GroupNorm_0"]
    x = gn_fine(x, g["scale"], g["bias"])
    x = channel_dropout(x, rate, rng, tile=1)
    return jax.nn.relu(x)


def _aux_head(x, p, scale):
    """1x1 conv (no bias) + trilinear upsample — resunet3d._Head."""
    w = p["ConvND_0"]["Conv_0"]["kernel"]
    x = _conv(x, w, padding="VALID")
    if scale > 1:
        x = upsample_nd(x, 3, scale, "linear")
    return x


def packed_resunet3d_apply(params, x, *, num_classes: int,
                           features: int = 16, dropout: float = 0.2,
                           train: bool = False, rng=None,
                           return_packed: bool = False,
                           packed_layout: str = "delta"):
    """Exact ResUNet3d forward with the full-res level executed packed.

    `params`: the PLAIN ResUNet3d param pytree.  `x`: (N, D, H, W, Cin)
    with D/H/W divisible by 16 (4 conv downsamples) and even (packing).
    Returns (logits, probs, (aux1, aux2, aux3)) in the fine domain — or,
    with return_packed=True, logits/probs in the packed
    (N, D/2, H/2, W/2, 8K) layout (delta- or class-major per
    packed_layout); the aux logits are always fine.
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

    # ---- level 0 encoder, packed ----
    long1p = _convblock_packed(
        x, p["ConvBlock_0"], rate, (take_rng(), take_rng()),
        first_fine_input=True,
    )  # (N, D/2, H/2, W/2, 8f)

    # _DownSample_0: the fine k2s2-VALID conv consumes exactly one packed
    # cell per output voxel -> a 1x1 conv on the packed tensor.
    w = p["_DownSample_0"]["ConvND_0"]["Conv_0"]["kernel"]
    s1 = _conv(long1p, pack_down_k2s2_to_1x1(w), padding="VALID")
    g = p["_DownSample_0"]["GroupNorm_0"]
    s1 = gn_fine(s1, g["scale"], g["bias"])
    s1 = channel_dropout(s1, rate, take_rng(), tile=1)
    s1 = jax.nn.relu(s1)  # fine (N, D/2, ..., 2f)

    # ---- encoder levels 1-3 + bottom, fine, residual ----
    long2 = _convblock_fine(
        s1, p["ConvBlock_1"], rate, (take_rng(), take_rng())) + s1
    s2 = _down_fine(long2, p["_DownSample_1"], rate, take_rng())
    long3 = _convblock_fine(
        s2, p["ConvBlock_2"], rate, (take_rng(), take_rng())) + s2
    s3 = _down_fine(long3, p["_DownSample_2"], rate, take_rng())
    long4 = _convblock_fine(
        s3, p["ConvBlock_3"], rate, (take_rng(), take_rng())) + s3
    s4 = _down_fine(long4, p["_DownSample_3"], rate, take_rng())
    long5 = _convblock_fine(
        s4, p["ConvBlock_4"], rate, (take_rng(), take_rng())) + s4

    # ---- decoder, fine until level 0 ----
    u1 = _up_fine(long5, p["_UpSample_0"], rate, take_rng())
    d1 = _convblock_fine(
        jnp.concatenate([u1, long4], -1), p["ConvBlock_5"], rate,
        (take_rng(), take_rng())) + u1
    aux1 = _aux_head(d1, p["_Head_0"], 8)
    u2 = _up_fine(d1, p["_UpSample_1"], rate, take_rng())
    d2 = _convblock_fine(
        jnp.concatenate([u2, long3], -1), p["ConvBlock_6"], rate,
        (take_rng(), take_rng())) + u2
    aux2 = _aux_head(d2, p["_Head_1"], 4)
    u3 = _up_fine(d2, p["_UpSample_2"], rate, take_rng())
    d3 = _convblock_fine(
        jnp.concatenate([u3, long2], -1), p["ConvBlock_7"], rate,
        (take_rng(), take_rng())) + u3
    aux3 = _aux_head(d3, p["_Head_2"], 2)

    # ---- level 0 decoder, packed ----
    wt = p["_UpSample_3"]["ConvTransposeND_0"]["ConvTranspose_0"]["kernel"]
    u4p = _conv(d3, pack_transpose_k2s2_to_1x1(wt), padding="VALID")
    g = p["_UpSample_3"]["GroupNorm_0"]
    u4p = gn_packed(u4p, g["scale"], g["bias"])
    u4p = channel_dropout(u4p, rate, take_rng(), tile=8)
    u4p = jax.nn.relu(u4p)  # packed (N, D/2, ..., 8f)

    d4p = _convblock_packed_concat(
        u4p, long1p, p["ConvBlock_8"], rate, (take_rng(), take_rng()), f,
    ) + u4p

    layout = packed_layout if return_packed else "delta"
    wh = p["_Head_3"]["ConvND_0"]["Conv_0"]["kernel"][0, 0, 0]
    wp, bp = pack_head_1x1(
        wh, jnp.zeros((num_classes,), wh.dtype), num_classes, f,
        layout=layout,
    )
    logitsp = _conv(d4p, wp, padding="VALID")  # head has no bias (bp == 0)
    probsp = packed_softmax(logitsp, num_classes, layout=layout)
    aux = (aux1, aux2, aux3)
    if return_packed:
        return logitsp, probsp, aux
    return depth_to_space3d(logitsp), depth_to_space3d(probsp), aux
