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
   fully-convolutional forward with CLAMPED windows: every device runs
   the net on a (shard + 2*margin) window shifted to lie fully inside
   the volume, then crops its shard at a per-device offset.  Exact
   everywhere (global ends included) once ``margin`` covers the
   receptive-field radius — for networks whose ops are spatially local.
   Networks with full-volume statistics (GroupNorm) remain approximate
   under any tile decomposition; use the per-layer exact machinery below
   (``SpatialUNet3d``: halo convs + psum'd GroupNorm) for those.
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


def halo_exchange_axis(x, axis_name: str, halo: int, axis: int,
                       boundary: str = "zero"):
    """halo_exchange along an arbitrary axis (moveaxis wrapper)."""
    if axis == 0:
        return halo_exchange(x, axis_name, halo, boundary)
    moved = jnp.moveaxis(x, axis, 0)
    out = halo_exchange(moved, axis_name, halo, boundary)
    return jnp.moveaxis(out, 0, axis)


def spatial_partition_infer(
    volume: np.ndarray,  # (D, H, W, C), D divisible by n_space
    apply_fn: Callable,  # (d, H, W, C) -> (d, H, W, K) local forward
    mesh: Mesh,
    margin: int = 16,
):
    """Overlap-tile inference with CLAMPED windows: every device gets a
    (shard_d + 2*margin)-deep window shifted so it lies fully inside the
    volume (end windows extend inward instead of into padding), runs
    `apply_fn` locally, and crops its shard at a per-device offset.

    Because each tile contains only real voxels, the network's own SAME
    zero-padding applies exactly at the true volume boundary — the result
    equals the unpartitioned forward EVERYWHERE (ends included) once
    `margin` covers the receptive-field radius, for networks whose ops are
    spatially local.  Networks with full-volume statistics (GroupNorm!)
    remain approximate under ANY tile decomposition — use the per-layer
    exact path (`SpatialUNet3d`: halo convs + psum'd GN) for those.
    """
    n_space = mesh.shape[SPACE_AXIS]
    d = volume.shape[0]
    assert d % n_space == 0, (d, n_space)
    dz = d // n_space
    tile = dz + 2 * margin
    assert tile <= d, f"margin {margin} too large: tile {tile} > depth {d}"

    vol = jnp.asarray(volume)
    starts = np.clip(np.arange(n_space) * dz - margin, 0, d - tile)
    offsets = (np.arange(n_space) * dz - starts).astype(np.int32)
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(vol, int(s), tile, 0) for s in starts]
    )  # (n_space, tile, H, W, C)
    spec_w = P(SPACE_AXIS, None, None, None, None)
    windows = jax.device_put(windows, NamedSharding(mesh, spec_w))
    offs = jax.device_put(
        jnp.asarray(offsets).reshape(n_space, 1),
        NamedSharding(mesh, P(SPACE_AXIS, None)),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_w, P(SPACE_AXIS, None)),
        out_specs=spec_w,
        check_vma=False,
    )
    def run(win, off):  # win (1, tile, H, W, C), off (1, 1)
        out = apply_fn(win[0])
        return jax.lax.dynamic_slice_in_dim(out, off[0, 0], dz, 0)[None]

    out = run(windows, offs)  # (n_space, dz, H, W, K)
    return out.reshape((d,) + out.shape[2:])


# ---------------------------------------------------------------------------
# Spatially-partitioned TRAINING (SURVEY §2.3 SP row, done per-layer).
#
# The overlap-tile decomposition above is an inference approximation; for
# training, every z-reducing conv exchanges 1-slab halos (ppermute) and
# GroupNorm psums its statistics, making the z-sharded forward AND backward
# bit-exact vs the single-device network (collectives are differentiable;
# ppermute/psum transpose to each other under AD).  `SpatialUNet3d` mirrors
# tpuseg.models.unet.UNet(ndim=3) module names, so its parameter tree is
# interchangeable with the plain model: train sharded, infer anywhere.
# ---------------------------------------------------------------------------
from flax import linen as nn  # noqa: E402

from tpuseg.nn.layers import ChannelDropout, ConvTransposeND, he_normal, max_pool_nd  # noqa: E402


class SpatialConvND(nn.Module):
    """3³ SAME conv over a z-sharded (N, dz, H, W, C) shard: zero-boundary
    halo exchange on z, then z-VALID conv.  Params live under "Conv_0"
    like nn.Conv inside ConvND."""

    features: int
    axis_name: str
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        xp = halo_exchange_axis(x, self.axis_name, 1, axis=1, boundary="zero")
        return nn.Conv(
            self.features, (3, 3, 3),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=self.use_bias, kernel_init=he_normal(), name="Conv_0",
        )(xp)


class SpatialGroupNorm(nn.Module):
    """GroupNorm whose statistics are psum'd over the space axis — exactly
    nn.GroupNorm's fast-variance math on the full volume."""

    groups: int
    axis_name: str
    eps: float = 1e-6  # flax nn.GroupNorm default — keeps the twin exact

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = x.reshape(x.shape[0], -1, self.groups, c // self.groups)
        s = jax.lax.psum(jnp.sum(g, axis=(1, 3)), self.axis_name)  # (N, G)
        s2 = jax.lax.psum(jnp.sum(g * g, axis=(1, 3)), self.axis_name)
        cnt = jax.lax.psum(jnp.asarray(g.shape[1] * g.shape[3], jnp.float32),
                           self.axis_name)
        mean = s / cnt
        var = s2 / cnt - mean * mean
        inv = jax.lax.rsqrt(var + self.eps)
        y = (g - mean[:, None, :, None]) * inv[:, None, :, None]
        return y.reshape(x.shape) * scale + bias


class SpatialConvBlock(nn.Module):
    """ConvBlock twin for z-sharded shards (same inner module names)."""

    features: int
    axis_name: str
    dropout: float = 0.2
    repeats: int = 2
    groups: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.repeats):
            x = SpatialConvND(self.features, self.axis_name, use_bias=False,
                              name=f"ConvND_{i}")(x)
            x = SpatialGroupNorm(self.groups, self.axis_name,
                                 name=f"GroupNorm_{i}")(x)
            # broadcast dropout masks depend only on (N, C) and the rng, so
            # every shard draws the identical mask from the replicated key
            x = ChannelDropout(self.dropout, 3, name=f"ChannelDropout_{i}")(
                x, deterministic=not train
            )
            x = nn.relu(x)
        return x


class _SpatialOutputHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x):
        from tpuseg.nn.layers import ConvND

        logits = ConvND(self.num_classes, 3, 1, name="ConvND_0")(x)
        if self.num_classes == 1:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs


class SpatialUNet3d(nn.Module):
    """UNet(ndim=3) twin whose forward runs on z-shards inside shard_map.

    Parameter tree matches tpuseg.models.unet.UNet(ndim=3) (explicit
    module names mirror flax auto-naming), so checkpoints interchange.
    Requires local z divisible by 2**levels.  Pool and k2s2 transpose-conv
    stages never straddle shard boundaries (windows align to even z), so
    only the 3³ convs exchange halos and only GN psums.
    """

    num_classes: int
    axis_name: str = SPACE_AXIS
    features: int = 16
    dropout: float = 0.2
    levels: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        skips = []
        n_enc = 0
        for lvl in range(self.levels):
            x = SpatialConvBlock(f * (2 ** lvl), self.axis_name, self.dropout,
                                 name=f"ConvBlock_{n_enc}")(x, train=train)
            n_enc += 1
            skips.append(x)
            x = max_pool_nd(x, 3, 2)
        x = SpatialConvBlock(f * (2 ** self.levels), self.axis_name, self.dropout,
                             name=f"ConvBlock_{n_enc}")(x, train=train)
        n_enc += 1
        for i, lvl in enumerate(reversed(range(self.levels))):
            ch = f * (2 ** lvl)
            x = ConvTransposeND(ch, 3, 2, 2, name=f"ConvTransposeND_{i}")(x)
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = SpatialConvBlock(ch, self.axis_name, self.dropout,
                                 name=f"ConvBlock_{n_enc}")(x, train=train)
            n_enc += 1
        return _SpatialOutputHead(self.num_classes, name="OutputHead_0")(x)


def spatial_grad_step(model_sp, mesh: Mesh, params, x, y, train: bool = False,
                      dropout_key=None):
    """One z-sharded loss+grad evaluation: inputs sharded over SPACE_AXIS,
    params replicated, gradients psum'd — returns (loss, grads) identical
    to the single-device computation (tested to float tolerance)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, SPACE_AXIS), P(None, SPACE_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(params, x, y):
        def loss_fn(p):
            kw = {}
            if train and dropout_key is not None:
                kw = {"rngs": {"dropout": dropout_key}}
            logits, _ = model_sp.apply(p, x, train=train, **kw)
            return jnp.sum((logits - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, SPACE_AXIS)
        grads = jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, SPACE_AXIS), grads
        )
        return loss, grads

    return run(params, x, y)


# ---------------------------------------------------------------------------
# Shard-aware segmentation losses + a full z-sharded train step.
#
# The categorical losses (tpuseg/losses/categorical.py) reduce to per-class
# GLOBAL sums (intersection, column sum, voxel count) — all psum-able, so
# the z-sharded loss (and therefore its gradient) is EXACTLY the
# single-device loss, not an approximation.
# ---------------------------------------------------------------------------


def psum_ad(x, axis_name: str):
    """psum whose FORWARD is the global sum but whose BACKWARD passes the
    cotangent through unchanged (identity transpose).

    Needed when a replicated loss built from psum'd statistics is
    differentiated per-shard inside shard_map(check_vma=False): every
    shard seeds cotangent 1.0 for the same replicated scalar, and psum's
    transpose (a psum of cotangents) then over-counts by the axis size.
    With this helper each shard's gradient is exactly its LOCAL partial
    derivative of the global loss; the caller completes the total with
    one psum over the parameter gradients."""
    sg = jax.lax.stop_gradient
    return jax.lax.psum(sg(x), axis_name) + x - sg(x)


def _spatial_class_stats(p, y, c, axis_name):
    """Global (inter, col_sum, count) per class from local shards
    (compare-and-reduce, no scatter — see losses/categorical.py)."""
    from tpuseg.losses.categorical import _oh

    oh = _oh(y, c)
    inter = psum_ad(jnp.sum(p * oh, axis=0), axis_name)
    col_sum = psum_ad(jnp.sum(p, axis=0), axis_name)
    count = jax.lax.psum(jnp.sum(oh, axis=0), axis_name)
    return inter, col_sum, count


# losses the z-sharded step supports (all reduce to psum-able global
# statistics).  NOT shard-decomposable and therefore excluded, by design:
# LovaszLoss (needs a global sort over all voxels), MutilClDiceLoss
# (iterated min/max-pool skeletonization), and the Binary* losses (the
# spatial path is the multiclass 3D trainer; run binary tasks as 2-class).
SPATIAL_LOSS_NAMES = (
    "MutilCrossEntropyLoss", "MutilFocalLoss", "MutilDiceLoss",
    "MutilCrossEntropyDiceLoss", "MutilELDiceLoss", "MutilSSLoss",
    "MutilTverskyLoss",
)


def spatial_seg_loss(logits, labels, loss_name: str, axis_name,
                     alpha=None, gamma: float = 2.0):
    """Shard-local logits/labels -> the GLOBAL loss value (identical on
    every shard).  ``axis_name`` is the mesh axis (or tuple of axes) the
    voxels are sharded over — pass ``("data", "space")`` for dp x sp.
    Supported names: SPATIAL_LOSS_NAMES — same math as
    tpuseg.losses.categorical, with the class statistics psum'd."""
    from tpuseg.losses.categorical import EPS, SMOOTH, _alpha, _oh

    c = logits.shape[-1]
    y = labels.reshape(-1).astype(jnp.int32)
    lf32 = logits.astype(jnp.float32).reshape(-1, c)
    a = _alpha(alpha, c)

    def ce():
        logp = jax.nn.log_softmax(lf32, axis=-1)
        oh = _oh(y, c)
        nll = -jnp.sum(logp * oh, axis=1)
        count = jax.lax.psum(jnp.sum(oh, axis=0), axis_name)
        present = (count > 0).astype(jnp.float32)
        w = present[y]
        return psum_ad(jnp.sum(w * nll), axis_name) / jnp.maximum(
            jax.lax.psum(jnp.sum(w), axis_name), EPS
        )

    def focal():
        logp = jax.nn.log_softmax(lf32, axis=-1)
        oh = _oh(y, c)
        nll = -jnp.sum(logp * oh, axis=1)
        count = jax.lax.psum(jnp.sum(oh, axis=0), axis_name)
        present = (count > 0).astype(jnp.float32)
        nllw = nll * present[y]
        pt = jnp.exp(-nllw)
        val = (1.0 - pt) ** gamma * nllw
        n = jax.lax.psum(jnp.asarray(val.shape[0], jnp.float32), axis_name)
        return psum_ad(jnp.sum(val), axis_name) / n

    def stats():
        p = jax.nn.softmax(lf32, axis=-1)
        inter, col_sum, count = _spatial_class_stats(p, y, c, axis_name)
        return p, inter, col_sum, count, count > 0

    def dice():
        _, inter, col_sum, count, present = stats()
        d = jnp.maximum((2.0 * inter + SMOOTH) / (col_sum + count + SMOOTH), EPS)
        loss = -d * present.astype(jnp.float32) * a
        return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)

    def eldice():
        _, inter, col_sum, count, present = stats()
        d = jnp.maximum((2.0 * inter + SMOOTH) / (col_sum + count + SMOOTH), EPS)
        d = d * present.astype(jnp.float32) * a
        val = jnp.sum(
            jnp.power(-jnp.log(d + SMOOTH), 0.3) * present
        ) / jnp.maximum(jnp.sum(present), 1)
        return jnp.clip(val, 0.0, 2.0)

    def tversky():
        _, tp, col_sum, count, present = stats()
        fp = col_sum - tp
        fn = count - tp
        tv = (tp + SMOOTH) / (tp + 0.3 * fp + 0.7 * fn + SMOOTH)
        loss = (1.0 - tv) * present.astype(jnp.float32) * a
        return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)

    def ss(r=0.1):
        p = jax.nn.softmax(lf32, axis=-1)
        oh = _oh(y, c)
        p_true = jnp.sum(p * oh, axis=1)
        count = jax.lax.psum(jnp.sum(oh, axis=0), axis_name)
        present = count > 0
        fg_err = psum_ad(jnp.sum(((1.0 - p_true) ** 2)[:, None] * oh, axis=0),
                         axis_name)
        sq_col = psum_ad(jnp.sum(p ** 2, axis=0), axis_name)
        sq_true = psum_ad(jnp.sum((p_true ** 2)[:, None] * oh, axis=0),
                          axis_name)
        bg_err = sq_col - sq_true
        n = jax.lax.psum(jnp.asarray(p.shape[0], jnp.float32), axis_name)
        fg_part = fg_err / (count + SMOOTH)
        bg_part = bg_err / ((n - count) + SMOOTH)
        val = (r * fg_part + (1.0 - r) * bg_part) * present.astype(jnp.float32) * a
        return jnp.sum(val) / jnp.maximum(jnp.sum(present), 1)

    if loss_name == "MutilCrossEntropyLoss":
        return ce()
    if loss_name == "MutilFocalLoss":
        return focal()
    if loss_name == "MutilDiceLoss":
        return dice()
    if loss_name == "MutilCrossEntropyDiceLoss":
        return ce() + dice()
    if loss_name == "MutilELDiceLoss":
        return eldice()
    if loss_name == "MutilSSLoss":
        return ss()
    if loss_name == "MutilTverskyLoss":
        return tversky()
    raise ValueError(
        f"spatial_seg_loss: unsupported loss {loss_name!r} "
        f"(supported: {SPATIAL_LOSS_NAMES})"
    )


def make_spatial_seg_train_step(model_sp, mesh: Mesh, tx, loss_name: str,
                                alpha=None, gamma: float = 2.0,
                                train: bool = True):
    """Jitted z-sharded segmentation train step: images/labels sharded over
    SPACE_AXIS, params/opt-state replicated, gradients psum'd, optimizer
    applied on the (replicated) result — numerically the single-device
    step.  state = {"params", "opt_state", "key", "step"} (the Trainer's
    layout).  Returns (state, loss)."""
    from tpuseg.core import optim as optim_lib
    from tpuseg.core.prng import step_key

    axis = SPACE_AXIS

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def loss_grads(params, image, label, key):
        def loss_fn(p):
            kw = {"rngs": {"dropout": key}} if train else {}
            logits, _ = model_sp.apply(p, image, train=train, **kw)
            return spatial_seg_loss(logits, label, loss_name, axis, alpha, gamma)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # loss is already global; grads are local contributions
        grads = jax.tree_util.tree_map(lambda t: jax.lax.psum(t, axis), grads)
        return loss, grads

    @jax.jit
    def step(state, image, label):
        key = step_key(jax.random.wrap_key_data(state["key"]), state["step"])
        loss, grads = loss_grads(state["params"], image, label, key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optim_lib.apply_updates(state["params"], updates)
        return {
            "params": params,
            "opt_state": opt_state,
            "key": state["key"],
            "step": state["step"] + 1,
        }, loss

    return step


# ---------------------------------------------------------------------------
# SpatialVNet3d — z-sharded twin of models.vnet.VNet(ndim=3), the benchmark
# network.  Explicit module names mirror flax auto-naming in the plain VNet,
# so parameter trees (and the flax "dropout" rng stream, which folds in the
# module path) are interchangeable: train sharded, infer anywhere.
# Only the 3^3 convs exchange halos and only GroupNorm psums; the k2s2
# down-convs / transpose-convs never straddle shard boundaries (local z
# stays even: global z divisible by 16 * n_space).
# ---------------------------------------------------------------------------


class SpatialLUConv(nn.Module):
    """LUConv twin: conv3 (halo) -> GN (psum) -> dropout -> ReLU."""

    features: int
    axis_name: str
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = SpatialConvND(self.features, self.axis_name, name="ConvND_0")(x)
        x = SpatialGroupNorm(8, self.axis_name, name="GroupNorm_0")(x)
        x = ChannelDropout(self.dropout, 3, name="ChannelDropout_0")(
            x, deterministic=not train
        )
        return nn.relu(x)


class SpatialInputTransition(nn.Module):
    """InputTransition twin (`nn/layers.py InputTransition`): 3^3 + 1^3
    paths sharing one GN and one dropout module (same rng stream as the
    plain net)."""

    features: int
    axis_name: str
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tpuseg.nn.layers import ConvND

        norm = SpatialGroupNorm(8, self.axis_name, name="GroupNorm_0")
        drop = ChannelDropout(self.dropout, 3, name="ChannelDropout_0")
        a = SpatialConvND(self.features, self.axis_name, name="ConvND_0")(x)
        a = nn.relu(drop(norm(a), deterministic=not train))
        b = ConvND(self.features, 3, 1, name="ConvND_1")(x)
        b = nn.relu(drop(norm(b), deterministic=not train))
        return a + b


class SpatialDownTransition(nn.Module):
    """DownTransition twin: k2s2 VALID down-conv (local: z even), GN psum,
    n LUConv twins, residual."""

    features: int
    axis_name: str
    n_convs: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tpuseg.nn.layers import ConvND

        down = ConvND(self.features, 3, 2, strides=2, padding="VALID",
                      name="ConvND_0")(x)
        down = SpatialGroupNorm(8, self.axis_name, name="GroupNorm_0")(down)
        down = ChannelDropout(self.dropout, 3, name="ChannelDropout_0")(
            down, deterministic=not train
        )
        down = nn.relu(down)
        out = down
        for i in range(self.n_convs):
            out = SpatialLUConv(self.features, self.axis_name, self.dropout,
                                name=f"LUConv_{i}")(out, train=train)
        return out + down


class SpatialUpTransition(nn.Module):
    """UpTransition twin: k2s2 transpose-conv (local), concat skip, 1^3
    squeeze (local), GN psums, n LUConv twins, residual."""

    features: int
    axis_name: str
    n_convs: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        from tpuseg.nn.layers import ConvND

        norm = SpatialGroupNorm(8, self.axis_name, name="GroupNorm_0")
        drop = ChannelDropout(self.dropout, 3, name="ChannelDropout_0")
        up = ConvTransposeND(self.features, 3, 2, 2, name="ConvTransposeND_0")(x)
        up = nn.relu(drop(norm(up), deterministic=not train))
        cat = jnp.concatenate([up, skip], axis=-1)
        cat = ConvND(self.features, 3, 1, name="ConvND_0")(cat)
        cat = nn.relu(drop(
            SpatialGroupNorm(8, self.axis_name, name="GroupNorm_1")(cat),
            deterministic=not train,
        ))
        out = cat
        for i in range(self.n_convs):
            out = SpatialLUConv(self.features, self.axis_name, self.dropout,
                                name=f"LUConv_{i}")(out, train=train)
        return out + cat


class SpatialVNet3d(nn.Module):
    """VNet(ndim=3) twin whose forward runs on z-shards inside shard_map.

    Parameter tree matches tpuseg.models.vnet.VNet(ndim=3); requires local
    z divisible by 16 (four down stages)."""

    num_classes: int
    axis_name: str = SPACE_AXIS
    features: int = 16
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        ax = self.axis_name
        out16 = SpatialInputTransition(f, ax, self.dropout,
                                       name="InputTransition_0")(x, train=train)
        out32 = SpatialDownTransition(f * 2, ax, 2, self.dropout,
                                      name="DownTransition_0")(out16, train=train)
        out64 = SpatialDownTransition(f * 4, ax, 3, self.dropout,
                                      name="DownTransition_1")(out32, train=train)
        out128 = SpatialDownTransition(f * 8, ax, 3, self.dropout,
                                       name="DownTransition_2")(out64, train=train)
        out256 = SpatialDownTransition(f * 16, ax, 3, self.dropout,
                                       name="DownTransition_3")(out128, train=train)
        up = SpatialUpTransition(f * 8, ax, 3, self.dropout,
                                 name="UpTransition_0")(out256, out128, train=train)
        up = SpatialUpTransition(f * 4, ax, 3, self.dropout,
                                 name="UpTransition_1")(up, out64, train=train)
        up = SpatialUpTransition(f * 2, ax, 2, self.dropout,
                                 name="UpTransition_2")(up, out32, train=train)
        up = SpatialUpTransition(f, ax, 1, self.dropout,
                                 name="UpTransition_3")(up, out16, train=train)
        return _SpatialOutputHead(self.num_classes, name="OutputHead_0")(up)


def spatial_twin(model):
    """The z-sharded twin of a plain model (parameter-tree compatible), or
    raise.  Supported: UNet(ndim=3), VNet(ndim=3)."""
    from tpuseg.models.unet import UNet
    from tpuseg.models.vnet import VNet

    if isinstance(model, UNet) and model.ndim == 3:
        return SpatialUNet3d(
            num_classes=model.num_classes, features=model.features,
            dropout=model.dropout, levels=model.levels,
        )
    if isinstance(model, VNet) and model.ndim == 3:
        return SpatialVNet3d(
            num_classes=model.num_classes, features=model.features,
            dropout=model.dropout,
        )
    raise ValueError(
        f"no spatial (z-sharded) twin for {type(model).__name__}"
        f"(ndim={getattr(model, 'ndim', '?')}); spatial training supports "
        "UNet3d and VNet3d"
    )


def spatial_multiclass_dice(probs, labels, axis_name, threshold: float = 0.5):
    """Shard-local multiclass hard dice -> the GLOBAL
    metrics.multiclass_dice_coeff value (identical on every shard).
    ``axis_name``: the axis/axes the per-sample voxels are sharded over
    (the space axis; batch-axis averaging is the caller's pmean)."""
    c = probs.shape[-1]
    n = probs.shape[0]
    p = (probs > threshold).astype(jnp.float32).reshape(n, -1, c)
    oh = (labels.reshape(n, -1)[:, :, None]
          == jnp.arange(c, dtype=jnp.int32)[None, None, :]).astype(jnp.float32)
    inter = jax.lax.psum(jnp.sum(p * oh, axis=1), axis_name)   # (n, c)
    psum_p = jax.lax.psum(jnp.sum(p, axis=1), axis_name)
    psum_t = jax.lax.psum(jnp.sum(oh, axis=1), axis_name)
    smooth = 1e-5
    dice = (2.0 * inter + smooth) / (psum_p + psum_t + smooth)  # (n, c)
    return jnp.mean(dice[:, 1:])
