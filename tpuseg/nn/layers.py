"""Shared layer vocabulary of the tpuseg model zoo.

Rank-generic (2D/3D) conv blocks in channels-last layout.  These are the
TPU-native re-design of the reference's repeated block patterns:

 * ``ConvBlock``  — (conv3^n no-bias → GroupNorm(8) → channel-dropout →
   ReLU) × 2, the U-Net block (`/root/reference/networks/Unet2d.py:64-85`).
 * ``LUConv`` / ``InputTransition`` / ``DownTransition`` / ``UpTransition``
   — the V-Net family vocabulary (`/root/reference/networks/VNet2d.py:5-100`,
   `VNet3d.py:5-100`), with the reference's ``self.feature`` construction
   typo (`VNet3d.py:127`) consciously not reproduced.

Weight init mirrors `/root/reference/networks/__init__.py:11-26`:
He-normal for conv kernels, He-uniform for dense, ones/zeros for norms.

Channel-dropout (torch's Dropout2d/3d semantics: whole feature maps are
zeroed) is expressed with flax Dropout broadcast over the spatial dims so a
single mask per (batch, channel) is generated — far cheaper on the VPU than
per-voxel masks.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

he_normal = nn.initializers.he_normal
he_uniform = nn.initializers.he_uniform


def _tup(v, ndim: int) -> Tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        assert len(v) == ndim
        return tuple(v)
    return (v,) * ndim


def space_to_depth(x, ndim: int, block: int = 2):
    """(N, *S, C) -> (N, *S/b, b^n·C); channel order (d_1..d_n, c)."""
    n = x.shape[0]
    spatial = x.shape[1:1 + ndim]
    c = x.shape[-1]
    shape = [n]
    for s in spatial:
        shape += [s // block, block]
    shape += [c]
    x = x.reshape(shape)
    # (n, s1, b1, s2, b2, ..., c) -> (n, s1, s2, ..., b1, b2, ..., c)
    perm = [0] + [1 + 2 * i for i in range(ndim)] + [2 + 2 * i for i in range(ndim)] + [1 + 2 * ndim]
    x = x.transpose(perm)
    out_spatial = [s // block for s in spatial]
    return x.reshape([n] + out_spatial + [(block ** ndim) * c])


def depth_to_space(x, ndim: int, block: int = 2):
    """(N, *S, b^n·C) -> (N, *S·b, C); inverse of space_to_depth."""
    n = x.shape[0]
    spatial = x.shape[1:1 + ndim]
    c = x.shape[-1] // (block ** ndim)
    x = x.reshape([n] + list(spatial) + [block] * ndim + [c])
    # (n, s1.., b1.., c) -> (n, s1, b1, s2, b2, ..., c)
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]
    perm += [1 + 2 * ndim]
    x = x.transpose(perm)
    return x.reshape([n] + [s * block for s in spatial] + [c])


# Space↔depth GEMM reformulation of k=s=2 (transpose) convs.  MEASURED
# NEGATIVE on this stack (v5e via axon): inference 784 vs 702 ms/vol,
# train step 4.1 s vs 0.2 s — the d2s/s2d relayouts and their gradients
# cost more than XLA's native strided/dilated conv lowering.  Kept as
# opt-in infrastructure (exactness covered by tests) for future tuning.
USE_GEMM_FASTPATH = False

# Pallas direct conv3d for the small-channel (8<=C<=64) k3 s1 SAME stem
# layers — the zoo's hot op, where XLA reaches only ~2-7 TFLOP/s
# (BASELINE.md).  See tpuseg/kernels/conv3d.py for the reformulation.
# Opt-in; parameters live under the same "Conv_0/kernel" path as the XLA
# path so checkpoints run through either.
USE_PALLAS_CONV3D = False


# Fused GroupNorm+ReLU Pallas kernel (kernels/fused_norm.py) in the
# ConvBlock/LUConv hot path.  Opt-in; ReLU∘ChannelDropout∘GN is reordered
# to ChannelDropout∘ReLU∘GN, which is pointwise-identical (dropout zeroes
# and positively rescales whole channels, commuting with ReLU).
USE_FUSED_GN_RELU = False

# int8 W8A8 conv execution for INFERENCE (VERDICT r2 #2): the v5e MXU runs
# int8 at ~2x the bf16 rate, and the C16/C32 stem stages are N=Cout-lane-
# capped — int8 doubles that ceiling.  Weights quantize per-output-channel
# (folds to compile-time constants under a params-closure jit); activations
# quantize dynamically per tensor (one abs-max reduction, fused into the
# preceding GN/ReLU epilogue).  Toggle with `int8_inference()`; quality is
# gated by dice parity on a trained net (benchmarks/int8_quality_probe.py).
USE_INT8_CONV = False


import contextlib


@contextlib.contextmanager
def int8_inference(enable: bool = True):
    """Context manager: run ConvND through the int8 MXU path.  Inference
    only (the quantization ops are non-differentiable by design); callers
    must build their jit closures inside the context (the flag is read at
    trace time)."""
    global USE_INT8_CONV
    prev = USE_INT8_CONV
    USE_INT8_CONV = enable
    try:
        yield
    finally:
        USE_INT8_CONV = prev


def _conv_dimension_numbers(ndim: int):
    sp = "DHW"[-ndim:] if ndim <= 3 else None
    assert sp is not None, ndim
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


class _Int8Conv(nn.Module):
    """W8A8 conv; parameter names/shapes/init mirror nn.Conv ("kernel",
    "bias" under this module's scope) so checkpoints interchange —
    instantiate with name="Conv_0" inside ConvND."""

    features: int
    ndim: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Union[str, Sequence[Tuple[int, int]]]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", he_normal(), self.kernel_size + (cin, self.features)
        )
        kf = kernel.astype(jnp.float32)
        # per-output-channel symmetric scale; |wq| <= 127 by construction
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))), 1e-12
        ) / 127.0
        wq = jnp.round(kf / w_scale).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, self.strides, self.padding,
            dimension_numbers=_conv_dimension_numbers(self.ndim),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (a_scale * w_scale)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return y.astype(x.dtype)


class _FusedGNReLU(nn.Module):
    """GroupNorm+ReLU through the fused kernel; parameter names/shapes
    mirror nn.GroupNorm (scale, bias) so checkpoints interchange."""

    groups: int = 8

    @nn.compact
    def __call__(self, x):
        from tpuseg.kernels.fused_norm import fused_group_norm_relu_vjp

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return fused_group_norm_relu_vjp(x, scale, bias, self.groups)


class _PallasConv3d(nn.Module):
    """3x3x3 SAME stride-1 conv through kernels/conv3d.py; parameter names
    and init mirror nn.Conv so checkpoints are interchangeable."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from tpuseg.kernels.conv3d import conv3d_small_vjp

        kernel = self.param(
            "kernel", he_normal(), (3, 3, 3, x.shape[-1], self.features)
        )
        y = conv3d_small_vjp(x, kernel.astype(x.dtype))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class ConvND(nn.Module):
    """channels-last conv over `ndim` spatial dims."""

    features: int
    ndim: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: Union[int, Sequence[int]] = 1
    use_gemm_fastpath: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        ks = _tup(self.kernel_size, self.ndim)
        st = _tup(self.strides, self.ndim)
        fast = (
            USE_GEMM_FASTPATH
            if self.use_gemm_fastpath is None
            else self.use_gemm_fastpath
        )
        # opt-in TPU path: a k=s=2 strided conv IS space_to_depth + a 1x1
        # GEMM over 2^n-times-wider channels (exact reformulation)
        if (
            fast
            and ks == st == (2,) * self.ndim
            and self.feature_group_count == 1
            and _tup(self.kernel_dilation, self.ndim) == (1,) * self.ndim
            and all(s % 2 == 0 for s in x.shape[1:1 + self.ndim])
        ):
            kernel = self.param(
                "kernel_s2d",
                he_normal(),
                ks + (x.shape[-1], self.features),
            )
            packed = space_to_depth(x, self.ndim, 2)
            w = kernel.reshape((2 ** self.ndim) * x.shape[-1], self.features)
            y = jnp.dot(packed, w)
            if self.use_bias:
                y = y + self.param(
                    "bias_s2d", nn.initializers.zeros, (self.features,)
                )
            return y
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * self.ndim
        if (
            USE_INT8_CONV
            and self.feature_group_count == 1
            and _tup(self.kernel_dilation, self.ndim) == (1,) * self.ndim
            and self.ndim in (2, 3)
        ):
            return _Int8Conv(
                self.features, self.ndim, ks, st, pad,
                use_bias=self.use_bias, name="Conv_0",
            )(x)
        if USE_PALLAS_CONV3D and self.ndim == 3 and pad == "SAME":
            from tpuseg.kernels.conv3d import supported

            w_shape = (3, 3, 3, x.shape[-1], self.features)
            if ks == (3, 3, 3) and supported(
                x.shape, w_shape, st, "SAME",
                _tup(self.kernel_dilation, 3), self.feature_group_count,
            ):
                # flax auto-names the nn.Conv below "Conv_0"; give the
                # pallas module the same name so params interchange
                return _PallasConv3d(
                    self.features, self.use_bias, name="Conv_0"
                )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_dilation=_tup(self.kernel_dilation, self.ndim),
            kernel_init=he_normal(),
        )(x)


class ConvTransposeND(nn.Module):
    """channels-last transpose conv; kernel=strides=2 is the zoo's upsampler."""

    features: int
    ndim: int
    kernel_size: Union[int, Sequence[int]] = 2
    strides: Union[int, Sequence[int]] = 2
    use_bias: bool = True
    use_gemm_fastpath: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        ks = _tup(self.kernel_size, self.ndim)
        st = _tup(self.strides, self.ndim)
        fast = (
            USE_GEMM_FASTPATH
            if self.use_gemm_fastpath is None
            else self.use_gemm_fastpath
        )
        # opt-in TPU path: k=s=2 transpose conv IS a 1x1 GEMM to 2^n-times-
        # wider channels + depth_to_space (exact: out[2i+d] = W_d @ x[i])
        if fast and ks == st == (2,) * self.ndim:
            c_in = x.shape[-1]
            kernel = self.param(
                "kernel_d2s", he_normal(), ks + (c_in, self.features)
            )
            # flax ConvTranspose places the spatially *flipped* kernel at
            # each input position (out[2i+d] = x[i]·K[1-d]); flip so the
            # fast path matches flax's parameterization exactly
            kflip = kernel[(slice(None, None, -1),) * self.ndim]
            w = (
                kflip.reshape(-1, c_in, self.features)  # (b^n, in, out)
                .transpose(1, 0, 2)
                .reshape(c_in, (2 ** self.ndim) * self.features)
            )
            y = jnp.dot(x, w)  # (N, *S, b^n·out), channel order (d, out)
            if self.use_bias:
                bias = self.param(
                    "bias_d2s", nn.initializers.zeros, (self.features,)
                )
                y = y + jnp.tile(bias, 2 ** self.ndim)
            return depth_to_space(y, self.ndim, 2)
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding="VALID" if ks == st else "SAME",
            use_bias=self.use_bias,
            kernel_init=he_normal(),
        )(x)


class ChannelDropout(nn.Module):
    """torch Dropout2d/3d semantics: drop whole channels (broadcast over space)."""

    rate: float
    ndim: int

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(
            rate=self.rate,
            broadcast_dims=tuple(range(1, 1 + self.ndim)),
        )(x, deterministic=deterministic)


def max_pool_nd(x, ndim: int, window: int = 2, stride: Optional[int] = None):
    stride = stride or window
    dims = (1,) + (window,) * ndim + (1,)
    strides = (1,) + (stride,) * ndim + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, "VALID"
    )


def avg_pool_nd(x, ndim: int, window: int = 2, stride: Optional[int] = None):
    stride = stride or window
    dims = (1,) + (window,) * ndim + (1,)
    strides = (1,) + (stride,) * ndim + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "VALID")
    return summed / float(window ** ndim)


def global_avg_pool(x, ndim: int):
    return jnp.mean(x, axis=tuple(range(1, 1 + ndim)))


def upsample_nd(x, ndim: int, factor: int = 2, method: str = "linear"):
    """nearest / (bi|tri)linear upsampling of channels-last tensors."""
    shape = list(x.shape)
    for d in range(1, 1 + ndim):
        shape[d] = shape[d] * factor
    if method == "nearest":
        method = "nearest"
    elif method == "linear":
        method = "linear"  # jax.image linear == align_corners=False
    return jax.image.resize(x, tuple(shape), method=method)


class ConvBlock(nn.Module):
    """(conv k3 no-bias → GroupNorm(8) → channel-dropout → ReLU) × repeats.

    The U-Net encoder/decoder block (`networks/Unet2d.py:64-85`).
    """

    features: int
    ndim: int
    dropout: float = 0.2
    repeats: int = 2
    groups: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.repeats):
            x = ConvND(self.features, self.ndim, 3, use_bias=False)(x)
            if USE_FUSED_GN_RELU:
                x = _FusedGNReLU(self.groups, name=f"GroupNorm_{i}")(x)
                x = ChannelDropout(self.dropout, self.ndim)(x, deterministic=not train)
            else:
                x = nn.GroupNorm(num_groups=self.groups)(x)
                x = ChannelDropout(self.dropout, self.ndim)(x, deterministic=not train)
                x = nn.relu(x)
        return x


class LUConv(nn.Module):
    """V-Net unit conv: conv3 → GN(8) → dropout → ReLU (`VNet2d.py:5-16`)."""

    features: int
    ndim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvND(self.features, self.ndim, 3)(x)
        if USE_FUSED_GN_RELU:
            x = _FusedGNReLU(8, name="GroupNorm_0")(x)
            return ChannelDropout(self.dropout, self.ndim)(x, deterministic=not train)
        x = nn.GroupNorm(num_groups=8)(x)
        x = ChannelDropout(self.dropout, self.ndim)(x, deterministic=not train)
        return nn.relu(x)


class InputTransition(nn.Module):
    """V-Net stem: 3^n conv path + 1^n conv residual path, shared norm
    (`VNet2d.py:25-43`)."""

    features: int
    ndim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = nn.GroupNorm(num_groups=8)
        drop = ChannelDropout(self.dropout, self.ndim)
        a = ConvND(self.features, self.ndim, 3)(x)
        a = nn.relu(drop(norm(a), deterministic=not train))
        b = ConvND(self.features, self.ndim, 1)(x)
        b = nn.relu(drop(norm(b), deterministic=not train))
        return a + b


class DownTransition(nn.Module):
    """V-Net down stage: stride-2 conv → n LUConvs → residual add
    (`VNet2d.py:46-59`)."""

    features: int
    ndim: int
    n_convs: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        down = ConvND(self.features, self.ndim, 2, strides=2, padding="VALID")(x)
        down = nn.GroupNorm(num_groups=8)(down)
        down = ChannelDropout(self.dropout, self.ndim)(down, deterministic=not train)
        down = nn.relu(down)
        out = down
        for _ in range(self.n_convs):
            out = LUConv(self.features, self.ndim, self.dropout)(out, train=train)
        return out + down


class UpTransition(nn.Module):
    """V-Net up stage: transpose-conv → concat skip → 1^n squeeze →
    n LUConvs → residual add (`VNet2d.py:62-80`)."""

    features: int
    ndim: int
    n_convs: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        norm = nn.GroupNorm(num_groups=8)
        drop = ChannelDropout(self.dropout, self.ndim)
        up = ConvTransposeND(self.features, self.ndim, 2, 2)(x)
        up = nn.relu(drop(norm(up), deterministic=not train))
        cat = jnp.concatenate([up, skip], axis=-1)
        cat = ConvND(self.features, self.ndim, 1)(cat)
        cat = nn.relu(drop(nn.GroupNorm(num_groups=8)(cat), deterministic=not train))
        out = cat
        for _ in range(self.n_convs):
            out = LUConv(self.features, self.ndim, self.dropout)(out, train=train)
        return out + cat


class OutputHead(nn.Module):
    """1^n conv head returning (logits, probs) — the zoo-wide forward
    contract (`networks/Unet2d.py:56-62`): sigmoid for 1 class, softmax
    over the channel axis otherwise."""

    num_classes: int
    ndim: int

    @nn.compact
    def __call__(self, x):
        logits = ConvND(self.num_classes, self.ndim, 1)(x)
        if self.num_classes == 1:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs
