"""Packed-stem VNet3d inference — the round-3 compute lever.

Motivation (measured, benchmarks/fwd27_stage_profile.py + packed_conv_probe*):
the bench's hot program (VNet3d 96^3 batch-27 bf16 forward) spends ~120 of
~168 device-ms in the 96^3 C16 level — ~62 ms in conv+GN-stat fusions
capped by the N=Cout=16 MXU lane ceiling, and ~58 ms in elementwise
normalize/apply/copy fusions running at ~27/128 lane utilization because
XLA lays those activations out with (C=16, B=27) on the minor dims.  The
C32@48^3 level already runs ~43 TF/s effective and is left alone.

Fix: execute the ENTIRE 96^3 level in the space-to-depth domain —
activations live as (N, 48^3, 8*C) with 128 channels on the lanes:

 * k3s1 SAME conv  == k4 stride-2 conv, fine -> packed
   (W2[s,c,(delta,f)] = W[s-delta,c,f] for s-delta in [0,3); 64/27 = 2.37x
   structural FLOP waste at a ~3.3x better rate: measured 29.8 vs 21.6
   TF/s true-conv-equivalent at C16)
 * k1 conv         == k2 stride-2 conv, fine -> packed (delta-placed)
 * k2s2 down conv  == 1x1 conv, packed -> next level's fine (EXACT, no waste)
 * k2s2 transpose  == 1x1 conv, fine -> packed (flax flip semantics)
 * GroupNorm/ReLU/residual/concat-squeeze/head/softmax — all exact in the
   packed channel layout (delta-major, f-minor, matching nn/layers.py
   space_to_depth)

Everything below the 96^3 level reuses the plain ops at their current
(already near-ceiling) rates.  This is an INFERENCE formulation: it maps
the PLAIN VNet(ndim=3) parameter pytree (training, checkpoints, torch
import all unchanged) through compile-time weight transforms that fold to
constants under a params-closure jit.

Reference anchor for the op being accelerated:
`/root/reference/networks/VNet3d.py:102-158` via `modelVNet.py` predict.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GN_EPS = 1e-6  # flax nn.GroupNorm default — exactness vs the plain model
GROUPS = 8


# ---------------------------------------------------------------------------
# weight transforms (run at trace time on params — folded into the program)
# ---------------------------------------------------------------------------


def pack_k3_to_k4s2(w):
    """(3,3,3,C,F) -> (4,4,4,C,8F): W2[s,c,(delta,f)] = W[s-delta,c,f].

    Packed channel = delta-major, f-minor: ((dd*2+dh)*2+dw)*F + f —
    matching nn/layers.py space_to_depth."""
    k3, _, _, c, f = w.shape
    assert k3 == 3
    w2 = jnp.zeros((4, 4, 4, c, 8 * f), w.dtype)
    for dd in range(2):
        for dh in range(2):
            for dw in range(2):
                dflat = (dd * 2 + dh) * 2 + dw
                w2 = w2.at[
                    dd:dd + 3, dh:dh + 3, dw:dw + 3, :,
                    dflat * f:(dflat + 1) * f,
                ].add(w)
    return w2


def pack_k1_to_k2s2(w1):
    """(1,1,1,C,F) -> (2,2,2,C,8F): the 1^3 conv lands each delta's output
    from that delta's own fine voxel."""
    c, f = w1.shape[-2:]
    w2 = jnp.zeros((2, 2, 2, c, 8 * f), w1.dtype)
    for dd in range(2):
        for dh in range(2):
            for dw in range(2):
                dflat = (dd * 2 + dh) * 2 + dw
                w2 = w2.at[dd, dh, dw, :, dflat * f:(dflat + 1) * f].set(
                    w1[0, 0, 0]
                )
    return w2


def pack_down_k2s2_to_1x1(w):
    """k2s2 VALID down conv (2,2,2,C,F) consuming packed input:
    1x1 conv with W1[(delta,c), f] = W[delta, c, f]."""
    _, _, _, c, f = w.shape
    w1 = jnp.zeros((1, 1, 1, 8 * c, f), w.dtype)
    for dd in range(2):
        for dh in range(2):
            for dw in range(2):
                dflat = (dd * 2 + dh) * 2 + dw
                w1 = w1.at[0, 0, 0, dflat * c:(dflat + 1) * c, :].set(
                    w[dd, dh, dw]
                )
    return w1


def pack_transpose_k2s2_to_1x1(wt):
    """flax ConvTranspose k2s2 VALID kernel (2,2,2,Cin,F) producing packed
    output: out[2q+delta] = x[q] @ K[1-delta] (flax places the flipped
    kernel; nn/layers.py ConvTransposeND comment) -> 1x1 conv
    W1[c, (delta,f)] = K[1-dd,1-dh,1-dw, c, f]."""
    _, _, _, c, f = wt.shape
    w1 = jnp.zeros((1, 1, 1, c, 8 * f), wt.dtype)
    for dd in range(2):
        for dh in range(2):
            for dw in range(2):
                dflat = (dd * 2 + dh) * 2 + dw
                w1 = w1.at[0, 0, 0, :, dflat * f:(dflat + 1) * f].set(
                    wt[1 - dd, 1 - dh, 1 - dw]
                )
    return w1


def tile_channel_packed(v, p=8):
    """Per-f vector (F,) -> packed (p*F,) by delta-major tiling."""
    return jnp.tile(v, p)


# Level-B (48^3-scale C32 level) packing: (H, W) only — P=4, fine D.
# Measured (benchmarks/partial_pack_probe2.py, in-net-faithful blocks):
# part4 k3 blocks run 11.85 ms vs full8 19.33 / fine 22.78 — the 2x
# redundancy cut beats the lane-halving (C128 on lanes is still full).
# Level A (96^3 C16) stays fully packed: full8 16.6 TF/s true-equiv vs
# part4 13.2 there (C64 lanes can't feed the MXU at C16's arithmetic
# intensity).
B_DELTAS = 4  # (dh, dw) delta-major, f-minor


def pack_down_k2s2_full8_to_part4(w):
    """k2s2 VALID down conv (2,2,2,C,F), full8-packed input (A level) ->
    (H,W)-part4 output (B level): kernel (1,2,2) strides (1,2,2).

    Per axis: out fine-48 index h = 2m+dh (packed) or h = d (fine-D);
    input fine-96 = 2h+s lives at A-coarse (2h+s)//2 with
    delta_in = (2h+s)%2.  For D: coarse tap 0, delta_d_in = s.  For H/W:
    coarse tap t = delta_out, delta_in = s (since (2*(2m+dh)+s)//2 =
    2m+dh with s in {0,1})."""
    _, _, _, c, f = w.shape
    w2 = jnp.zeros((1, 2, 2, 8 * c, 4 * f), w.dtype)
    for dh in range(2):
        for dw_ in range(2):
            dflat = dh * 2 + dw_
            for sd in range(2):
                for sh in range(2):
                    for sw in range(2):
                        sflat = (sd * 2 + sh) * 2 + sw
                        w2 = w2.at[
                            0, dh, dw_,
                            sflat * c:(sflat + 1) * c,
                            dflat * f:(dflat + 1) * f,
                        ].set(w[sd, sh, sw])
    return w2


def pack_down_k2s2_part4_to_fine(w):
    """k2s2 VALID down conv (2,2,2,C,F), (H,W)-part4 input -> fine
    output (level-C entry): kernel (2,1,1) strides (2,1,1); the H/W taps
    come from the input delta channels."""
    _, _, _, c, f = w.shape
    w2 = jnp.zeros((2, 1, 1, 4 * c, f), w.dtype)
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                sflat = sh * 2 + sw
                w2 = w2.at[
                    sd, 0, 0, sflat * c:(sflat + 1) * c, :
                ].set(w[sd, sh, sw])
    return w2


def pack_transpose_k2s2_fine_to_part4(wt):
    """flax ConvTranspose k2s2 VALID kernel (2,2,2,Cin,F), fine input ->
    (H,W)-part4 output: conv_transpose kernel (2,1,1) strides (2,1,1).
    Along D flax's own flip applies; along H/W the packed output delta
    takes K[1-delta] (pack_transpose_k2s2_to_1x1's flip)."""
    _, _, _, c, f = wt.shape
    w2 = jnp.zeros((2, 1, 1, c, 4 * f), wt.dtype)
    for td in range(2):
        for dh in range(2):
            for dw_ in range(2):
                dflat = dh * 2 + dw_
                w2 = w2.at[
                    td, 0, 0, :, dflat * f:(dflat + 1) * f
                ].set(wt[td, 1 - dh, 1 - dw_])
    return w2


def pack_transpose_k2s2_part4_to_full8(wt):
    """flax ConvTranspose k2s2 VALID kernel (2,2,2,Cin,F), (H,W)-part4
    input (B level) -> full8-packed output (A level): conv_transpose
    kernel (1,2,2) strides (1,2,2).

    Along D (fine in, packed out): out fine-96 = 2q+e at A-coarse q,
    delta_d = e, weight K[1-e] — a 1x1 gather.  Along H/W (packed in,
    packed out): contribution K[1-delta'] lands at coarse tap tau =
    delta_in; with flax's flip (out[2m+tau] uses W2[1-tau]) that means
    W2[a] is fed from input delta block (1-a)."""
    _, _, _, c, f = wt.shape
    w2 = jnp.zeros((1, 2, 2, 4 * c, 8 * f), wt.dtype)
    for ah in range(2):
        for aw in range(2):
            eh, ew = 1 - ah, 1 - aw  # input delta block feeding W2[ah,aw]
            eflat = eh * 2 + ew
            for dd in range(2):
                for dh in range(2):
                    for dw_ in range(2):
                        dflat = (dd * 2 + dh) * 2 + dw_
                        w2 = w2.at[
                            0, ah, aw,
                            eflat * c:(eflat + 1) * c,
                            dflat * f:(dflat + 1) * f,
                        ].set(wt[1 - dd, 1 - dh, 1 - dw_])
    return w2


def block_diag_1x1_packed(w1, extra_in_blocks=(), p=8):
    """Fine 1x1 conv (Cin, F) -> packed block-diagonal (p*Cin, p*F) 1x1.

    With extra_in_blocks=(w_a, w_b, ...) builds the packed weight for a
    conv consuming the packed concat [x_a ; x_b ; ...] (each delta-major)
    split of the fine input channels: w1 must be pre-split by the caller
    and passed as the tuple; returns (1,1,1, p*sum(Cin_i), p*F)."""
    blocks = extra_in_blocks or (w1,)
    f = blocks[0].shape[-1]
    total_in = sum(b.shape[0] for b in blocks)
    wp = jnp.zeros((1, 1, 1, p * total_in, p * f), blocks[0].dtype)
    off = 0
    for b in blocks:
        c = b.shape[0]
        for dflat in range(p):
            wp = wp.at[
                0, 0, 0,
                off + dflat * c:off + (dflat + 1) * c,
                dflat * f:(dflat + 1) * f,
            ].set(b)
        off += p * c
    return wp


# ---------------------------------------------------------------------------
# packed elementwise / norm ops
# ---------------------------------------------------------------------------


# Affine-form GN for low-precision compute (bf16 train lever, r5): the
# reshape form materializes the whole activation in f32 for the
# normalize pass ((g - mean) * inv) plus two converts each way — in the
# bf16 train graph that is the dominant non-conv HBM traffic (the r2
# root-cause of the fine-domain bf16 slowdown was exactly flax's GN f32
# promotion).  The affine form keeps the STATS reductions in f32
# (converts fuse into the reduces) but folds (mean, inv, scale, bias)
# into tiny per-(sample, channel) a/b vectors and applies
# y = x * a + b in the compute dtype — one bf16 fused multiply-add over
# the activation instead of an f32 round trip.  Numerically this only
# differs from the reshape form in x's own precision (the cancellation
# x*a - mean*a adds O(|mean|/std * 2^-9) absolute error in bf16), so it
# is gated to low-precision inputs; f32/f64 keep the exact flax form
# that the golden tests pin.
USE_AFFINE_GN_LOWP = False  # raw switch, read at trace time
# Policy (r5, ledger): TRAIN graphs use the affine form for
# low-precision inputs (-2.5 ms/step on the bf16 packed train step —
# the f32 (g-mean)*inv round trips cost in the backward), while
# INFERENCE keeps the reshape form (fwd27 A/B measured a wash, 106.8 vs
# 108.5 ms, so eval/predict numerics stay identical to the plain
# model).  tasks/segmentation.py enters affine_gn_lowp(train) around
# the packed apply; the `with` body executes during tracing, so the
# flag binds per traced program.
AFFINE_GN_IN_TRAINING = True


def _gn_affine_apply(x, gview_shape, mean, inv, scale_r, bias_r, stat_dt):
    """y = x * a + b in x.dtype with a/b formed in stat_dt (tiny)."""
    a = inv * scale_r
    b = bias_r - mean * a
    g = x.reshape(gview_shape)
    y = g * a.astype(x.dtype) + b.astype(x.dtype)
    return y.reshape(x.shape)


def gn_packed(x, scale, bias, compute_dtype=None, p=8):
    """GroupNorm(8) on packed (N, D', H', W', p*F) == flax GroupNorm(8)
    on the fine tensor: per (sample, group) stats over spatial x delta x
    group-channels; fast-variance formula, stats promoted to at least
    f32 (flax semantics; stays f64 under x64 for exactness tests)."""
    n = x.shape[0]
    f = x.shape[-1] // p
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    gshape = (n, -1, p, GROUPS, f // GROUPS)
    g = x.reshape(gshape).astype(stat_dt)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    mean2 = jnp.mean(g * g, axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    if USE_AFFINE_GN_LOWP and x.dtype != stat_dt:
        scale_r = scale.astype(stat_dt).reshape(1, 1, 1, GROUPS, f // GROUPS)
        bias_r = bias.astype(stat_dt).reshape(1, 1, 1, GROUPS, f // GROUPS)
        return _gn_affine_apply(x, gshape, mean, inv, scale_r, bias_r, stat_dt)
    y = (g - mean) * inv
    y = y.reshape(x.shape).astype(x.dtype)
    return y * tile_channel_packed(scale, p).astype(
        x.dtype
    ) + tile_channel_packed(bias, p).astype(x.dtype)


def gn_fine(x, scale, bias):
    """flax-equivalent GroupNorm(8) for the unpacked levels."""
    n = x.shape[0]
    c = x.shape[-1]
    stat_dt = jnp.promote_types(x.dtype, jnp.float32)
    gshape = (n, -1, GROUPS, c // GROUPS)
    g = x.reshape(gshape).astype(stat_dt)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    mean2 = jnp.mean(g * g, axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    if USE_AFFINE_GN_LOWP and x.dtype != stat_dt:
        scale_r = scale.astype(stat_dt).reshape(1, 1, GROUPS, c // GROUPS)
        bias_r = bias.astype(stat_dt).reshape(1, 1, GROUPS, c // GROUPS)
        return _gn_affine_apply(x, gshape, mean, inv, scale_r, bias_r, stat_dt)
    y = ((g - mean) * inv).reshape(x.shape).astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def channel_dropout(x, rate, rng, tile: int):
    """torch Dropout3d semantics (drop whole channels, broadcast over
    space); in the packed layout the `tile` delta copies of a fine
    channel share one mask so the fine-domain semantics are preserved
    exactly (and the fine axes of a partially-packed level are spatial,
    which Dropout3d broadcasts over anyway)."""
    if rate == 0.0 or rng is None:
        return x
    c = x.shape[-1] // tile
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1, c))
    if tile > 1:
        mask = jnp.tile(mask, (1, 1, 1, 1, tile))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


DN = ("NDHWC", "DHWIO", "NDHWC")

# int8 W8A8 execution of the PACKED convs (VERDICT r2 #2 follow-up): the
# fine-shape XLA-int8 path lost everywhere (BASELINE.md "int8 through
# XLA"), but packing moved the hot convs to dense C64-C256 shapes — much
# closer to the clean-matmul regime where the v5e int8 MXU measured ~2x
# bf16 (476 TOP/s).  Weights quantize per-output-channel at trace time
# (consts under the params-closure jit); activations quantize dynamically
# per tensor (one abs-max pass — ~1 ms/conv of HBM traffic at the b27
# packed shapes, which the conv saving must beat).  Inference-only.
#
# MEASURED (r4, benchmarks/int8_packed_probe.py): at the packed shapes
# int8 IS ~2x bf16 per conv in micro chains (k3 C128@48^3 8.7 vs
# 17.0 ms = 351 TOP/s peak; C256@12^3 0.37 vs 0.77 ms) and argmax
# agreement is 1.00000 — but IN-NET fwd27 is a wash (int8 115.3 vs
# bf16 114.8 ms): the packed forward is no longer conv-bound, and the
# per-conv quantize/dequantize elementwise passes give back exactly
# what the MXU saves.  Default stays OFF; revisit only if a later
# lever makes the forward conv-bound again.
USE_INT8_PACKED = False
_INT8_MIN_CIN = 32  # skip tiny-Cin convs (quant overhead dwarfs the MXU win)


import contextlib


@contextlib.contextmanager
def affine_gn_lowp(enable: bool = True):
    """Use the affine GN form for low-precision inputs inside this
    context (read at TRACE time — the `with` body must execute while the
    consuming function is being traced).  See AFFINE_GN_IN_TRAINING."""
    global USE_AFFINE_GN_LOWP
    prev = USE_AFFINE_GN_LOWP
    USE_AFFINE_GN_LOWP = enable
    try:
        yield
    finally:
        USE_AFFINE_GN_LOWP = prev


@contextlib.contextmanager
def int8_packed_inference(enable: bool = True):
    """Run the packed convs W8A8.  INFERENCE ONLY — jnp.round has a zero
    gradient, so a train graph traced under this flag would silently stop
    learning.  Build jit closures inside the context (read at trace time).
    """
    global USE_INT8_PACKED
    prev = USE_INT8_PACKED
    USE_INT8_PACKED = enable
    try:
        yield
    finally:
        USE_INT8_PACKED = prev


def _conv_int8(x, w, strides, padding):
    wf = w.astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3)), 1e-12
    ) / 127.0  # per-output-channel
    wq = jnp.round(wf / w_scale).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (a_scale * w_scale)).astype(x.dtype)


def _conv(x, w, strides=(1, 1, 1), padding="SAME"):
    if USE_INT8_PACKED and x.shape[-1] >= _INT8_MIN_CIN:
        return _conv_int8(x, w, strides, padding)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding, dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )


def _conv_t(x, w, strides=(2, 2, 2)):
    return jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides, "VALID", dimension_numbers=DN,
    )


# The fine->packed stem conv (k4 stride-2, padding (1,2) — the
# pack_k3_to_k4s2 form) is the one conv packing can't widen: its
# filter gradient contracts over only Cin (1 at level 0) of 8 MXU
# sublanes, and the r5 train-step profile puts that single dW fusion at
# 2.13 ms/step (bf16) — the largest attackable block.  With
# USE_GEMM_STEM_DW the custom VJP computes dW as ONE full-width GEMM:
# space-to-depth the (1,2→3)-padded input by 2 (8*Cin channels), shift-
# stack the 8 (a1d,a1h,a1w) in {0,1}^3 window-block offsets (a = a0 +
# 2*a1 splits each k4 offset into an s2d phase a0 and a block shift
# a1), and contract all n*d2*h2*w2 positions against dy:
# [64*Cin, Npos] @ [Npos, Cout].  Same arithmetic up to f32 reduction
# order; fwd and dX are the unchanged XLA convs.
USE_GEMM_STEM_DW = True  # measured on chip r5: bf16 54.6->53.6, f32
# 62.0->60.4 ms/step interleaved; fwd bit-identical (ledger)

_STEM_PAD = ((1, 2),) * 3


def _stem_dw_perm(ci: int) -> np.ndarray:
    """Rows of the (a1-major, a0-minor, ci) GEMM -> (kd, kh, kw, ci)."""
    perm = np.empty((4, 4, 4, ci), np.int32)
    for kd in range(4):
        for kh in range(4):
            for kw in range(4):
                row = (((kd // 2) * 2 + kh // 2) * 2 + kw // 2) * 8 + (
                    ((kd % 2) * 2 + kh % 2) * 2 + kw % 2)
                perm[kd, kh, kw] = row * ci + np.arange(ci)
    return perm.reshape(-1)


def _stem_dw_gemm(x, dy, wshape, wdtype):
    n, d, h, w, ci = x.shape
    d2, h2, w2 = dy.shape[1:4]
    co = dy.shape[-1]
    # high pad 3 = the conv's high pad 2 plus one alignment zero (never
    # read: max fine index touched is 2*(d2-1)+3 = d+1).
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (1, 3), (0, 0)))
    dp, hp, wp = (d + 4) // 2, (h + 4) // 2, (w + 4) // 2
    xe = xp.reshape(n, dp, 2, hp, 2, wp, 2, ci)
    xe = xe.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(n, dp, hp, wp, 8 * ci)
    parts = [
        jax.lax.slice(xe, (0, a1d, a1h, a1w, 0),
                      (n, a1d + d2, a1h + h2, a1w + w2, 8 * ci))
        for a1d in (0, 1) for a1h in (0, 1) for a1w in (0, 1)
    ]
    xs = jnp.concatenate(parts, axis=-1)  # (n, d2, h2, w2, 64*ci)
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)  # f64 stays f64
    dwf = jnp.einsum("ndhwc,ndhwo->co", xs, dy,
                     preferred_element_type=acc_dt)
    return dwf[_stem_dw_perm(ci)].reshape(wshape).astype(wdtype)


@jax.custom_vjp
def _stem_conv_raw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), _STEM_PAD, dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )


def _stem_conv_fwd(x, w):
    return _stem_conv_raw(x, w), (x, w)


def _stem_conv_bwd(res, dy):
    x, w = res

    def f(xx):
        return jax.lax.conv_general_dilated(
            xx, w, (2, 2, 2), _STEM_PAD, dimension_numbers=DN,
            preferred_element_type=x.dtype,
        )

    _, vjp_x = jax.vjp(f, x)  # dX: the standard XLA grad-conv
    (dx,) = vjp_x(dy)
    return dx, _stem_dw_gemm(x, dy, w.shape, w.dtype)


_stem_conv_raw.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def conv_k4s2_fine2packed(x, w):
    """fine->packed k4s2 conv; flag-gated GEMM filter-grad (above)."""
    w = w.astype(x.dtype)
    if USE_GEMM_STEM_DW:
        return _stem_conv_raw(x, w)
    return _conv(x, w, strides=(2, 2, 2), padding=list(_STEM_PAD))


def _axis_select_packed():
    """A[u, din, dout, t] = 1 iff fine tap t = 2(u-1)+din-dout+1 in [0,3)."""
    a = np.zeros((3, 2, 2, 3), np.float32)
    for u in range(3):
        for din in range(2):
            for dout in range(2):
                t = 2 * (u - 1) + din - dout + 1
                if 0 <= t < 3:
                    a[u, din, dout, t] = 1.0
    return a


def _axis_select_fine():
    """Identity: coarse tap u == fine tap t, no sub-position split."""
    a = np.zeros((3, 1, 1, 3), np.float32)
    for u in range(3):
        a[u, 0, 0, u] = 1.0
    return a


_AXIS_PACKED = _axis_select_packed()
_AXIS_FINE = _axis_select_fine()


def pack_k3_axes(w, axes):
    """(3,3,3,C,F) fine k3 SAME conv -> k3 conv on the per-axis-packed
    grid.  axes: bool triple (pack_d, pack_h, pack_w); P = 2**npacked.
    Output kernel (3,3,3, P*C, P*F), delta-major (axis deltas composed
    d-major over the PACKED axes), f-minor — matching space_to_depth
    restricted to those axes.  1/P-dense.  Pure-jnp (traced params ok)."""
    sel = [_AXIS_PACKED if p else _AXIS_FINE for p in axes]
    a0, a1, a2 = (jnp.asarray(s, w.dtype) for s in sel)
    c, f = w.shape[-2:]
    w3 = jnp.einsum("aAdt,bBeu,cCgv,tuvxy->abcABCxdegy", a0, a1, a2, w)
    p = int(np.prod([s.shape[1] for s in sel]))
    return w3.reshape(3, 3, 3, p * c, p * f)


# ---------------------------------------------------------------------------
# the forward
# ---------------------------------------------------------------------------


def _p(params, *path):
    node = params["params"]
    for k in path:
        node = node[k]
    return node


def _luconv_fine(x, p, rate=0.0, rng=None):
    w = p["ConvND_0"]["Conv_0"]
    y = _conv(x, w["kernel"]) + w["bias"].astype(x.dtype)
    y = gn_fine(y, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"])
    y = channel_dropout(y, rate, rng, tile=1)
    return jax.nn.relu(y)


def _luconv_packed(x, p, rate=0.0, rng=None, axes=(True, True, True)):
    """LUConv on packed activations: 1/P-dense k3-coarse conv on the
    per-axis-packed grid."""
    pk = 2 ** sum(axes)
    w = p["ConvND_0"]["Conv_0"]
    y = packed_k3_conv((x,), w["kernel"], axes)
    y = y + tile_channel_packed(w["bias"], pk).astype(x.dtype)
    y = gn_packed(y, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
                  p=pk)
    y = channel_dropout(y, rate, rng, tile=pk)
    return jax.nn.relu(y)


def _down_fine(x, p, n_convs, rate=0.0, rngs=None):
    rngs = rngs or [None] * (1 + n_convs)
    w = p["ConvND_0"]["Conv_0"]
    down = _conv(x, w["kernel"], strides=(2, 2, 2), padding="VALID")
    down = down + w["bias"].astype(x.dtype)
    down = gn_fine(down, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"])
    down = channel_dropout(down, rate, rngs[0], tile=1)
    down = jax.nn.relu(down)
    out = down
    for i in range(n_convs):
        out = _luconv_fine(out, p[f"LUConv_{i}"], rate, rngs[1 + i])
    return out + down


def _up_fine(x, skip, p, n_convs, rate=0.0, rngs=None):
    rngs = rngs or [None] * (2 + n_convs)
    wt = p["ConvTransposeND_0"]["ConvTranspose_0"]
    up = _conv_t(x, wt["kernel"]) + wt["bias"].astype(x.dtype)
    up = gn_fine(up, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"])
    up = channel_dropout(up, rate, rngs[0], tile=1)
    up = jax.nn.relu(up)
    cat = jnp.concatenate([up, skip], axis=-1)
    w1 = p["ConvND_0"]["Conv_0"]
    cat = _conv(cat, w1["kernel"]) + w1["bias"].astype(x.dtype)
    cat = gn_fine(cat, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"])
    cat = channel_dropout(cat, rate, rngs[1], tile=1)
    cat = jax.nn.relu(cat)
    out = cat
    for i in range(n_convs):
        out = _luconv_fine(out, p[f"LUConv_{i}"], rate, rngs[2 + i])
    return out + cat


# decoder-96 LUConv strategy: "k4s2" (depth-to-space then the k4s2 conv —
# needs the d2s) or "k3dense" (stay packed, k3-coarse with 1/8-dense
# weights).  Chosen by measurement; see benchmarks/packed_vnet_probe.py.
LUCONV96_MODE = "k3dense"

# how many finest levels run packed by default (1 = 96^3 level only;
# 2 also packs the 48^3 C32 level).  Chosen by measurement
# (benchmarks/packed_levels_probe.py): fwd27 bf16 136.6 -> 126.0 ms
# (lv2 wins), train 96^3 b1 ties (42.2 vs 42.3 ms).
PACKED_LEVELS_DEFAULT = 2


def pack_k3_to_k3_coarse(w):
    """(3,3,3,C,F) -> (3,3,3,8C,8F) fully-packed->packed k3 conv (1/8
    dense): W3[u,(delta',c),(delta,f)] = W[t,c,f] where t = 2(u-1) +
    delta' - delta lands in [0,3)."""
    return pack_k3_axes(w, (True, True, True))


# ---------------------------------------------------------------------------
# shift-stack execution of the packed k3: the same conv as pack_k3_axes but
# with the structural zeros removed at the XLA level.  Per packed axis, the
# 3-tap 1/2-dense coarse window collapses to a 2-tap 3/4-dense window once
# each input-delta channel group is shifted by its own delta: X'_din[Q] =
# x_din[Q - din] (a (din, 1-din) zero-pad, extent D+1), and
# y[P] = sum_v X'[P+v] W2[v] with W2[v,din,dout,t]: t = 2v - din - dout + 1
# in [0,3).  MAC cut: full8 1728 -> 512 CF (3.375x), part4 432 -> 192 CF
# (2.25x); every contraction stays a dense (2^n_packed * P*C)-deep GEMM with
# 128 channels on the lanes (the measured 118.7 TF/s k2 regime) instead of a
# dense coarse k3 that spends 3.375x the MACs on structural zeros (the
# 16.1 ms LUConv96 unit in the r4 fwd27 profile).
# ---------------------------------------------------------------------------


def _axis_select_shift():
    """A2[v, din, dout, t] = 1 iff t = 2v - din - dout + 1 in [0,3) — the
    2-tap window of the shifted input (u = v - din + 1 vs _axis_select_packed)."""
    a = np.zeros((2, 2, 2, 3), np.float32)
    for v in range(2):
        for din in range(2):
            for dout in range(2):
                t = 2 * v - din - dout + 1
                if 0 <= t < 3:
                    a[v, din, dout, t] = 1.0
    return a


_AXIS_SHIFT = _axis_select_shift()


def pack_k3_axes_shift(w, axes):
    """(3,3,3,C,F) fine k3 -> the shift-stack kernel: size 2 on packed
    axes, 3 on fine axes; channels (P*C, P*F) delta-major like
    pack_k3_axes.  Consumes shift_stack(x, axes) with VALID padding on
    packed axes, SAME on fine axes."""
    sel = [_AXIS_SHIFT if p else _AXIS_FINE for p in axes]
    a0, a1, a2 = (jnp.asarray(s, w.dtype) for s in sel)
    c, f = w.shape[-2:]
    w2 = jnp.einsum("aAdt,bBeu,cCgv,tuvxy->abcABCxdegy", a0, a1, a2, w)
    p = int(np.prod([s.shape[1] for s in sel]))
    ks = tuple(s.shape[0] for s in sel)
    return w2.reshape(*ks, p * c, p * f)


def shift_stack(x, axes):
    """(N, D, H, W, P*C) delta-major packed -> the per-delta shifted stack:
    channel group din gets a (din, 1-din) zero-pad on each packed axis
    (extent +1); fine axes untouched.

    Executed as one pad+select pass per packed axis — each pass is a
    full-lane-width elementwise kernel (two pads of the whole tensor
    combined by a static channel mask), which XLA fuses into a single
    read+write of the array.  Measured at the LUConv96 shape
    (benchmarks/shift_decomp_probe.py): the v1 form (per-group
    16-channel slice -> pad -> concat) ran 51.7 ms/iter (~25x off HBM
    bandwidth: every op a sub-lane-width copy); a whole-tensor
    pad-once + 8 slices + select chain 27.5 ms (slices of the shared
    padded array materialize as copies); this per-axis form 9.45 ms
    (three materializations) and fuses with the consuming conv to a
    13.56 ms unit vs 16.1 ms dense."""
    packed = [i for i, a in enumerate(axes) if a]
    n = len(packed)
    p = 2 ** n
    c = x.shape[-1] // p
    group = np.arange(x.shape[-1]) // c  # delta-major group id per channel
    out = x
    for j, ax_i in enumerate(packed):
        # packed-axis j holds bit (n-1-j) of the delta-major group id
        digit = (group >> (n - 1 - j)) & 1
        pad0 = [(0, 0)] * x.ndim
        pad0[1 + ax_i] = (0, 1)
        pad1 = [(0, 0)] * x.ndim
        pad1[1 + ax_i] = (1, 0)
        out = jnp.where(jnp.asarray(digit == 1),
                        jnp.pad(out, pad1), jnp.pad(out, pad0))
    return out


# Execute packed k3 convs via the shift-stack form (measured on chip —
# see BASELINE.md round-4 ledger) instead of the dense coarse k3.
USE_SHIFT_PACKED_K3 = False


def packed_k3_conv(parts, w_fine, axes, in_perm=None):
    """The packed k3 conv on `parts` (a tuple of delta-major packed
    tensors, channel-concatenated): dense coarse k3 or the shift-stack
    k2 form, by flag.  `in_perm` (optional) permutes the kernel's input
    rows from (delta, c)-major order onto the concat channel layout —
    the same permutation serves both forms (both emit delta-major rows).
    """
    if USE_SHIFT_PACKED_K3:
        w2 = pack_k3_axes_shift(w_fine, axes)
        if in_perm is not None:
            w2 = jnp.take(w2, in_perm, axis=3)
        xs = [shift_stack(t, axes) for t in parts]
        xs = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
        padding = [(0, 0) if a else (1, 1) for a in axes]
        return _conv(xs, w2, padding=padding)
    w3 = pack_k3_axes(w_fine, axes)
    if in_perm is not None:
        w3 = jnp.take(w3, in_perm, axis=3)
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return _conv(x, w3, padding="SAME")


def depth_to_space3d(x):
    """(N, D', H', W', 8C) -> (N, 2D', 2H', 2W', C), delta-major channels."""
    n, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(n, d, h, w, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(n, 2 * d, 2 * h, 2 * w, c)


def pack_head_1x1(w, bias, num_classes, f, p=8, layout="delta"):
    """Fine 1x1 head (f, K) -> packed block (p*f, p*K) + packed bias.

    layout="delta": output channel delta*K + k (delta-major, matching
    space_to_depth — required by depth_to_space3d and the packed-grid
    loss).  layout="class": output channel k*p + delta (CLASS-major) so
    the per-delta softmax becomes contiguous minor-dim slice arithmetic
    — the r4 fwd27 profile showed ~10 ms/rep of T(2,128) transposed
    layouts from the (...,p,K)-reshape softmax on delta-major logits."""
    wp = jnp.zeros((1, 1, 1, p * f, p * num_classes), w.dtype)
    for dflat in range(p):
        for k in range(num_classes):
            col = k * p + dflat if layout == "class" else dflat * num_classes + k
            wp = wp.at[0, 0, 0, dflat * f:(dflat + 1) * f, col].set(w[:, k])
    bp = (
        jnp.repeat(bias, p) if layout == "class"
        else jnp.tile(bias, p)
    )
    return wp, bp


def packed_softmax(logitsp, num_classes, p=8, layout="delta"):
    """Per-delta softmax over classes on packed logits.

    layout="class" ([k0: deltas 0..p-1, k1: ...]) computes it with
    contiguous channel slices only — no (..., p, K) reshape, so no
    transposed small-minor-dim layouts appear in the program.
    layout="delta" keeps the original reshape form (needed where the
    delta-major channel order is load-bearing downstream)."""
    if num_classes == 1:
        return jax.nn.sigmoid(logitsp)
    if layout == "class":
        parts = [
            logitsp[..., k * p:(k + 1) * p] for k in range(num_classes)
        ]
        m = parts[0]
        for q in parts[1:]:
            m = jnp.maximum(m, q)
        exps = [jnp.exp(q - m) for q in parts]
        s = exps[0]
        for e in exps[1:]:
            s = s + e
        inv = 1.0 / s
        return jnp.concatenate([e * inv for e in exps], axis=-1)
    shp = logitsp.shape
    return jax.nn.softmax(
        logitsp.reshape(shp[:-1] + (p, num_classes)), axis=-1
    ).reshape(shp)


def packed_class_to_delta(x, num_classes, p=8):
    """Class-major packed channels (k*p + delta) -> delta-major
    (delta*K + k).  One transpose — intended for per-VOLUME use (e.g.
    before depth_to_space3d), not per-patch."""
    shp = x.shape
    return (
        x.reshape(shp[:-1] + (num_classes, p))
        .swapaxes(-1, -2)
        .reshape(shp[:-1] + (p * num_classes,))
    )


def packed_argmax(probs, num_classes, p=8, layout="delta"):
    """Per-delta argmax over classes on packed probs -> (..., p) uint8.

    In the class-major layout the argmax is running slice compares on
    contiguous p-channel groups — no reshape at all (for K=2 a single
    greater-than).  Tie-breaking matches jnp.argmax (first max wins).

    num_classes >= 2 is argmax, which is monotone-invariant — LOGITS are
    fine.  num_classes == 1 thresholds at 0.5 and therefore requires
    sigmoid PROBABILITIES (on raw logits the equivalent threshold would
    be 0.0); callers taking the logits shortcut (e.g. bench.py's
    whole-volume path) must keep K >= 2."""
    shp = probs.shape
    if layout == "class":
        if num_classes == 1:
            return (probs[..., :p] > 0.5).astype(jnp.uint8)
        best = probs[..., :p]
        idx = jnp.zeros(shp[:-1] + (p,), jnp.uint8)
        for k in range(1, num_classes):
            cand = probs[..., k * p:(k + 1) * p]
            take = cand > best
            best = jnp.maximum(best, cand)
            idx = jnp.where(take, jnp.uint8(k), idx)
        return idx
    grouped = probs.reshape(shp[:-1] + (p, num_classes))
    if num_classes == 1:
        return (grouped[..., 0] > 0.5).astype(jnp.uint8)
    return jnp.argmax(grouped, axis=-1).astype(jnp.uint8)


def packed_vnet3d_probs(params, x, num_classes=2, features=16,
                        return_packed=False, packed_levels=None,
                        packed_layout="delta"):
    """Inference wrapper around packed_vnet3d_apply: probs only."""
    _, probs = packed_vnet3d_apply(
        params, x, num_classes=num_classes, features=features,
        return_packed=return_packed, packed_levels=packed_levels,
        packed_layout=packed_layout,
    )
    return probs


def packed_vnet3d_apply(params, x, *, num_classes=2, features=16,
                        dropout: float = 0.2, train: bool = False,
                        rng=None, return_packed=False,
                        packed_levels=None, packed_layout="delta"):
    """Exact VNet3d forward with the finest level(s) executed packed.

    `params`: the PLAIN VNet(ndim=3) param pytree.  `x`: (N, D, H, W, 1)
    with D,H,W divisible by 32.  Returns (logits, probs) (N, D, H, W, K)
    — or, with return_packed=True, packed (N, D/2, H/2, W/2, 8K)
    (delta-major) so callers (sliding-window merge, packed losses) can
    stay packed.  train=True + rng enables ChannelDropout at the same
    sites as the flax model (nn/layers.py InputTransition/DownTransition/
    UpTransition/LUConv); the 8 delta copies of a fine channel share one
    mask, preserving fine-domain Dropout3d semantics exactly.

    packed_levels: 1 packs the finest (96^3-scale C16) level; 2 also
    packs the DownTransition_0 / UpTransition_2 (48^3-scale C32) level,
    whose conv+GN units and lane-starved elementwise ops were the
    remaining wall in the r3 packed fwd27 profile.

    packed_layout ("delta" | "class", return_packed=True only): channel
    order of the returned packed logits/probs.  "class" emits class-major
    channels (k*8 + delta) so the softmax runs reshape-free (see
    pack_head_1x1) — the sliding-window merge accepts either via its own
    packed_layout flag.  The fine-domain return path always uses delta
    internally (depth_to_space3d requires it).
    """
    if packed_levels is None:
        packed_levels = PACKED_LEVELS_DEFAULT  # resolved at call time
    f = features
    rate = dropout if train else 0.0
    rng_ctr = [0]

    def take_rng():
        if rate == 0.0 or rng is None:
            return None
        r = jax.random.fold_in(rng, rng_ctr[0])
        rng_ctr[0] += 1
        return r

    pit = _p(params, "InputTransition_0")

    # ---- InputTransition, packed ----
    wa = pit["ConvND_0"]["Conv_0"]
    wb = pit["ConvND_1"]["Conv_0"]
    a = conv_k4s2_fine2packed(x, pack_k3_to_k4s2(wa["kernel"]))
    a = a + tile_channel_packed(wa["bias"]).astype(x.dtype)
    b = _conv(x, pack_k1_to_k2s2(wb["kernel"]), strides=(2, 2, 2),
              padding="VALID")
    b = b + tile_channel_packed(wb["bias"]).astype(x.dtype)
    gs, gb = pit["GroupNorm_0"]["scale"], pit["GroupNorm_0"]["bias"]
    a = jax.nn.relu(channel_dropout(gn_packed(a, gs, gb), rate, take_rng(), 8))
    b = jax.nn.relu(channel_dropout(gn_packed(b, gs, gb), rate, take_rng(), 8))
    out16p = a + b  # (N, D/2, H/2, W/2, 128) — the packed skip

    # ---- DownTransition_0 entry (48^3-scale C32 level) ----
    pdt = _p(params, "DownTransition_0")
    wd = pdt["ConvND_0"]["Conv_0"]
    if packed_levels >= 2:
        # k2s2 down, full8 (A) -> (H,W)-part4 (B): 2x less conv
        # redundancy at the level's k3s (partial_pack_probe2.py)
        down32p = _conv(out16p, pack_down_k2s2_full8_to_part4(wd["kernel"]),
                        strides=(1, 2, 2), padding="VALID")
        down32p = down32p + tile_channel_packed(wd["bias"], 4).astype(x.dtype)
        down32p = gn_packed(down32p, pdt["GroupNorm_0"]["scale"],
                            pdt["GroupNorm_0"]["bias"], p=4)
        down32p = channel_dropout(down32p, rate, take_rng(), tile=4)
        down32p = jax.nn.relu(down32p)
        out32p = down32p
        for i in range(2):
            out32p = _luconv_packed(out32p, pdt[f"LUConv_{i}"], rate,
                                    take_rng(), axes=(False, True, True))
        out32p = out32p + down32p
        # DownTransition_1 entry: k2s2 fine->fine consuming part4 input
        pdt1 = _p(params, "DownTransition_1")
        wd1 = pdt1["ConvND_0"]["Conv_0"]
        down64 = _conv(out32p, pack_down_k2s2_part4_to_fine(wd1["kernel"]),
                       strides=(2, 1, 1), padding="VALID")
        down64 = down64 + wd1["bias"].astype(x.dtype)
        down64 = gn_fine(down64, pdt1["GroupNorm_0"]["scale"],
                         pdt1["GroupNorm_0"]["bias"])
        down64 = channel_dropout(down64, rate, take_rng(), tile=1)
        down64 = jax.nn.relu(down64)
        out64 = down64
        for i in range(3):
            out64 = _luconv_fine(out64, pdt1[f"LUConv_{i}"], rate, take_rng())
        out64 = out64 + down64
    else:
        down32 = _conv(out16p, pack_down_k2s2_to_1x1(wd["kernel"]),
                       padding="VALID")
        down32 = down32 + wd["bias"].astype(x.dtype)
        down32 = gn_fine(down32, pdt["GroupNorm_0"]["scale"],
                         pdt["GroupNorm_0"]["bias"])
        down32 = channel_dropout(down32, rate, take_rng(), tile=1)
        down32 = jax.nn.relu(down32)
        out32 = down32
        for i in range(2):
            out32 = _luconv_fine(out32, pdt[f"LUConv_{i}"], rate, take_rng())
        out32 = out32 + down32

    # ---- plain levels (already near-ceiling) ----
    def rngs(k):
        return [take_rng() for _ in range(k)]

    if packed_levels < 2:
        out64 = _down_fine(out32, _p(params, "DownTransition_1"), 3, rate,
                           rngs(4))
    out128 = _down_fine(out64, _p(params, "DownTransition_2"), 3, rate, rngs(4))
    out256 = _down_fine(out128, _p(params, "DownTransition_3"), 3, rate, rngs(4))
    up = _up_fine(out256, out128, _p(params, "UpTransition_0"), 3, rate, rngs(5))
    up = _up_fine(up, out64, _p(params, "UpTransition_1"), 3, rate, rngs(5))

    # ---- UpTransition_2 (48^3-scale C32 level) ----
    if packed_levels >= 2:
        put2 = _p(params, "UpTransition_2")
        wt2 = put2["ConvTransposeND_0"]["ConvTranspose_0"]
        up48p = _conv_t(up, pack_transpose_k2s2_fine_to_part4(wt2["kernel"]),
                        strides=(2, 1, 1))
        up48p = up48p + tile_channel_packed(wt2["bias"], 4).astype(x.dtype)
        up48p = jax.nn.relu(channel_dropout(
            gn_packed(up48p, put2["GroupNorm_0"]["scale"],
                      put2["GroupNorm_0"]["bias"], p=4),
            rate, take_rng(), 4,
        ))
        wsq2 = put2["ConvND_0"]["Conv_0"]["kernel"][0, 0, 0]  # (4f, 2f)
        sq2 = block_diag_1x1_packed(
            None, (wsq2[:2 * f], wsq2[2 * f:]), p=4
        )
        cat2 = _conv(jnp.concatenate([up48p, out32p], axis=-1), sq2,
                     padding="VALID")
        cat2 = cat2 + tile_channel_packed(
            put2["ConvND_0"]["Conv_0"]["bias"], 4
        ).astype(x.dtype)
        cat2 = jax.nn.relu(channel_dropout(
            gn_packed(cat2, put2["GroupNorm_1"]["scale"],
                      put2["GroupNorm_1"]["bias"], p=4),
            rate, take_rng(), 4,
        ))
        lu2 = cat2
        for i in range(2):
            lu2 = _luconv_packed(lu2, put2[f"LUConv_{i}"], rate, take_rng(),
                                 axes=(False, True, True))
        up48p = lu2 + cat2
    else:
        up48 = _up_fine(up, out32, _p(params, "UpTransition_2"), 2, rate,
                        rngs(4))

    # ---- UpTransition_3 (96^3-scale level), packed ----
    put = _p(params, "UpTransition_3")
    wt = put["ConvTransposeND_0"]["ConvTranspose_0"]
    if packed_levels >= 2:
        # transpose k2s2, (H,W)-part4 input -> full8-packed output
        upp = _conv_t(up48p, pack_transpose_k2s2_part4_to_full8(wt["kernel"]),
                      strides=(1, 2, 2))
    else:
        upp = _conv(up48, pack_transpose_k2s2_to_1x1(wt["kernel"]),
                    padding="VALID")
    upp = upp + tile_channel_packed(wt["bias"]).astype(x.dtype)
    upp = jax.nn.relu(channel_dropout(
        gn_packed(upp, put["GroupNorm_0"]["scale"], put["GroupNorm_0"]["bias"]),
        rate, take_rng(), 8,
    ))
    # concat(up, skip) then the 1x1 squeeze, fused: build the squeeze
    # weight for the [upp(delta-major f16) ; out16p(delta-major f16)]
    # packed-channel order directly — no explicit permute
    wsq = put["ConvND_0"]["Conv_0"]["kernel"][0, 0, 0]  # (2f, f)
    w_up, w_skip = wsq[:f], wsq[f:]
    wsq_packed = jnp.zeros((1, 1, 1, 16 * f, 8 * f), wsq.dtype)
    for dflat in range(8):
        wsq_packed = wsq_packed.at[
            0, 0, 0, dflat * f:(dflat + 1) * f, dflat * f:(dflat + 1) * f
        ].set(w_up)
        wsq_packed = wsq_packed.at[
            0, 0, 0, 8 * f + dflat * f:8 * f + (dflat + 1) * f,
            dflat * f:(dflat + 1) * f,
        ].set(w_skip)
    catp = _conv(jnp.concatenate([upp, out16p], axis=-1), wsq_packed,
                 padding="VALID")
    catp = catp + tile_channel_packed(
        put["ConvND_0"]["Conv_0"]["bias"]
    ).astype(x.dtype)
    catp = jax.nn.relu(channel_dropout(
        gn_packed(catp, put["GroupNorm_1"]["scale"], put["GroupNorm_1"]["bias"]),
        rate, take_rng(), 8,
    ))
    # LUConv_0 at the 96^3 level
    plu = put["LUConv_0"]
    wl = plu["ConvND_0"]["Conv_0"]
    if LUCONV96_MODE == "k3dense":
        lu = packed_k3_conv((catp,), wl["kernel"], (True, True, True))
    else:  # d2s + k4s2
        cat_fine = depth_to_space3d(catp)
        lu = conv_k4s2_fine2packed(cat_fine, pack_k3_to_k4s2(wl["kernel"]))
    lu = lu + tile_channel_packed(wl["bias"]).astype(x.dtype)
    lu = jax.nn.relu(channel_dropout(
        gn_packed(lu, plu["GroupNorm_0"]["scale"], plu["GroupNorm_0"]["bias"]),
        rate, take_rng(), 8,
    ))
    outp = lu + catp

    # ---- head, packed ----
    layout = packed_layout if return_packed else "delta"
    ph = _p(params, "OutputHead_0")["ConvND_0"]["Conv_0"]
    wh_packed, bh_packed = pack_head_1x1(
        ph["kernel"][0, 0, 0], ph["bias"], num_classes, f, layout=layout
    )
    logitsp = _conv(outp, wh_packed, padding="VALID")
    logitsp = logitsp + bh_packed.astype(x.dtype)
    probsp = packed_softmax(logitsp, num_classes, layout=layout)
    if return_packed:
        return logitsp, probsp
    return depth_to_space3d(logitsp), depth_to_space3d(probsp)
