"""Whole-volume 3D inference with geometry round-trip.

Capability parity with the reference inference stack (SURVEY.md §3.2,
`/root/reference/model/modelUnet.py:976-996`): resample the volume to the
network's fixed size (linear), normalize, jitted forward, threshold/argmax,
resample the mask back to the original size (nearest), and re-stamp the
original origin/spacing/direction so the written mask overlays the source
image exactly.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from tpuseg.data.geometry import Volume, resample_to_size, resample_to_spacing
from tpuseg.data.normalize import percentile_zscore, truncate_and_normalize
from tpuseg.infer.sliding_window import probs_to_mask, sliding_window_inference


def infer_volume(
    vol: Volume,
    forward_fn: Callable,  # (1, D, H, W, C) -> (1, D, H, W, num_classes) probs
    new_size_xyz: Sequence[int],
    num_classes: int,
    normalizer: Callable = percentile_zscore,
    threshold: float = 0.5,
) -> Volume:
    """`modelUnet.py:976` inference(): fixed-size resample → normalize →
    forward → mask → resample back (NN) → original geometry."""
    resized = resample_to_size(vol, new_size_xyz, "linear")
    arr = normalizer(resized.array)  # (D,H,W)
    batch = arr[None, ..., None].astype(np.float32)
    probs = np.asarray(forward_fn(batch))[0]  # (D,H,W,C)
    mask = probs_to_mask(probs, threshold)

    mask_vol = Volume(mask.astype(np.uint8))
    mask_vol.copy_geometry_from(resized)
    final = resample_to_size(mask_vol, vol.GetSize(), "nearest")
    final.copy_geometry_from(vol)
    return final


def hu_code_volume(arr: np.ndarray, upper: float, lower: float, method: str):
    """Code an HU volume for 1-byte upload: truncate to [lower, upper],
    quantize to uint8 (1 HU/level when the window spans <= 255, else
    span/255 per level), and fold the 'meanstd'/'maxmin' normalization of
    `truncate_and_normalize` into a device-side affine.

    Returns ``(codes_uint8, (scale, offset))`` with
    ``network_input = codes * scale + offset``.  Exact for integer HU
    values (quantization error <= step/2 for interpolated ones)."""
    lo, hi = min(lower, upper), max(lower, upper)
    trunc = np.clip(np.asarray(arr, np.float32), lo, hi)
    span = hi - lo
    step = 1.0 if span <= 255 else span / 255.0
    codes = np.clip(np.round((trunc - lo) / step), 0, 255).astype(np.uint8)
    if method == "meanstd":
        mean, std = float(trunc.mean()), float(trunc.std()) or 1.0
        dequant = (step / std, (lo - mean) / std)
    elif method == "maxmin":
        tmin, rng = float(trunc.min()), float(trunc.max() - trunc.min()) or 1.0
        dequant = (step / rng, (lo - tmin) / rng)
    else:
        raise ValueError(method)
    return codes, dequant


_DEVICE_INFER_CACHE: dict = {}


def infer_volume_device(
    vol: Volume,
    model,
    params,
    new_size_xyz: Sequence[int],
    num_classes: int,
    normalizer: str = "percentile",
    hu_window: Optional[tuple] = None,
    threshold: float = 0.5,
) -> Volume:
    """Whole-volume inference with the ENTIRE pipeline in one jit:
    device resize (ITK semantics) → normalize → forward → threshold/argmax
    → nearest resize back — the host only ships the raw volume up and the
    uint8 mask down.  Compiled per (in_shape, out_size) bucket."""
    from tpuseg.kernels.normalize import (
        percentile_zscore_device,
        truncate_and_normalize_device,
    )
    from tpuseg.kernels.resample import resize_volume_device

    sx, sy, sz = new_size_xyz
    in_shape = vol.array.shape
    # key covers everything baked into the jitted closure: model config
    # (repr is the full flax dataclass spec — stable, unlike id() which can
    # be reused after GC), shapes, normalizer, num_classes and threshold
    key = (
        repr(model), in_shape, tuple(new_size_xyz), normalizer, hu_window,
        int(num_classes), float(threshold),
    )
    if key not in _DEVICE_INFER_CACHE:
        import jax

        @jax.jit
        def run(params, raw):
            x = resize_volume_device(raw, (sz, sy, sx), "linear")
            if normalizer == "percentile":
                x = percentile_zscore_device(x)
            elif normalizer == "hu":
                up, lo, method = hu_window
                x = truncate_and_normalize_device(x, up, lo, method)
            _, probs = model.apply(params, x[None, ..., None])
            if num_classes == 1:
                mask = (probs[0, ..., 0] > threshold).astype(np.uint8)
            else:
                import jax.numpy as jnp

                mask = jnp.argmax(probs[0], axis=-1).astype(np.uint8)
            return resize_volume_device(
                mask.astype(np.float32), in_shape, "nearest"
            ).astype(np.uint8)

        _DEVICE_INFER_CACHE[key] = run

    mask = np.asarray(_DEVICE_INFER_CACHE[key](params, vol.array.astype(np.float32)))
    out = Volume(mask)
    out.copy_geometry_from(vol)
    return out


def infer_volume_patched(
    vol: Volume,
    apply_fn: Callable,  # (N, *patch, C) -> (N, *patch, num_classes) probs
    patch_dhw: Sequence[int],
    num_classes: int,
    new_spacing_xyz: Optional[Sequence[float]] = None,
    hu_window: Optional[tuple] = None,  # (upper, lower, method)
    batch_size: int = 8,
    overlap: float = 0.5,
    threshold: float = 0.5,
    transfer_dtype: Optional[str] = None,
    pack_mask: bool = False,
    packed_apply: bool = False,
    packed_layout: str = "delta",
) -> Volume:
    """`modelUnet.py:707` inference_patch(): spacing resample → HU window
    normalize → batched sliding-window (intended 50% overlap, weighted
    merge) → mask → resample back to original spacing/shape.

    ``packed_apply=True`` declares that ``apply_fn`` returns
    space-to-depth PACKED probabilities (models/vnet_packed.py layout);
    the merge and argmax then stay in the 128-lane-friendly packed
    domain (the round-3 compute lever, see sliding_window.py).

    ``transfer_dtype="uint8"`` with an HU window whose span fits 255
    levels uploads the truncated volume as 1-byte HU codes and folds the
    meanstd/maxmin normalization into an on-device affine; the upload is
    4x smaller than f32.  Precision: coding is EXACT (bit-lossless) for
    integer-HU voxel values — i.e. when no resample precedes it or the
    resample is nearest-neighbor; after a LINEAR spacing resample the
    interpolated voxels are no longer integers and the coding quantizes
    them at <= step/2 HU (step = 1 for windows spanning <= 255 levels,
    span/255 otherwise) — still at least as fine as the bf16 upload's
    window-relative step.  ``transfer_dtype="bfloat16"`` halves the
    upload of the host-normalized volume instead.
    """
    work = (
        resample_to_spacing(vol, new_spacing_xyz, "linear")
        if new_spacing_xyz is not None
        else vol
    )
    arr = work.array.astype(np.float32)
    dequant = None
    if hu_window is not None:
        upper, lower, method = hu_window
        if transfer_dtype == "uint8":
            arr, dequant = hu_code_volume(arr, upper, lower, method)
            transfer_dtype = None
        else:
            arr = truncate_and_normalize(arr, upper, lower, method)
    mask = sliding_window_inference(
        arr, patch_dhw, apply_fn, num_classes, batch_size, overlap,
        return_mask=True, transfer_dtype=transfer_dtype,
        pack_mask=pack_mask, dequant=dequant, packed_apply=packed_apply,
        packed_layout=packed_layout,
    )
    mask_vol = Volume(mask.astype(np.uint8))
    mask_vol.copy_geometry_from(work)
    if new_spacing_xyz is not None:
        final = resample_to_size(mask_vol, vol.GetSize(), "nearest")
        final.copy_geometry_from(vol)
        return final
    return mask_vol
