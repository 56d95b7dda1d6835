"""Import reference PyTorch checkpoints (.pth state_dicts) into tpuseg.

Migration path for users of the reference framework: its Model classes
save bare ``state_dict()`` files (`/root/reference/model/modelUnet.py:943`)
with the module names of `networks/Unet{2,3}d.py` / `networks/VNet{2,3}d.py`.
These functions translate such a state_dict into the flax parameter pytree
of the equivalent tpuseg model (`tpuseg.models.unet.UNet` /
`tpuseg.models.vnet.VNet`), converting layouts:

  * Conv(Transpose)Nd weights: torch ``(O, I, *k)`` / ``(I, O, *k)`` →
    channels-last flax ``(*k, I, O)`` (transpose convs additionally flip
    their spatial taps — tpuseg's ConvTransposeND convention, pinned by
    tests/test_torch_parity.py);
  * GroupNorm ``weight``/``bias`` → ``scale``/``bias``.

The reference's UpTransition reuses ONE GroupNorm module for both the
up-conv output and the 1x1 squeeze output (`VNet3d.py:64,73-74` — shared
parameters); tpuseg uses two GN instances, so the shared tensor is loaded
into both (identical math: GN has no running state).

Forward parity of an imported checkpoint is pinned by
tests/test_torch_import.py.  Residual difference is ~1e-4 on logits and
comes from the GroupNorm epsilon (torch defaults to 1e-5, flax to 1e-6);
it cannot be folded into the weights (it sits under the data-dependent
variance) and is far below segmentation sensitivity.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return np.asarray(t, np.float32)
    return np.asarray(t.detach().cpu().numpy(), np.float32)  # torch tensor


class _TrackedDict(dict):
    """Records which keys a converter consumed so unmapped tensors in the
    source state_dict are detected instead of silently dropped."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _check_all_consumed(sd: "_TrackedDict", arch: str) -> None:
    leftover = sorted(set(sd) - sd.consumed)
    if leftover:
        raise ValueError(
            f"state_dict has {len(leftover)} tensors the {arch} importer does "
            f"not map (a structural mismatch would silently produce wrong "
            f"outputs): {leftover[:8]}{'...' if len(leftover) > 8 else ''}"
        )


def _conv_kernel(w) -> np.ndarray:
    """torch Conv (O, I, *k) -> flax (*k, I, O)."""
    w = _np(w)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _tconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose (I, O, *k) -> ConvTransposeND (*k, I, O),
    spatial taps flipped (see tests/test_torch_parity.py)."""
    w = _np(w)
    nd = w.ndim - 2
    k = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    return k[(slice(None, None, -1),) * nd].copy()


def _gn(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _conv(sd, prefix, bias=True):
    out = {"kernel": _conv_kernel(sd[prefix + ".weight"])}
    if bias:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def unet_params_from_torch(state_dict: Mapping, levels: int = 4) -> dict:
    """Reference UNet2d/UNet3d state_dict -> tpuseg UNet params pytree.

    Key map (`networks/Unet3d.py:16-34,64-86`): encoder{i}.enc{i}conv{1,2}/
    norm{1,2} -> ConvBlock_{i-1}; bottleneck -> ConvBlock_{levels};
    upconv{l} -> ConvTransposeND_{levels-l}; decoder{l} ->
    ConvBlock_{2*levels+1-l}; conv -> OutputHead_0."""
    sd = _TrackedDict(state_dict)
    params: dict = {}

    def block(tname):
        return {
            "ConvND_0": {"Conv_0": {"kernel": _conv_kernel(sd[f"{tname}conv1.weight"])}},
            "GroupNorm_0": _gn(sd, f"{tname}norm1"),
            "ConvND_1": {"Conv_0": {"kernel": _conv_kernel(sd[f"{tname}conv2.weight"])}},
            "GroupNorm_1": _gn(sd, f"{tname}norm2"),
        }

    for i in range(levels):
        params[f"ConvBlock_{i}"] = block(f"encoder{i + 1}.enc{i + 1}")
    params[f"ConvBlock_{levels}"] = block("bottleneck.bottleneck")
    for j in range(levels):
        l = levels - j  # upconv4..1 / decoder4..1
        params[f"ConvTransposeND_{j}"] = {
            "ConvTranspose_0": {
                "kernel": _tconv_kernel(sd[f"upconv{l}.weight"]),
                "bias": _np(sd[f"upconv{l}.bias"]),
            }
        }
        params[f"ConvBlock_{levels + 1 + j}"] = block(f"decoder{l}.dec{l}")
    params["OutputHead_0"] = {"ConvND_0": {"Conv_0": _conv(sd, "conv")}}
    _check_all_consumed(sd, "unet")
    return params


def vnet_params_from_torch(state_dict: Mapping) -> dict:
    """Reference VNet2d/VNet3d state_dict -> tpuseg VNet params pytree.

    Key map (`networks/VNet3d.py:102-127`): in_tr -> InputTransition_0;
    down_tr{32,64,128,256} -> DownTransition_{0..3}; up_tr{256,128,64,32}
    -> UpTransition_{0..3}; out_tr.conv -> OutputHead_0."""
    sd = _TrackedDict(state_dict)
    params: dict = {}

    def luconvs(tname, n):
        return {
            f"LUConv_{j}": {
                "ConvND_0": {"Conv_0": _conv(sd, f"{tname}.ops.{j}.conv1")},
                "GroupNorm_0": _gn(sd, f"{tname}.ops.{j}.bn1"),
            }
            for j in range(n)
        }

    params["InputTransition_0"] = {
        "ConvND_0": {"Conv_0": _conv(sd, "in_tr.conv1")},
        "ConvND_1": {"Conv_0": _conv(sd, "in_tr.conv2")},
        "GroupNorm_0": _gn(sd, "in_tr.bn1"),
    }
    for i, (tag, n) in enumerate((("32", 2), ("64", 3), ("128", 3), ("256", 3))):
        t = f"down_tr{tag}"
        params[f"DownTransition_{i}"] = {
            "ConvND_0": {"Conv_0": _conv(sd, f"{t}.down_conv")},
            "GroupNorm_0": _gn(sd, f"{t}.bn1"),
            **luconvs(t, n),
        }
    for i, (tag, n) in enumerate((("256", 3), ("128", 3), ("64", 2), ("32", 1))):
        t = f"up_tr{tag}"
        shared_bn = _gn(sd, f"{t}.bn")
        params[f"UpTransition_{i}"] = {
            "ConvTransposeND_0": {
                "ConvTranspose_0": {
                    "kernel": _tconv_kernel(sd[f"{t}.up_conv.weight"]),
                    "bias": _np(sd[f"{t}.up_conv.bias"]),
                }
            },
            # the reference reuses one GN for up-conv AND squeeze outputs
            "GroupNorm_0": dict(shared_bn),
            "ConvND_0": {"Conv_0": _conv(sd, f"{t}.conv")},
            "GroupNorm_1": dict(shared_bn),
            **luconvs(t, n),
        }
    params["OutputHead_0"] = {"ConvND_0": {"Conv_0": _conv(sd, "out_tr.conv")}}
    _check_all_consumed(sd, "vnet")
    return params


def resnet_params_from_torch(state_dict: Mapping) -> dict:
    """Reference ResNet2d/ResNet3d state_dict -> tpuseg ResNetClassifier
    params pytree (`networks/ResNet2d.py:74-119`: in_tr + down_tr{32..256}
    encoder, then fc_layers = Linear(256,128) / ReLU / Linear(128, ncls))."""
    sd = _TrackedDict(state_dict)
    params: dict = {}
    params["InputTransition_0"] = {
        "ConvND_0": {"Conv_0": _conv(sd, "in_tr.conv1")},
        "ConvND_1": {"Conv_0": _conv(sd, "in_tr.conv2")},
        "GroupNorm_0": _gn(sd, "in_tr.bn1"),
    }
    for i, (tag, n) in enumerate((("32", 2), ("64", 3), ("128", 3), ("256", 3))):
        t = f"down_tr{tag}"
        params[f"DownTransition_{i}"] = {
            "ConvND_0": {"Conv_0": _conv(sd, f"{t}.down_conv")},
            "GroupNorm_0": _gn(sd, f"{t}.bn1"),
            **{
                f"LUConv_{j}": {
                    "ConvND_0": {"Conv_0": _conv(sd, f"{t}.ops.{j}.conv1")},
                    "GroupNorm_0": _gn(sd, f"{t}.ops.{j}.bn1"),
                }
                for j in range(n)
            },
        }
    # torch Linear weight (out, in) -> flax Dense kernel (in, out)
    for di, li in ((0, 0), (1, 2)):
        params[f"Dense_{di}"] = {
            "kernel": _np(sd[f"fc_layers.{li}.weight"]).T,
            "bias": _np(sd[f"fc_layers.{li}.bias"]),
        }
    _check_all_consumed(sd, "resnet")
    return params


def pix2pix_generator_params_from_torch(state_dict: Mapping) -> dict:
    """Reference pix2pix GeneratorUNet2d state_dict -> tpuseg
    GeneratorUNet2d params (`modelPixel2PixelGAN.py:112-170`).  The
    reference's InstanceNorm2d layers are affine-free (torch default), so
    only conv weights exist.  (The discriminator is a tpuseg re-design and
    not state_dict-compatible; the generator is the deployable artifact.)"""
    sd = _TrackedDict(state_dict)
    params: dict = {
        "_InputTr_0": {
            "ConvND_0": {"Conv_0": _conv(sd, "in_tr.conv1")},
            "ConvND_1": {"Conv_0": _conv(sd, "in_tr.conv2")},
        }
    }

    def luconvs(tname, n):
        return {
            f"_LUConvIN_{j}": {
                "ConvND_0": {"Conv_0": _conv(sd, f"{tname}.ops.{j}.conv1")}
            }
            for j in range(n)
        }

    for i, (tag, n) in enumerate((("32", 2), ("64", 3), ("128", 3), ("256", 3))):
        t = f"down_tr{tag}"
        params[f"_DownTr_{i}"] = {
            "ConvND_0": {"Conv_0": _conv(sd, f"{t}.down_conv")},
            **luconvs(t, n),
        }
    for i, (tag, n) in enumerate((("256", 3), ("128", 3), ("64", 2), ("32", 1))):
        t = f"up_tr{tag}"
        params[f"_UpTr_{i}"] = {
            "ConvTransposeND_0": {
                "ConvTranspose_0": {
                    "kernel": _tconv_kernel(sd[f"{t}.up_conv.weight"]),
                    "bias": _np(sd[f"{t}.up_conv.bias"]),
                }
            },
            "ConvND_0": {"Conv_0": _conv(sd, f"{t}.conv")},
            **luconvs(t, n),
        }
    params["ConvND_0"] = {"Conv_0": _conv(sd, "out_tr.conv")}
    _check_all_consumed(sd, "pix2pix_generator")
    return params


_CONVERTERS = {
    "unet": unet_params_from_torch,
    "vnet": vnet_params_from_torch,
    "resnet": resnet_params_from_torch,
    "pix2pix_generator": pix2pix_generator_params_from_torch,
}


def params_from_torch_checkpoint(path_or_state_dict, arch: str) -> dict:
    """Load a reference ``.pth`` (path or already-loaded state_dict) into a
    tpuseg params pytree.  ``arch`` is one of ``"unet"``, ``"vnet"``,
    ``"resnet"``, ``"pix2pix_generator"`` (2d and 3d share names).  Wrap as
    ``{"params": ...}`` before ``model.apply``."""
    sd = path_or_state_dict
    if isinstance(sd, (str, bytes)) or hasattr(sd, "__fspath__"):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if arch not in _CONVERTERS:
        raise ValueError(f"arch must be one of {sorted(_CONVERTERS)}, got {arch!r}")
    return _CONVERTERS[arch](sd)


# ---------------------------------------------------------------- export
# The inverse direction: tpuseg-trained parameters -> a reference-named
# torch state_dict, so weights trained here can be deployed by any
# torch-side tooling built around the reference framework.

def _conv_kernel_inv(k) -> np.ndarray:
    """flax (*k, I, O) -> torch Conv (O, I, *k)."""
    k = np.asarray(k, np.float32)
    nd = k.ndim - 2
    return np.transpose(k, (nd + 1, nd) + tuple(range(nd)))


def _tconv_kernel_inv(k) -> np.ndarray:
    """ConvTransposeND (*k, I, O) -> torch ConvTranspose (I, O, *k)."""
    k = np.asarray(k, np.float32)
    nd = k.ndim - 2
    flipped = k[(slice(None, None, -1),) * nd]
    return np.transpose(flipped, (nd, nd + 1) + tuple(range(nd))).copy()


def _emit_conv(out, prefix, node, bias=True):
    out[prefix + ".weight"] = _conv_kernel_inv(node["Conv_0"]["kernel"])
    if bias:
        out[prefix + ".bias"] = np.asarray(node["Conv_0"]["bias"], np.float32)


def _emit_gn(out, prefix, node):
    out[prefix + ".weight"] = np.asarray(node["scale"], np.float32)
    out[prefix + ".bias"] = np.asarray(node["bias"], np.float32)


def unet_params_to_torch(params: Mapping, levels: int = 4) -> dict:
    """tpuseg UNet params -> reference-named state_dict (numpy tensors;
    inverse of `unet_params_from_torch`)."""
    out: dict = {}

    def block(tname, node):
        out[f"{tname}conv1.weight"] = _conv_kernel_inv(node["ConvND_0"]["Conv_0"]["kernel"])
        _emit_gn(out, f"{tname}norm1", node["GroupNorm_0"])
        out[f"{tname}conv2.weight"] = _conv_kernel_inv(node["ConvND_1"]["Conv_0"]["kernel"])
        _emit_gn(out, f"{tname}norm2", node["GroupNorm_1"])

    for i in range(levels):
        block(f"encoder{i + 1}.enc{i + 1}", params[f"ConvBlock_{i}"])
    block("bottleneck.bottleneck", params[f"ConvBlock_{levels}"])
    for j in range(levels):
        l = levels - j
        tnode = params[f"ConvTransposeND_{j}"]["ConvTranspose_0"]
        out[f"upconv{l}.weight"] = _tconv_kernel_inv(tnode["kernel"])
        out[f"upconv{l}.bias"] = np.asarray(tnode["bias"], np.float32)
        block(f"decoder{l}.dec{l}", params[f"ConvBlock_{levels + 1 + j}"])
    _emit_conv(out, "conv", params["OutputHead_0"]["ConvND_0"])
    return out


def vnet_params_to_torch(params: Mapping) -> dict:
    """tpuseg VNet params -> reference-named state_dict (inverse of
    `vnet_params_from_torch`; the reference's shared up-stage GN is taken
    from GroupNorm_0 — on an imported checkpoint both copies are equal,
    and on a tpuseg-trained one the export necessarily picks one)."""
    out: dict = {}

    def luconvs(tname, node, n):
        for j in range(n):
            _emit_conv(out, f"{tname}.ops.{j}.conv1", node[f"LUConv_{j}"]["ConvND_0"])
            _emit_gn(out, f"{tname}.ops.{j}.bn1", node[f"LUConv_{j}"]["GroupNorm_0"])

    it = params["InputTransition_0"]
    _emit_conv(out, "in_tr.conv1", it["ConvND_0"])
    _emit_conv(out, "in_tr.conv2", it["ConvND_1"])
    _emit_gn(out, "in_tr.bn1", it["GroupNorm_0"])
    for i, (tag, n) in enumerate((("32", 2), ("64", 3), ("128", 3), ("256", 3))):
        t, node = f"down_tr{tag}", params[f"DownTransition_{i}"]
        _emit_conv(out, f"{t}.down_conv", node["ConvND_0"])
        _emit_gn(out, f"{t}.bn1", node["GroupNorm_0"])
        luconvs(t, node, n)
    for i, (tag, n) in enumerate((("256", 3), ("128", 3), ("64", 2), ("32", 1))):
        t, node = f"up_tr{tag}", params[f"UpTransition_{i}"]
        tnode = node["ConvTransposeND_0"]["ConvTranspose_0"]
        out[f"{t}.up_conv.weight"] = _tconv_kernel_inv(tnode["kernel"])
        out[f"{t}.up_conv.bias"] = np.asarray(tnode["bias"], np.float32)
        g0, g1 = node["GroupNorm_0"], node["GroupNorm_1"]
        if not (
            np.allclose(np.asarray(g0["scale"]), np.asarray(g1["scale"]), atol=1e-6)
            and np.allclose(np.asarray(g0["bias"]), np.asarray(g1["bias"]), atol=1e-6)
        ):
            import warnings

            warnings.warn(
                f"VNet export: {t} GroupNorm_0 and GroupNorm_1 have diverged "
                "(tpuseg trains them independently) but the reference "
                "architecture SHARES one GN for both uses — the exported "
                ".pth will use GroupNorm_0 for both, changing the torch "
                "forward. Re-verify outputs after export.",
                stacklevel=2,
            )
        _emit_gn(out, f"{t}.bn", g0)
        _emit_conv(out, f"{t}.conv", node["ConvND_0"])
        luconvs(t, node, n)
    _emit_conv(out, "out_tr.conv", params["OutputHead_0"]["ConvND_0"])
    return out


_EXPORTERS = {"unet": unet_params_to_torch, "vnet": vnet_params_to_torch}


def params_to_torch_checkpoint(params, arch: str, path=None):
    """Export a tpuseg params pytree (the tree under ``{"params": ...}``)
    to a reference-named state_dict; write it with torch.save when
    ``path`` is given.  Returns the state_dict (numpy values, converted to
    torch tensors when saving)."""
    if "params" in params and isinstance(params.get("params"), Mapping) and (
        "InputTransition_0" in params["params"] or "ConvBlock_0" in params["params"]
    ):
        params = params["params"]  # accept the full variables dict too
    if arch not in _EXPORTERS:
        raise ValueError(f"arch must be one of {sorted(_EXPORTERS)}, got {arch!r}")
    sd = _EXPORTERS[arch](params)
    if path is not None:
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    return sd
