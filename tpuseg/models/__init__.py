"""Model zoo registry.

Mirrors the reference's `networks/` zoo (SURVEY.md §2.1 rows 14-29) as
flax modules with the (logits, probs[, aux_logits]) forward contract.
"""
from __future__ import annotations

from tpuseg.models.unet import UNet, UNetThin, UNet2d, UNet3d, UNet3dThin  # noqa: F401
from tpuseg.models.vnet import VNet, VNet2d, VNet3d  # noqa: F401
from tpuseg.models.resnet import ResNetClassifier, ResNet2d, ResNet3d  # noqa: F401
from tpuseg.models.resunet3d import ResUNet3d  # noqa: F401
from tpuseg.models.kiunet3d import KiUNet3d  # noqa: F401
from tpuseg.models.stunet3d import STUNet3d  # noqa: F401
from tpuseg.models.tpddnet import TPDDNet  # noqa: F401


def build_model(name: str, num_classes: int, ndim: int = 3, **kw):
    """String-name model factory (the zoo-level registry)."""
    name = name.lower()
    if name in ("unet2d", "unet3d", "unet"):
        nd = 2 if name.endswith("2d") else (3 if name.endswith("3d") else ndim)
        return UNet(ndim=nd, num_classes=num_classes, **kw)
    if name in ("unet3dthin", "unetthin"):
        return UNetThin(ndim=3, num_classes=num_classes, **kw)
    if name in ("vnet2d", "vnet3d", "vnet"):
        nd = 2 if name.endswith("2d") else (3 if name.endswith("3d") else ndim)
        return VNet(ndim=nd, num_classes=num_classes, **kw)
    if name in ("resnet2d", "resnet3d", "resnet"):
        nd = 2 if name.endswith("2d") else (3 if name.endswith("3d") else ndim)
        return ResNetClassifier(ndim=nd, num_classes=num_classes, **kw)
    if name == "resunet3d":
        return ResUNet3d(num_classes=num_classes, **kw)
    if name in ("kiunet3d", "kiunet3dthin"):  # reference class: KiUNet3dthin
        return KiUNet3d(num_classes=num_classes, **kw)
    if name == "stunet3d":
        return STUNet3d(num_classes=num_classes, **kw)
    if name == "tpddnet":
        return TPDDNet(num_classes=num_classes, **kw)
    # late imports for the attention/MLP families (heavier modules)
    if name == "unext2d":
        from tpuseg.models.unext2d import UNeXt2d

        return UNeXt2d(num_classes=num_classes, **kw)
    if name == "unext2ds":
        from tpuseg.models.unext2d import UNeXt2dS

        return UNeXt2dS(num_classes=num_classes, **kw)
    if name == "amlpunet2d":
        from tpuseg.models.amlp_unet2d import AmlpUNet2d

        return AmlpUNet2d(num_classes=num_classes, **kw)
    if name == "vnet3dregistration":
        from tpuseg.models.registration import VNet3dRegistration

        return VNet3dRegistration(**kw)
    if name == "smt":
        from tpuseg.models.smt import SMTSeg3d

        return SMTSeg3d(num_classes=num_classes, **kw)
    if name == "vsnet":
        from tpuseg.models.vsnet import VSNet

        return VSNet(**kw)
    raise KeyError(f"unknown model: {name}")
