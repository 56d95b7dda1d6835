"""Reference-compatible public Model surface.

Mirrors `/root/reference/model/__init__.py:1-3`'s twelve exports so a user
of the reference can switch imports to ``tpuseg.compat`` unchanged.
"""
from tpuseg.compat.seg_models import (  # noqa: F401
    BinaryUNet2dModel,
    BinaryUNet3dModel,
    MutilUNet2dModel,
    MutilUNet3dModel,
    BinaryVNet2dModel,
    BinaryVNet3dModel,
    MutilVNet2dModel,
    MutilVNet3dModel,
)
from tpuseg.compat.resnet_models import (  # noqa: F401
    BinaryResNet2dModel,
    BinaryResNet3dModel,
    MutilResNet2dModel,
    MutilResNet3dModel,
)
from tpuseg.compat.gan_model import Pixel2PixelGAN2dModel  # noqa: F401
