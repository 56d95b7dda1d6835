"""Checkpoint migration: reference .pth state_dicts -> tpuseg params.

Builds torch networks whose state_dict KEYS match the reference's
(`networks/Unet{2,3}d.py`, `networks/VNet2d.py` — same member names in 3D),
runs the torch forward, imports the state_dict with
tpuseg.compat.torch_import, and pins forward parity of the converted
parameters."""
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuseg.compat.torch_import import (  # noqa: E402
    params_from_torch_checkpoint,
    unet_params_from_torch,
    vnet_params_from_torch,
)
from tpuseg.models.unet import UNet  # noqa: E402
from tpuseg.models.vnet import VNet  # noqa: E402

# The mirrors use flax's GN epsilon so the test pins the importer's
# name/layout MAPPING exactly (atol 1e-4 for f32 accumulation).  Real
# reference checkpoints ran with torch's eps=1e-5; that fixed semantic
# difference is documented in tpuseg/compat/torch_import.py and is
# negligible at realistic feature-map resolutions.
GN_EPS = 1e-6


def _unet_block(conv, cin, f, name):
    return tnn.Sequential(OrderedDict([
        (name + "conv1", conv(cin, f, 3, padding=1, bias=False)),
        (name + "norm1", tnn.GroupNorm(8, f, eps=GN_EPS)),
        (name + "relu1", tnn.ReLU()),
        (name + "conv2", conv(f, f, 3, padding=1, bias=False)),
        (name + "norm2", tnn.GroupNorm(8, f, eps=GN_EPS)),
        (name + "relu2", tnn.ReLU()),
    ]))


class _TorchUNet(tnn.Module):
    """Reference-named UNet mirror (`networks/Unet3d.py:16-62`)."""

    def __init__(self, ndim, cin, ncls, f):
        super().__init__()
        conv = tnn.Conv2d if ndim == 2 else tnn.Conv3d
        tconv = tnn.ConvTranspose2d if ndim == 2 else tnn.ConvTranspose3d
        self.pool = tnn.MaxPool2d(2, 2) if ndim == 2 else tnn.MaxPool3d(2, 2)
        self.encoder1 = _unet_block(conv, cin, f, "enc1")
        self.encoder2 = _unet_block(conv, f, f * 2, "enc2")
        self.encoder3 = _unet_block(conv, f * 2, f * 4, "enc3")
        self.encoder4 = _unet_block(conv, f * 4, f * 8, "enc4")
        self.bottleneck = _unet_block(conv, f * 8, f * 16, "bottleneck")
        self.upconv4 = tconv(f * 16, f * 8, 2, 2)
        self.decoder4 = _unet_block(conv, f * 16, f * 8, "dec4")
        self.upconv3 = tconv(f * 8, f * 4, 2, 2)
        self.decoder3 = _unet_block(conv, f * 8, f * 4, "dec3")
        self.upconv2 = tconv(f * 4, f * 2, 2, 2)
        self.decoder2 = _unet_block(conv, f * 4, f * 2, "dec2")
        self.upconv1 = tconv(f * 2, f, 2, 2)
        self.decoder1 = _unet_block(conv, f * 2, f, "dec1")
        self.conv = conv(f, ncls, 1)

    def forward(self, x):
        e1 = self.encoder1(x)
        e2 = self.encoder2(self.pool(e1))
        e3 = self.encoder3(self.pool(e2))
        e4 = self.encoder4(self.pool(e3))
        b = self.bottleneck(self.pool(e4))
        d4 = self.decoder4(torch.cat((self.upconv4(b), e4), 1))
        d3 = self.decoder3(torch.cat((self.upconv3(d4), e3), 1))
        d2 = self.decoder2(torch.cat((self.upconv2(d3), e2), 1))
        d1 = self.decoder1(torch.cat((self.upconv1(d2), e1), 1))
        return self.conv(d1)


class _LU(tnn.Module):
    def __init__(self, conv, c):
        super().__init__()
        self.conv1 = conv(c, c, 3, padding=1)
        self.bn1 = tnn.GroupNorm(8, c, eps=GN_EPS)

    def forward(self, x):
        return torch.relu(self.bn1(self.conv1(x)))


class _TorchVNet(tnn.Module):
    """Reference-named VNet mirror (`networks/VNet3d.py:4-158`), eval-mode
    semantics (dropout inactive)."""

    def __init__(self, ndim, cin, ncls, f):
        super().__init__()
        conv = tnn.Conv2d if ndim == 2 else tnn.Conv3d
        tconv = tnn.ConvTranspose2d if ndim == 2 else tnn.ConvTranspose3d

        class InTr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = conv(cin, f, 3, padding=1)
                self.conv2 = conv(cin, f, 1)
                self.bn1 = tnn.GroupNorm(8, f, eps=GN_EPS)

            def forward(self, x):
                return torch.relu(self.bn1(self.conv1(x))) + torch.relu(
                    self.bn1(self.conv2(x))
                )

        class DownTr(tnn.Module):
            def __init__(self, ci, co, n):
                super().__init__()
                self.down_conv = conv(ci, co, 2, stride=2)
                self.bn1 = tnn.GroupNorm(8, co, eps=GN_EPS)
                self.ops = tnn.Sequential(*[_LU(conv, co) for _ in range(n)])

            def forward(self, x):
                d = torch.relu(self.bn1(self.down_conv(x)))
                return self.ops(d) + d

        class UpTr(tnn.Module):
            def __init__(self, ci, co, n):
                super().__init__()
                self.up_conv = tconv(ci, co, 2, 2)
                self.bn = tnn.GroupNorm(8, co, eps=GN_EPS)  # shared for up AND squeeze
                self.conv = conv(ci, co, 1)
                self.ops = tnn.Sequential(*[_LU(conv, co) for _ in range(n)])

            def forward(self, x, skip):
                up = torch.relu(self.bn(self.up_conv(x)))
                cat = torch.relu(self.bn(self.conv(torch.cat((up, skip), 1))))
                return self.ops(cat) + cat

        class OutTr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = conv(f, ncls, 1)

            def forward(self, x):
                return self.conv(x)

        self.in_tr = InTr()
        self.down_tr32 = DownTr(f, f * 2, 2)
        self.down_tr64 = DownTr(f * 2, f * 4, 3)
        self.down_tr128 = DownTr(f * 4, f * 8, 3)
        self.down_tr256 = DownTr(f * 8, f * 16, 3)
        self.up_tr256 = UpTr(f * 16, f * 8, 3)
        self.up_tr128 = UpTr(f * 8, f * 4, 3)
        self.up_tr64 = UpTr(f * 4, f * 2, 2)
        self.up_tr32 = UpTr(f * 2, f, 1)
        self.out_tr = OutTr()

    def forward(self, x):
        o16 = self.in_tr(x)
        o32 = self.down_tr32(o16)
        o64 = self.down_tr64(o32)
        o128 = self.down_tr128(o64)
        o256 = self.down_tr256(o128)
        u = self.up_tr256(o256, o128)
        u = self.up_tr128(u, o64)
        u = self.up_tr64(u, o32)
        u = self.up_tr32(u, o16)
        return self.out_tr(u)


def _nchw_to_nlast(a):
    return np.moveaxis(a, 1, -1)


@pytest.mark.parametrize("ndim,size", [(2, 32), (3, 16)])
def test_unet_torch_import_forward_parity(ndim, size, rng):
    f, ncls = 8, 3
    torch.manual_seed(0)  # mirror weights must not depend on test order
    tm = _TorchUNet(ndim, 1, ncls, f).eval()
    x = rng.standard_normal((2, 1) + (size,) * ndim).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x)).numpy()

    params = unet_params_from_torch(tm.state_dict())
    model = UNet(ndim=ndim, num_classes=ncls, features=f)
    j_logits, _ = model.apply({"params": params}, _nchw_to_nlast(x))
    np.testing.assert_allclose(
        np.asarray(j_logits), _nchw_to_nlast(t_logits), atol=1e-4
    )


# VNet's GroupNorm on the 1x1-conv stem path is ill-conditioned for an
# UNTRAINED net (each output channel is a scalar multiple of the input, so
# per-group variance ~ w^2*var(x) can be ~1e-4 and f32 variance-formula
# differences get amplified).  features=16 (the real config, 2 ch/group)
# plus behavioral assertions (probs atol + identical argmax) pin the
# mapping without depending on that conditioning.
@pytest.mark.parametrize("ndim,size", [(2, 32), (3, 32)])
def test_vnet_torch_import_forward_parity(ndim, size, rng):
    f, ncls = 16, 2
    torch.manual_seed(0)
    tm = _TorchVNet(ndim, 1, ncls, f).eval()
    x = rng.standard_normal((2, 1) + (size,) * ndim).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x)).numpy()
        t_probs = torch.softmax(torch.from_numpy(t_logits), 1).numpy()

    params = vnet_params_from_torch(tm.state_dict())
    model = VNet(ndim=ndim, num_classes=ncls, features=f)
    j_logits, j_probs = model.apply({"params": params}, _nchw_to_nlast(x))
    np.testing.assert_allclose(
        np.asarray(j_probs), _nchw_to_nlast(t_probs), atol=2e-3
    )
    assert (
        np.argmax(np.asarray(j_probs), -1) == np.argmax(_nchw_to_nlast(t_probs), -1)
    ).mean() > 0.9999


def test_checkpoint_roundtrip_via_pth(tmp_path, rng):
    """torch.save -> params_from_torch_checkpoint(path) end-to-end."""
    torch.manual_seed(0)
    tm = _TorchUNet(2, 1, 1, 8).eval()
    p = tmp_path / "BinaryUNet2d.pth"
    torch.save(tm.state_dict(), str(p))
    params = params_from_torch_checkpoint(str(p), "unet")
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x)).numpy()
    model = UNet(ndim=2, num_classes=1, features=8)
    j_logits, _ = model.apply({"params": params}, _nchw_to_nlast(x))
    np.testing.assert_allclose(
        np.asarray(j_logits), _nchw_to_nlast(t_logits), atol=1e-4
    )


def test_compat_model_load_torch_checkpoint(tmp_path, rng):
    """BinaryUNet2dModel(inference=True, model_path=*.pth) — the reference's
    exact deployment pattern (`flask_app.py:16-18`) with a real torch file."""
    from tpuseg.compat import BinaryUNet2dModel

    torch.manual_seed(0)
    tm = _TorchUNet(2, 1, 1, 16).eval()
    p = tmp_path / "BinaryUNet2dSegModel.pth"
    torch.save(tm.state_dict(), str(p))

    m = BinaryUNet2dModel(64, 64, 1, 1, 2, "BinaryDiceLoss",
                          inference=True, model_path=str(p))
    x = rng.standard_normal((1, 64, 64)).astype(np.float32)
    mask = m.predict(x)
    with torch.no_grad():
        t_logit = tm(torch.from_numpy(x[None])).numpy()[0, 0]
    # compat predict returns 0/1 labels (not the reference's 0/255 bitmap)
    t_mask = ((1 / (1 + np.exp(-t_logit))) > 0.5).astype(np.uint8)
    assert (mask == t_mask).mean() > 0.999


class _TorchResNet(tnn.Module):
    """Reference-named ResNet mirror (`networks/ResNet2d.py:74-119`);
    the reference's undefined-`prob` dropout defect is irrelevant here
    (dropout has no parameters)."""

    def __init__(self, ndim, cin, ncls, f=16):
        super().__init__()
        conv = tnn.Conv2d if ndim == 2 else tnn.Conv3d

        class InTr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = conv(cin, f, 3, padding=1)
                self.conv2 = conv(cin, f, 1)
                self.bn1 = tnn.GroupNorm(8, f, eps=GN_EPS)

            def forward(self, x):
                return torch.relu(self.bn1(self.conv1(x))) + torch.relu(
                    self.bn1(self.conv2(x))
                )

        class DownTr(tnn.Module):
            def __init__(self, ci, co, n):
                super().__init__()
                self.down_conv = conv(ci, co, 2, stride=2)
                self.bn1 = tnn.GroupNorm(8, co, eps=GN_EPS)
                self.ops = tnn.Sequential(*[_LU(conv, co) for _ in range(n)])

            def forward(self, x):
                d = torch.relu(self.bn1(self.down_conv(x)))
                return self.ops(d) + d

        self.in_tr = InTr()
        self.down_tr32 = DownTr(f, f * 2, 2)
        self.down_tr64 = DownTr(f * 2, f * 4, 3)
        self.down_tr128 = DownTr(f * 4, f * 8, 3)
        self.down_tr256 = DownTr(f * 8, f * 16, 3)
        self.fc_layers = tnn.Sequential(
            tnn.Linear(f * 16, 128), tnn.ReLU(), tnn.Linear(128, ncls)
        )

    def forward(self, x):
        x = self.in_tr(x)
        x = self.down_tr32(x)
        x = self.down_tr64(x)
        x = self.down_tr128(x)
        x = self.down_tr256(x)
        x = x.reshape(x.size(0), x.size(1), -1).mean(dim=2)
        return self.fc_layers(x)


def test_resnet_torch_import_forward_parity(rng):
    from tpuseg.compat.torch_import import resnet_params_from_torch
    from tpuseg.models.resnet import ResNetClassifier

    torch.manual_seed(0)
    tm = _TorchResNet(2, 1, 4).eval()
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x)).numpy()

    model = ResNetClassifier(ndim=2, num_classes=4)
    init_vars = model.init(jax.random.key(0), _nchw_to_nlast(x))
    variables = dict(init_vars)
    variables["params"] = resnet_params_from_torch(tm.state_dict())
    j_logits = model.apply(variables, _nchw_to_nlast(x))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits, atol=1e-3)


def test_compat_resnet_load_torch_checkpoint(tmp_path, rng):
    from tpuseg.compat import MutilResNet2dModel

    torch.manual_seed(0)
    tm = _TorchResNet(2, 1, 4).eval()
    p = tmp_path / "MutilResNet2d.pth"
    torch.save(tm.state_dict(), str(p))
    m = MutilResNet2dModel(64, 64, 1, 4, 2, inference=True, model_path=str(p))
    x = rng.standard_normal((1, 64, 64)).astype(np.float32)
    label, probs = m.predict(x)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x[None])).numpy()[0]
    assert label == int(np.argmax(t_logits))
    e = np.exp(t_logits - t_logits.max())
    np.testing.assert_allclose(probs, e / e.sum(), atol=1e-3)


class _TorchPixGen(tnn.Module):
    """Reference-named pix2pix generator mirror
    (`modelPixel2PixelGAN.py:112-170`); InstanceNorms are affine-free."""

    def __init__(self, cin, cout, f=16):
        super().__init__()

        class LU(tnn.Module):
            def __init__(self, c):
                super().__init__()
                self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
                self.bn1 = tnn.InstanceNorm2d(c, eps=GN_EPS)

            def forward(self, x):
                return tnn.functional.leaky_relu(self.bn1(self.conv1(x)), 0.2)

        class InTr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, f, 3, padding=1)
                self.conv2 = tnn.Conv2d(cin, f, 1)
                self.bn1 = tnn.InstanceNorm2d(f, eps=GN_EPS)

            def forward(self, x):
                lrelu = tnn.functional.leaky_relu
                return lrelu(self.bn1(self.conv1(x)), 0.2) + lrelu(
                    self.bn1(self.conv2(x)), 0.2
                )

        class DownTr(tnn.Module):
            def __init__(self, ci, co, n):
                super().__init__()
                self.down_conv = tnn.Conv2d(ci, co, 2, stride=2)
                self.bn1 = tnn.InstanceNorm2d(co, eps=GN_EPS)
                self.ops = tnn.Sequential(*[LU(co) for _ in range(n)])

            def forward(self, x):
                d = tnn.functional.leaky_relu(self.bn1(self.down_conv(x)), 0.01)
                return self.ops(d) + d

        class UpTr(tnn.Module):
            def __init__(self, ci, co, n):
                super().__init__()
                self.up_conv = tnn.ConvTranspose2d(ci, co, 2, 2)
                self.bn = tnn.InstanceNorm2d(co, eps=GN_EPS)
                self.conv = tnn.Conv2d(ci, co, 1)
                self.ops = tnn.Sequential(*[LU(co) for _ in range(n)])

            def forward(self, x, skip):
                up = torch.relu(self.bn(self.up_conv(x)))
                cat = torch.relu(self.bn(self.conv(torch.cat((up, skip), 1))))
                return self.ops(cat) + cat

        class OutTr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(f, cout, 1)

            def forward(self, x):
                return torch.tanh(self.conv(x))

        self.in_tr = InTr()
        self.down_tr32 = DownTr(f, f * 2, 2)
        self.down_tr64 = DownTr(f * 2, f * 4, 3)
        self.down_tr128 = DownTr(f * 4, f * 8, 3)
        self.down_tr256 = DownTr(f * 8, f * 16, 3)
        self.up_tr256 = UpTr(f * 16, f * 8, 3)
        self.up_tr128 = UpTr(f * 8, f * 4, 3)
        self.up_tr64 = UpTr(f * 4, f * 2, 2)
        self.up_tr32 = UpTr(f * 2, f, 1)
        self.out_tr = OutTr()

    def forward(self, x):
        o16 = self.in_tr(x)
        o32 = self.down_tr32(o16)
        o64 = self.down_tr64(o32)
        o128 = self.down_tr128(o64)
        o256 = self.down_tr256(o128)
        u = self.up_tr256(o256, o128)
        u = self.up_tr128(u, o64)
        u = self.up_tr64(u, o32)
        u = self.up_tr32(u, o16)
        return self.out_tr(u)


def test_pix2pix_generator_torch_import_forward_parity(rng):
    from tpuseg.compat.torch_import import pix2pix_generator_params_from_torch
    from tpuseg.models.pix2pix import GeneratorUNet2d

    torch.manual_seed(0)
    tm = _TorchPixGen(1, 1, 16).eval()
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()

    params = pix2pix_generator_params_from_torch(tm.state_dict())
    model = GeneratorUNet2d(out_channels=1, features=16)
    j_out = model.apply({"params": params}, _nchw_to_nlast(x))
    # tanh output in [-1,1]: 1e-3 absolute covers the InstanceNorm
    # conditioning of an untrained net
    np.testing.assert_allclose(np.asarray(j_out), _nchw_to_nlast(t_out), atol=1e-3)


def test_compat_gan_load_torch_generator(tmp_path, rng):
    from tpuseg.compat.gan_model import Pixel2PixelGAN2dModel

    torch.manual_seed(0)
    tm = _TorchPixGen(1, 1, 16).eval()
    p = tmp_path / "Pixel2PixelGan2dbestGmodel.pth"
    torch.save(tm.state_dict(), str(p))
    m = Pixel2PixelGAN2dModel(32, 32, 1, 1, 2, inference=True, model_path=str(p))
    x = rng.standard_normal((1, 32, 32)).astype(np.float32)
    fake = m.predict(x)
    with torch.no_grad():
        t_fake = tm(torch.from_numpy(x[None])).numpy()[0, 0]
    np.testing.assert_allclose(fake, t_fake, atol=1e-3)


@pytest.mark.parametrize("arch,mirror,ndim", [("unet", _TorchUNet, 2), ("vnet", _TorchVNet, 3)])
def test_export_roundtrip_exact(arch, mirror, ndim, rng):
    """params -> reference-named state_dict -> params is the identity, and
    the exported tensors equal the original torch ones exactly."""
    from tpuseg.compat.torch_import import (
        params_from_torch_checkpoint,
        params_to_torch_checkpoint,
    )

    torch.manual_seed(0)
    tm = mirror(ndim, 1, 2, 16).eval()
    orig_sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = params_from_torch_checkpoint(tm.state_dict(), arch)
    exported = params_to_torch_checkpoint({"params": params}, arch)
    assert set(exported) == set(orig_sd)
    for k in orig_sd:
        np.testing.assert_array_equal(exported[k], orig_sd[k]), k
    # and back again
    params2 = params_from_torch_checkpoint(exported, arch)
    for (ka, a), (kb, b) in zip(
        sorted((("/".join(map(str, k)), v) for k, v in _flat(params).items())),
        sorted((("/".join(map(str, k)), v) for k, v in _flat(params2).items())),
    ):
        assert ka == kb
        np.testing.assert_array_equal(a, b)


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_export_via_pth_loads_in_torch(tmp_path, rng):
    """torch.save'd export is loadable by the torch mirror and reproduces
    the tpuseg forward."""
    from tpuseg.compat.torch_import import (
        params_from_torch_checkpoint,
        params_to_torch_checkpoint,
    )

    torch.manual_seed(1)
    src = _TorchUNet(2, 1, 2, 16).eval()
    params = params_from_torch_checkpoint(src.state_dict(), "unet")
    p = tmp_path / "exported.pth"
    params_to_torch_checkpoint({"params": params}, "unet", str(p))

    dst = _TorchUNet(2, 1, 2, 16)
    dst.load_state_dict(torch.load(str(p), weights_only=True))
    dst.eval()
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        a = src(torch.from_numpy(x)).numpy()
        b = dst(torch.from_numpy(x)).numpy()
    np.testing.assert_array_equal(a, b)


def test_importer_rejects_unmapped_keys():
    """Structural mismatches must raise, not silently drop tensors."""
    torch.manual_seed(0)
    tm = _TorchUNet(2, 1, 2, 8).eval()
    sd = dict(tm.state_dict())
    sd["encoder1.enc1conv1.bias"] = torch.zeros(8)  # a bias the map ignores
    from tpuseg.compat.torch_import import unet_params_from_torch

    with pytest.raises(ValueError, match="does not map"):
        unet_params_from_torch(sd)
