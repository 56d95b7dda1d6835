"""Tests: Grad-CAM heatmaps, GAN compat model."""
import os
import tempfile

import numpy as np
import jax

from tpuseg.models.resnet import ResNetClassifier
from tpuseg.tools.gradcam import grad_cam, overlay_cam


def test_gradcam_shape_and_range(rng):
    model = ResNetClassifier(ndim=2, num_classes=3)
    x = rng.normal(size=(1, 32, 32, 1)).astype(np.float32)
    params = model.init(jax.random.key(0), x)
    # params from init include 'perturbations'; split them off
    variables = {"params": params["params"]}
    cam = grad_cam(model, variables, x, target_class=1)
    assert cam.shape == (32, 32)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_gradcam_overlay(rng):
    img = rng.random((32, 32)).astype(np.float32)
    cam = rng.random((32, 32)).astype(np.float32)
    out = overlay_cam(img, cam)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8


def test_gan_compat_model(rng):
    import cv2

    from tpuseg.compat import Pixel2PixelGAN2dModel

    d = tempfile.mkdtemp()
    imgs, tgts = [], []
    for i in range(8):
        a = (rng.random((32, 32)) * 255).astype(np.uint8)
        b = 255 - a  # target = inverted image
        ip, tp = os.path.join(d, f"a{i}.png"), os.path.join(d, f"b{i}.png")
        cv2.imwrite(ip, a)
        cv2.imwrite(tp, b)
        imgs.append(ip)
        tgts.append(tp)
    model = Pixel2PixelGAN2dModel(32, 32, 1, 1, batch_size=4, features=8)
    h = model.trainprocess(imgs[:6], tgts[:6], imgs[6:], tgts[6:],
                           os.path.join(d, "run"), epochs=2)
    assert len(h["g_loss"]) >= 1
    out = model.predict(rng.normal(size=(1, 32, 32)).astype(np.float32))
    assert out.shape == (32, 32)
    assert -1.001 <= out.min() and out.max() <= 1.001
    full = model.inference((rng.random((48, 40)) * 255).astype(np.float32))
    assert full.shape == (48, 40)


def test_compat_grad_cam_visual():
    """`modelResNet.py:419-426` parity: the public Grad_CAM_Visual method on
    MutilResNet2dModel returns a [0,1] CAM at input resolution."""
    from tpuseg.compat import MutilResNet2dModel

    m = MutilResNet2dModel(32, 32, 1, 4, 2, "MutilCrossEntropyLoss")
    img = np.random.default_rng(0).normal(size=(1, 32, 32)).astype(np.float32)
    cam = m.Grad_CAM_Visual(img, target_category=1, target_layers=None)
    assert cam.shape == (32, 32)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-6
