"""Numerical parity against torch (CPU) reference implementations.

BASELINE.json demands dice parity within 1e-4 against the reference's
PyTorch stack; since the reference's exact code isn't importable here, we
re-express its building blocks in torch (same ops, same hyperparameters)
and compare against tpuseg with IDENTICAL weights injected — validating
conv padding semantics, GroupNorm math, transpose-conv upsampling, and
loss formulas across frameworks.
"""
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_conv_block_parity(rng):
    """conv3x3(bias=False) + GroupNorm(8) + ReLU: torch vs tpuseg."""
    import torch.nn as tnn

    from tpuseg.nn.layers import ConvBlock

    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)

    block = ConvBlock(features=8, ndim=2, dropout=0.0, repeats=1)
    params = block.init(jax.random.key(0), jnp.asarray(x))

    tconv = tnn.Conv2d(4, 8, 3, padding=1, bias=False)
    tnorm = tnn.GroupNorm(8, 8)
    # inject the SAME weights: flax kernel (kh,kw,in,out) -> torch (out,in,kh,kw)
    k = np.asarray(params["params"]["ConvND_0"]["Conv_0"]["kernel"])
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        tnorm.weight.copy_(
            torch.from_numpy(np.asarray(params["params"]["GroupNorm_0"]["scale"]))
        )
        tnorm.bias.copy_(
            torch.from_numpy(np.asarray(params["params"]["GroupNorm_0"]["bias"]))
        )
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_out = torch.relu(tnorm(tconv(tx))).numpy().transpose(0, 2, 3, 1)

    j_out = np.asarray(block.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-5)


def test_transpose_conv_parity(rng):
    """ConvTranspose kernel 2 stride 2: torch vs flax semantics."""
    import torch.nn as tnn

    from tpuseg.nn.layers import ConvTransposeND

    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    up = ConvTransposeND(features=6, ndim=2, kernel_size=2, strides=2)
    params = up.init(jax.random.key(0), jnp.asarray(x))
    k = np.asarray(params["params"]["ConvTranspose_0"]["kernel"])  # (2,2,4,6)
    b = np.asarray(params["params"]["ConvTranspose_0"]["bias"])

    tup = tnn.ConvTranspose2d(4, 6, 2, stride=2)
    with torch.no_grad():
        # flax ConvTranspose == torch ConvTranspose2d with the spatially
        # FLIPPED kernel (verified empirically); both parameterizations are
        # equivalent for learned weights — only porting needs the flip
        tup.weight.copy_(
            torch.from_numpy(k[::-1, ::-1].copy().transpose(2, 3, 0, 1))
        )
        tup.bias.copy_(torch.from_numpy(b))
        t_out = tup(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    j_out = np.asarray(up.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out.transpose(0, 2, 3, 1), atol=2e-5)


def test_maxpool_parity(rng):
    import torch.nn.functional as F

    from tpuseg.nn.layers import max_pool_nd

    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    j = np.asarray(max_pool_nd(jnp.asarray(x), 2, 2))
    t = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2).numpy()
    np.testing.assert_allclose(j, t.transpose(0, 2, 3, 1), atol=1e-6)


def test_binary_dice_loss_parity(rng):
    """Global sigmoid-dice formula: torch vs tpuseg to <1e-6."""
    from tpuseg.losses.binary import dice_loss

    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32) * 2
    target = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)

    tp = torch.sigmoid(torch.from_numpy(logits)).reshape(2, 1, -1)
    tt = torch.from_numpy(target).reshape(2, 1, -1)
    inter = (tp * tt).sum()
    expect = 1 - (2 * inter + 1e-5) / torch.clamp(
        tp.sum() + tt.sum() + 1e-5, min=1e-7
    )
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, float(expect), rtol=1e-6)


def test_mutil_dice_loss_parity(rng):
    """Per-class generalized dice with empty-class masking: torch one-hot
    formulation vs tpuseg's segment-sum formulation."""
    import torch.nn.functional as F

    from tpuseg.losses.categorical import dice_loss

    c = 4
    logits = rng.normal(size=(2, 6, 6, c)).astype(np.float32) * 2
    labels = rng.integers(0, c - 1, size=(2, 6, 6)).astype(np.int64)

    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))  # NCHW
    ty = torch.from_numpy(labels)
    p = torch.softmax(tl, dim=1).reshape(2, c, -1)
    oh = F.one_hot(ty.reshape(2, -1), c).permute(0, 2, 1).float()
    inter = (oh * p).sum(dim=(0, 2))
    denom = (oh + p).sum(dim=(0, 2))
    dice = torch.clamp((2 * inter + 1e-5) / (denom + 1e-5), min=1e-7)
    mask = (oh.sum(dim=(0, 2)) > 0).float()
    expect = -(dice * mask).sum() / mask.sum()

    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    np.testing.assert_allclose(got, float(expect), rtol=1e-5)


def _torch_unet2d_mirror(params, f, num_classes):
    """Build a torch twin of tpuseg UNet(ndim=2, levels=2) and load the
    given flax params into it (the reference's architecture shape,
    `/root/reference/networks/Unet2d.py`, minus dropout)."""
    import torch.nn as tnn

    class TorchBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
            self.n1 = tnn.GroupNorm(8, cout)
            self.c2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.n2 = tnn.GroupNorm(8, cout)

        def forward(self, h):
            h = torch.relu(self.n1(self.c1(h)))
            return torch.relu(self.n2(self.c2(h)))

    class TorchUNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = TorchBlock(1, f)
            self.e2 = TorchBlock(f, f * 2)
            self.bott = TorchBlock(f * 2, f * 4)
            self.u2 = tnn.ConvTranspose2d(f * 4, f * 2, 2, stride=2)
            self.d2 = TorchBlock(f * 4, f * 2)
            self.u1 = tnn.ConvTranspose2d(f * 2, f, 2, stride=2)
            self.d1 = TorchBlock(f * 2, f)
            self.head = tnn.Conv2d(f, num_classes, 1)

        def forward(self, h):
            s1 = self.e1(h)
            s2 = self.e2(torch.max_pool2d(s1, 2))
            b = self.bott(torch.max_pool2d(s2, 2))
            h = self.d2(torch.cat([self.u2(b), s2], 1))
            h = self.d1(torch.cat([self.u1(h), s1], 1))
            return self.head(h)

    tmodel = TorchUNet()

    def copy_block(tblock, jb):
        with torch.no_grad():
            tblock.c1.weight.copy_(torch.from_numpy(
                np.asarray(jb["ConvND_0"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)))
            tblock.n1.weight.copy_(torch.from_numpy(np.asarray(jb["GroupNorm_0"]["scale"])))
            tblock.n1.bias.copy_(torch.from_numpy(np.asarray(jb["GroupNorm_0"]["bias"])))
            tblock.c2.weight.copy_(torch.from_numpy(
                np.asarray(jb["ConvND_1"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)))
            tblock.n2.weight.copy_(torch.from_numpy(np.asarray(jb["GroupNorm_1"]["scale"])))
            tblock.n2.bias.copy_(torch.from_numpy(np.asarray(jb["GroupNorm_1"]["bias"])))

    copy_block(tmodel.e1, params["ConvBlock_0"])
    copy_block(tmodel.e2, params["ConvBlock_1"])
    copy_block(tmodel.bott, params["ConvBlock_2"])
    copy_block(tmodel.d2, params["ConvBlock_3"])
    copy_block(tmodel.d1, params["ConvBlock_4"])
    with torch.no_grad():
        for tup, name in ((tmodel.u2, "ConvTransposeND_0"), (tmodel.u1, "ConvTransposeND_1")):
            k = np.asarray(params[name]["ConvTranspose_0"]["kernel"])
            tup.weight.copy_(
                torch.from_numpy(k[::-1, ::-1].copy().transpose(2, 3, 0, 1))
            )
            tup.bias.copy_(torch.from_numpy(np.asarray(params[name]["ConvTranspose_0"]["bias"])))
        hk = np.asarray(params["OutputHead_0"]["ConvND_0"]["Conv_0"]["kernel"])
        tmodel.head.weight.copy_(torch.from_numpy(hk.transpose(3, 2, 0, 1)))
        tmodel.head.bias.copy_(torch.from_numpy(
            np.asarray(params["OutputHead_0"]["ConvND_0"]["Conv_0"]["bias"])))
    return tmodel


def test_unet2d_forward_parity(rng):
    """Full UNet2d forward with identical weights: torch mirror vs tpuseg,
    max abs logit difference < 1e-3 (accumulated f32 conv differences)."""
    from tpuseg.models.unet import UNet

    f = 8
    model = UNet(ndim=2, num_classes=2, features=f, dropout=0.0, levels=2)
    x = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    tmodel = _torch_unet2d_mirror(params, f, 2)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    j_logits, _ = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.transpose(0, 2, 3, 1), atol=1e-3
    )


def test_full_pipeline_dice_parity(rng):
    """BASELINE.json north-star parity leg: train a UNet2d briefly on
    synthetic blobs through the tpuseg pipeline, port the weights to the
    torch mirror, and check that BOTH stacks produce the same masks and a
    validation dice within 1e-4 on held-out data."""
    from tpuseg.models.unet import UNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig
    from tpuseg.data.dataset import ArrayDataset, DataLoader

    f = 8
    size = 32

    def blobs(n, seed):
        r = np.random.default_rng(seed)
        xs, ys = [], []
        for _ in range(n):
            img = r.normal(0, 1, (size, size)).astype(np.float32)
            m = np.zeros((size, size), np.int32)
            cy, cx = r.integers(8, 24, 2)
            yy, xx = np.ogrid[:size, :size]
            m[(yy - cy) ** 2 + (xx - cx) ** 2 < 49] = 1
            img[m > 0] += 3.0
            xs.append(img[..., None])
            ys.append(m)
        return xs, ys

    xs, ys = blobs(16, 0)
    model = UNet(ndim=2, num_classes=2, features=f, dropout=0.0, levels=2)
    trainer = make_segmentation_trainer(
        model, example_image=np.zeros((1, size, size, 1), np.float32),
        num_classes=2, loss_name="MutilCrossEntropyDiceLoss", alpha=[1.0, 1.0],
        config=TrainerConfig(epochs=6, lr=3e-3, optimizer="adam"),
    )
    ds = ArrayDataset([
        {"image": x, "label": y} for x, y in zip(xs, ys)
    ])
    loader = DataLoader(ds, batch_size=4, shuffle=True)
    trainer.fit(lambda: iter(loader), lambda: iter(loader),
                tempfile.mkdtemp())

    params = jax.device_get(trainer.state["params"])["params"]
    tmodel = _torch_unet2d_mirror(params, f, 2)

    vx, vy = blobs(4, 99)
    j_dice, t_dice = [], []
    for img, gt in zip(vx, vy):
        j_logits, j_probs = model.apply({"params": params}, jnp.asarray(img[None]))
        j_mask = np.asarray(jnp.argmax(j_probs[0], axis=-1))
        with torch.no_grad():
            t_logits = tmodel(torch.from_numpy(img[None].transpose(0, 3, 1, 2)))
            t_mask = torch.softmax(t_logits, 1).argmax(1)[0].numpy()
        # identical hard masks through either stack
        assert (j_mask == t_mask).mean() > 0.999, (j_mask != t_mask).sum()

        def dice(m):
            inter = float(np.logical_and(m == 1, gt == 1).sum())
            return 2 * inter / float((m == 1).sum() + (gt == 1).sum())

        j_dice.append(dice(j_mask))
        t_dice.append(dice(t_mask))
    assert np.mean(j_dice) > 0.85, np.mean(j_dice)  # actually trained
    assert abs(np.mean(j_dice) - np.mean(t_dice)) <= 1e-4, (j_dice, t_dice)
