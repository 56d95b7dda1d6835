"""Packed-stem VNet3d (models/vnet_packed.py): exactness vs the plain
flax model, both decoder-LUConv modes, packed and fine outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.vnet import VNet
from tpuseg.models import vnet_packed


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    params = model.init(jax.random.key(0), x)
    _, probs_ref = model.apply(params, x)
    return x, params, np.asarray(probs_ref)


@pytest.mark.parametrize("mode", ["k3dense", "k4s2"])
@pytest.mark.parametrize("levels", [1, 2])
def test_packed_vnet_exact(setup, mode, levels, monkeypatch):
    x, params, probs_ref = setup
    monkeypatch.setattr(vnet_packed, "LUCONV96_MODE", mode)
    probs = np.asarray(
        vnet_packed.packed_vnet3d_probs(params, x, packed_levels=levels)
    )
    np.testing.assert_allclose(probs, probs_ref, atol=1e-4)
    assert (probs.argmax(-1) == probs_ref.argmax(-1)).all()


def test_packed_output_roundtrip(setup):
    x, params, probs_ref = setup
    pp = vnet_packed.packed_vnet3d_probs(params, x, return_packed=True)
    assert pp.shape == (1, 16, 16, 16, 16)
    fine = np.asarray(vnet_packed.depth_to_space3d(pp))
    np.testing.assert_allclose(fine, probs_ref, atol=1e-4)


def test_packed_vnet_batch_and_nonisotropic(setup):
    """Shapes beyond the cube: batch 2, D!=H!=W (all divisible by 32)."""
    _, params, _ = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 32, 1)).astype(np.float32))
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    _, probs_ref = model.apply(params, x)
    probs = np.asarray(vnet_packed.packed_vnet3d_probs(params, x))
    np.testing.assert_allclose(probs, np.asarray(probs_ref), atol=1e-4)


@pytest.mark.parametrize("layout", ["delta", "class"])
def test_sliding_window_packed_apply_matches_plain(setup, layout):
    """The packed-merge sliding-window path (packed_apply=True) produces
    the same mask and probs as the plain path — in both packed-probs
    channel conventions (delta-major and the reshape-free-softmax
    class-major head, pack_head_1x1)."""
    from tpuseg.infer.sliding_window import sliding_window_inference

    _, params, _ = setup
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(48, 32, 32)).astype(np.float32)

    def apply_plain(patches):
        _, probs = model.apply(params, patches)
        return probs

    def apply_packed(patches):
        return vnet_packed.packed_vnet3d_probs(
            params, patches, return_packed=True, packed_layout=layout
        )

    kw = dict(patch=(32, 32, 32), num_classes=2, batch_size=4, overlap=0.5)
    mask_ref = sliding_window_inference(
        vol, apply_fn=apply_plain, return_mask=True, **kw
    )
    mask_pk = sliding_window_inference(
        vol, apply_fn=apply_packed, return_mask=True, packed_apply=True,
        packed_layout=layout, **kw
    )
    assert (mask_ref == mask_pk).mean() > 0.9999, (mask_ref != mask_pk).mean()
    probs_ref = sliding_window_inference(vol, apply_fn=apply_plain, **kw)
    probs_pk = sliding_window_inference(
        vol, apply_fn=apply_packed, packed_apply=True, packed_layout=layout,
        **kw
    )
    np.testing.assert_allclose(probs_pk, probs_ref, atol=2e-4)


@pytest.mark.parametrize("layout", ["delta", "class"])
def test_fold_merge_matches_scan_packed(setup, layout):
    """The fold-merge (whole grid in one batch: static overlap-add, no
    scatter) equals the scan merge (batch_size < n_pos) on the packed
    path — mask and probs."""
    from tpuseg.infer.sliding_window import sliding_window_inference

    _, params, _ = setup
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(64, 32, 32)).astype(np.float32)

    def apply_packed(patches):
        return vnet_packed.packed_vnet3d_probs(
            params, patches, return_packed=True, packed_layout=layout
        )

    kw = dict(patch=(32, 32, 32), num_classes=2, overlap=0.5,
              packed_apply=True, packed_layout=layout,
              apply_fn=apply_packed)
    # d positions [0, 16, 32]: batch 4 -> one batch (fold); 1 -> scan
    m_fold = sliding_window_inference(vol, batch_size=4, return_mask=True,
                                      **kw)
    m_scan = sliding_window_inference(vol, batch_size=1, return_mask=True,
                                      **kw)
    np.testing.assert_array_equal(m_fold, m_scan)
    p_fold = sliding_window_inference(vol, batch_size=4, **kw)
    p_scan = sliding_window_inference(vol, batch_size=1, **kw)
    np.testing.assert_allclose(p_fold, p_scan, atol=2e-5)


def test_axis_lists_rejects_partial_coverage():
    """_axis_lists only offers the fold-merge for Cartesian grids that
    fully cover [0, size) on every axis — a caller-supplied partial grid
    must fall back to the scan merge (the overlap-add would trace-error
    on an uncovered segment)."""
    from tpuseg.infer.sliding_window import _axis_lists, grid_positions

    vol, patch = (64, 32, 32), (32, 32, 32)
    full = grid_positions(vol, patch, 0.5)
    assert _axis_lists(full, vol, patch) is not None
    # missing the d=32 row: [32, 64) uncovered
    partial = full[full[:, 0] != 32]
    assert _axis_lists(partial, vol, patch) is None
    # gap wider than the window: starts {0, 34}, win 32, size 66 leaves
    # [32, 34) uncovered
    import numpy as _np

    gappy = _np.asarray(
        [[d, h, w] for d in (0, 34) for h in (0,) for w in (0,)], _np.int32
    )
    assert _axis_lists(gappy, (66, 32, 32), patch) is None
    # non-Cartesian grid rejected as before
    non_cart = full[:-1]
    assert _axis_lists(non_cart, vol, patch) is None
    # without shape info (legacy call) Cartesian structure still accepted
    assert _axis_lists(full) is not None


@pytest.mark.parametrize("num_classes", [1, 2, 5])
def test_class_major_head_matches_delta(num_classes):
    """pack_head_1x1/packed_softmax/packed_argmax class-major results are
    the delta-major results under the channel permutation k*8+d <->
    d*K+k — pinned at the op level (random logits-producing net not
    needed: the helpers are pure functions of the head weights)."""
    rng = np.random.default_rng(7)
    f = 16
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8 * f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(f, num_classes)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(num_classes,)).astype(np.float32))

    def head(layout):
        wp, bp = vnet_packed.pack_head_1x1(w, b, num_classes, f, layout=layout)
        lg = vnet_packed._conv(x, wp, padding="VALID") + bp
        return lg, vnet_packed.packed_softmax(lg, num_classes, layout=layout)

    lg_d, pr_d = head("delta")
    lg_c, pr_c = head("class")
    lg_c2d = vnet_packed.packed_class_to_delta(lg_c, num_classes)
    pr_c2d = vnet_packed.packed_class_to_delta(pr_c, num_classes)
    np.testing.assert_allclose(np.asarray(lg_c2d), np.asarray(lg_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pr_c2d), np.asarray(pr_d), atol=1e-6)
    m_d = vnet_packed.packed_argmax(pr_d, num_classes, layout="delta")
    m_c = vnet_packed.packed_argmax(pr_c, num_classes, layout="class")
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_c))


@pytest.mark.parametrize("levels", [1, 2])
def test_vnet_packed_apply_grads_exact_f64(levels):
    """packed_vnet3d_apply grad parity vs the flax VNet in f64 (dropout
    off): the weight transforms are linear, so plain-tree grads match."""
    import jax
    from tpuseg.models.vnet import VNet
    from tpuseg.models.vnet_packed import packed_vnet3d_apply

    jax.config.update("jax_enable_x64", True)
    try:
        model = VNet(ndim=3, num_classes=2, features=16, dropout=0.2)
        x32 = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 32, 32, 32, 1)),
            jnp.float32,
        )
        params = model.init(jax.random.key(0), x32)
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        params64 = to64(params)
        x64 = jnp.asarray(np.asarray(x32), jnp.float64)
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 32, 32, 32, 2)),
            jnp.float64,
        )

        def loss_plain(p):
            lg, pr = model.apply(p, x64)
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        def loss_packed(p):
            lg, pr = packed_vnet3d_apply(
                p, x64, num_classes=2, packed_levels=levels
            )
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        v1, g1 = jax.value_and_grad(loss_plain)(params64)
        v2, g2 = jax.value_and_grad(loss_packed)(params64)
        assert abs(v1 - v2) / abs(v1) < 1e-10
        from jax.tree_util import keystr, tree_leaves_with_path

        flat2 = {keystr(k): v for k, v in tree_leaves_with_path(g2)}
        for k, a in tree_leaves_with_path(g1):
            np.testing.assert_allclose(
                flat2[keystr(k)], a, rtol=1e-7, atol=1e-7,
                err_msg=f"grad mismatch at {keystr(k)}",
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_vnet_packed_trainer_step_matches_plain():
    """make_segmentation_trainer(VNet3d, packed_stem=True) matches the
    plain trainer's loss trajectory (dropout off)."""
    from tpuseg.models.vnet import VNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32),
        "label": (rng.random(size=(1, 32, 32, 32)) > 0.7).astype(np.int32),
    }
    losses = {}
    for packed in (False, True):
        tr = make_segmentation_trainer(
            model,
            example_image=batch["image"],
            num_classes=2,
            loss_name="MutilDiceLoss",
            alpha=[1.0, 1.0],
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
            packed_stem=packed,
        )
        tr._build_steps()
        state = tr.state
        db = tr._put(batch)
        ls = []
        for _ in range(3):
            state, m = tr._train_step(state, db)
            ls.append(float(m["loss"]))
        losses[packed] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)


def test_vnet_packed_dropout_runs():
    from tpuseg.models.vnet import VNet
    from tpuseg.models.vnet_packed import packed_vnet3d_apply

    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 32, 1)), jnp.float32
    )
    params = model.init(jax.random.key(0), x)
    lg0, _ = packed_vnet3d_apply(params, x, num_classes=2)
    lg1, _ = packed_vnet3d_apply(
        params, x, num_classes=2, train=True, rng=jax.random.key(7)
    )
    lg1b, _ = packed_vnet3d_apply(
        params, x, num_classes=2, train=True, rng=jax.random.key(7)
    )
    np.testing.assert_allclose(lg1, lg1b, rtol=1e-6)
    assert not np.allclose(lg0, lg1, atol=1e-3)


def test_int8_packed_inference_close_to_bf16(setup):
    """W8A8 packed conv execution (int8_packed_inference): logits stay
    within per-tensor quantization error of the flag-off forward and the
    argmax mask agrees almost everywhere on a decision-separated net."""
    from tpuseg.models import vnet_packed as vp

    x, params, _ = setup
    # nudge the head bias so random-init logits aren't all at the boundary
    p = jax.tree_util.tree_map(lambda a: a, params)
    head = p["params"]["OutputHead_0"]["ConvND_0"]["Conv_0"]
    head["bias"] = head["bias"] + jnp.asarray([0.5, -0.5])

    ref = vp.packed_vnet3d_probs(p, x, num_classes=2)
    with vp.int8_packed_inference():
        q = jax.jit(
            lambda pp, xx: vp.packed_vnet3d_probs(pp, xx, num_classes=2)
        )(p, x)
    assert np.isfinite(np.asarray(q)).all()
    agree = (np.argmax(np.asarray(q), -1) == np.argmax(np.asarray(ref), -1))
    assert agree.mean() > 0.97, agree.mean()
    # flag restored
    assert not vp.USE_INT8_PACKED


# ---------------------------------------------------------------------------
# shift-stack packed k3 (packed_k3_conv USE_SHIFT_PACKED_K3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axes", [
    (True, True, True), (False, True, True), (True, False, True),
])
def test_packed_k3_conv_shift_matches_dense(axes, monkeypatch):
    """The shift-stack k2 execution equals the dense coarse k3 on random
    packed inputs (the structural zeros it removes contribute nothing)."""
    rng = np.random.default_rng(3)
    c = 3
    p = 2 ** sum(axes)
    x = jnp.asarray(rng.normal(size=(2, 5, 4, 6, p * c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)).astype(np.float32))

    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", False)
    want = vnet_packed.packed_k3_conv((x,), w, axes)
    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", True)
    got = vnet_packed.packed_k3_conv((x,), w, axes)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_packed_k3_conv_shift_concat_perm(monkeypatch):
    """Concat-input form (decoder blocks): per-part shift + permuted
    kernel rows equals the dense path with the same permutation."""
    from tpuseg.models.unet_packed import _concat_perm

    rng = np.random.default_rng(4)
    f = 2
    axes = (True, True, True)
    up = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8 * f)).astype(np.float32))
    sk = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8 * f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2 * f, f)).astype(np.float32))
    perm = jnp.asarray(_concat_perm(f))

    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", False)
    want = vnet_packed.packed_k3_conv((up, sk), w, axes, in_perm=perm)
    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", True)
    got = vnet_packed.packed_k3_conv((up, sk), w, axes, in_perm=perm)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("levels", [1, 2])
def test_packed_vnet_exact_shift_form(setup, levels, monkeypatch):
    """Whole packed VNet forward with the shift-stack convs enabled still
    matches the plain flax model."""
    x, params, probs_ref = setup
    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", True)
    probs = np.asarray(
        vnet_packed.packed_vnet3d_probs(params, x, packed_levels=levels)
    )
    np.testing.assert_allclose(probs, probs_ref, atol=1e-4)


def test_packed_unet_exact_shift_form(monkeypatch):
    """Packed UNet forward (encoder/decoder/concat k3 sites) with the
    shift-stack convs enabled matches the plain flax model."""
    from tpuseg.models.unet import UNet
    from tpuseg.models.unet_packed import packed_unet3d_apply

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    model = UNet(ndim=3, num_classes=3, features=16, dropout=0.0)
    params = model.init(jax.random.key(2), x)
    _, probs_ref = model.apply(params, x)

    monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", True)
    _, probs = packed_unet3d_apply(params, x, num_classes=3)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(probs_ref), atol=1e-4
    )


def test_shift_form_grads_match_dense(monkeypatch):
    """Gradients through the shift-stack form match the dense coarse-k3
    form (both map to the PLAIN param tree via linear transforms)."""
    rng = np.random.default_rng(6)
    c = 2
    axes = (True, True, True)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8 * c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)).astype(np.float32))

    def loss(wf, shift):
        monkeypatch.setattr(vnet_packed, "USE_SHIFT_PACKED_K3", shift)
        y = vnet_packed.packed_k3_conv((x,), wf, axes)
        return jnp.sum(y ** 2)

    g_dense = jax.grad(lambda wf: loss(wf, False))(w)
    g_shift = jax.grad(lambda wf: loss(wf, True))(w)
    np.testing.assert_allclose(
        np.asarray(g_shift), np.asarray(g_dense), rtol=1e-4, atol=1e-5
    )


def test_affine_gn_lowp_tracks_reshape_form(monkeypatch):
    """USE_AFFINE_GN_LOWP: bf16 affine-form GN tracks the reshape form
    within bf16 precision (and is exactly gated OFF for f32 inputs)."""
    rng = np.random.default_rng(7)
    f, p = 16, 8
    scale = jnp.asarray(rng.normal(1.0, 0.2, (f,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, (f,)).astype(np.float32))
    x = jnp.asarray(rng.normal(0.5, 2.0, (2, 4, 4, 4, p * f)).astype(np.float32))

    monkeypatch.setattr(vnet_packed, "USE_AFFINE_GN_LOWP", False)
    ref = vnet_packed.gn_packed(x.astype(jnp.bfloat16), scale, bias, p=p)
    ref_f = vnet_packed.gn_fine(x.astype(jnp.bfloat16), jnp.tile(scale, p),
                                jnp.tile(bias, p))
    monkeypatch.setattr(vnet_packed, "USE_AFFINE_GN_LOWP", True)
    got = vnet_packed.gn_packed(x.astype(jnp.bfloat16), scale, bias, p=p)
    got_f = vnet_packed.gn_fine(x.astype(jnp.bfloat16), jnp.tile(scale, p),
                                jnp.tile(bias, p))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(got_f, np.float32), np.asarray(ref_f, np.float32),
        atol=0.05, rtol=0.02,
    )
    # f32 inputs: flag must not change the exact flax-form output
    monkeypatch.setattr(vnet_packed, "USE_AFFINE_GN_LOWP", False)
    y0 = vnet_packed.gn_packed(x, scale, bias, p=p)
    monkeypatch.setattr(vnet_packed, "USE_AFFINE_GN_LOWP", True)
    y1 = vnet_packed.gn_packed(x, scale, bias, p=p)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_gemm_stem_dw_matches_conv_grad(monkeypatch):
    """USE_GEMM_STEM_DW: the shift-stacked s2d GEMM filter-gradient of
    the fine->packed k4s2 conv matches XLA's grad-conv (f32, tight),
    and the fwd + dX are the unchanged convs (exact)."""
    rng = np.random.default_rng(11)
    for ci in (1, 3):  # level-0 image and a multi-channel fine input
        x = jnp.asarray(rng.normal(size=(2, 8, 10, 12, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, 4, ci, 24)).astype(np.float32))
        t = jnp.asarray(
            rng.normal(size=(2, 4, 5, 6, 24)).astype(np.float32))

        def loss(args, flag):
            monkeypatch.setattr(vnet_packed, "USE_GEMM_STEM_DW", flag)
            y = vnet_packed.conv_k4s2_fine2packed(*args)
            return jnp.sum((y - t) ** 2)

        y0 = vnet_packed.conv_k4s2_fine2packed(x, w)
        monkeypatch.setattr(vnet_packed, "USE_GEMM_STEM_DW", True)
        y1 = vnet_packed.conv_k4s2_fine2packed(x, w)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

        gx0, gw0 = jax.grad(lambda a: loss(a, False))((x, w))
        gx1, gw1 = jax.grad(lambda a: loss(a, True))((x, w))
        np.testing.assert_allclose(
            np.asarray(gx1), np.asarray(gx0), rtol=1e-5, atol=1e-5)
        # reduction order differs (one long GEMM vs the conv's spatial
        # tiling): tolerance scaled to the gradient magnitude
        tol = 1e-5 * float(jnp.max(jnp.abs(gw0)))
        np.testing.assert_allclose(
            np.asarray(gw1), np.asarray(gw0), rtol=1e-4, atol=tol)


def test_affine_gn_lowp_grads_track(monkeypatch):
    """Backward numerics for the affine-GN flip: bf16 parameter and
    input gradients track the reshape form within bf16 rounding."""
    rng = np.random.default_rng(3)
    f, p = 16, 8
    scale = jnp.asarray(rng.normal(1.0, 0.2, (f,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, (f,)).astype(np.float32))
    x = jnp.asarray(
        rng.normal(0.5, 2.0, (2, 4, 4, 4, p * f)).astype(np.float32))
    t = jnp.asarray(
        rng.normal(size=(2, 4, 4, 4, p * f)).astype(np.float32))

    def loss(args, flag):
        monkeypatch.setattr(vnet_packed, "USE_AFFINE_GN_LOWP", flag)
        xx, s, b = args
        y = vnet_packed.gn_packed(xx.astype(jnp.bfloat16), s, b, p=p)
        return jnp.sum((y.astype(jnp.float32) - t) ** 2)

    g0 = jax.grad(lambda a: loss(a, False))((x, scale, bias))
    g1 = jax.grad(lambda a: loss(a, True))((x, scale, bias))
    for a, b_, name in zip(g0, g1, ("x", "scale", "bias")):
        ref = np.asarray(a)
        tol = 0.03 * max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(b_), ref, atol=tol,
            err_msg=f"affine-GN bf16 grad drift on {name}")
