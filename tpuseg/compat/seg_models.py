"""Reference-compatible Model classes (segmentation).

API parity with `/root/reference/model/__init__.py:1-3`'s twelve exports —
same constructor signatures, `trainprocess`, `predict`, `inference`,
`inference_patch`, `clear_GPU_cache` — implemented as thin adapters over
the generic tpuseg Trainer (the reference's 12 classes are ~95% clones of
one template, SURVEY.md §1; here the template exists once).

Boundary conventions preserved from the reference:
 * `predict` accepts channel-FIRST numpy ((C,H,W) / (C,D,H,W),
   `modelUnet.py:953-974`) and returns a uint8 label map;
 * `trainprocess(trainimage, trainmask, valimage, valmask, model_dir,
   epochs, lr[, showwind])` reads path lists, logs to TensorBoard, saves
   the best-by-validation-dice checkpoint, and dumps loss/accuracy curves
   (`modelUnet.py:535-659`);
 * binary models map labels !=0 → 1 (`modelUnet.py:574`);
 * alpha/gamma defaults mirror the reference per class: binary
   (0.25, 2) `modelUnet.py:40-41`; mutil 2D ([1]*C, 2) `:264-265`;
   mutil 3D ([1]*C, 3) `:786-788`;
 * `use_cuda` is accepted for signature parity and ignored (TPU).

Differences (capabilities the reference lacks): a ``mesh`` kwarg for
data-parallel training, `resume=True`, and optimizer-state checkpoints.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.data.dataset import DataLoader, SegDataset2D, SegDataset3D
from tpuseg.data.geometry import Volume
from tpuseg.data.normalize import percentile_zscore, truncate_and_normalize
from tpuseg.infer.sliding_window import probs_to_mask
from tpuseg.infer.volume import infer_volume, infer_volume_patched
from tpuseg.models.unet import UNet
from tpuseg.models.vnet import VNet
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig
from tpuseg.tools.visualization import make_seg_viz, plot_result


class _SegModelBase:
    ndim = 2
    binary = True
    network = "unet"
    ckpt_name = "model"
    optimizer = "adamw"  # reference: AdamW for 2D, Adam for 3D

    def __init__(
        self,
        *,
        image_depth: int = 0,
        image_height: int,
        image_width: int,
        image_channel: int,
        numclass: int,
        batch_size: int,
        loss_name: str,
        inference: bool = False,
        model_path: Optional[str] = None,
        use_cuda: bool = True,
        mesh=None,
        features: int = 16,
    ):
        self.image_depth = image_depth
        self.image_height = image_height
        self.image_width = image_width
        self.image_channel = image_channel
        self.numclass = numclass
        self.batch_size = batch_size
        self.loss_name = loss_name
        self.accuracyname = "dice"
        self.mesh = mesh
        if self.binary:
            self.alpha, self.gamma = 0.25, 2
        else:
            self.alpha = [1.0] * numclass
            self.gamma = 3 if self.ndim == 3 else 2

        if self.network == "unet":
            self.model = UNet(ndim=self.ndim, num_classes=numclass, features=features)
        else:
            self.model = VNet(ndim=self.ndim, num_classes=numclass, features=features)

        spatial = (
            (image_depth, image_height, image_width)
            if self.ndim == 3
            else (image_height, image_width)
        )
        self._example = np.zeros((1, *spatial, image_channel), np.float32)
        self._spatial = spatial
        self.trainer = None
        self._jit_forward = None
        self._apply_cache = {}

        if inference:
            print(f"Loading model {model_path}")
            self._ensure_trainer()
            if model_path and os.path.isfile(model_path) and str(model_path).endswith(
                (".pth", ".pt")
            ):
                # a checkpoint saved by the reference torch framework
                # (`modelUnet.py:943` torch.save(state_dict)) — import it
                self.load_torch_checkpoint(model_path)
            elif model_path and os.path.isdir(os.path.dirname(model_path) or "."):
                # model_path may be the run dir or the dir containing best/
                load_dir = model_path if os.path.isdir(model_path) else os.path.dirname(model_path)
                self.trainer.load(load_dir, "best")
            print("Model loaded!")

    def load_torch_checkpoint(self, path_or_state_dict):
        """One-line migration from the reference framework: load a torch
        ``.pth`` state_dict (as saved by `modelUnet.py:943`) into this
        model's parameters.  Layout/naming conversion in
        `tpuseg.compat.torch_import` (forward parity pinned by tests)."""
        from tpuseg.compat.torch_import import params_from_torch_checkpoint

        self._ensure_trainer()
        params = params_from_torch_checkpoint(path_or_state_dict, self.network)
        # trainer params are the full flax variables dict {"params": tree};
        # keep any other variable collections the network may carry
        cur = dict(self.trainer.state["params"])
        cur["params"] = jax.tree_util.tree_map(jnp.asarray, params)
        self.trainer.state["params"] = cur
        self._jit_forward = None  # drop any forward jitted on old params
        self._apply_cache.clear()

    # ------------------------------------------------------------ plumbing
    def _ensure_trainer(self, epochs: int = 1, lr: float = 1e-3):
        if self.trainer is None:
            self.trainer = make_segmentation_trainer(
                self.model,
                example_image=self._example,
                num_classes=self.numclass,
                loss_name=self.loss_name,
                alpha=self.alpha if not self.binary else self.alpha,
                gamma=self.gamma,
                accuracy_name=self.accuracyname,
                config=TrainerConfig(epochs=epochs, lr=lr, optimizer=self.optimizer),
                mesh=self.mesh,
                viz_fn=make_seg_viz(self.numclass, self.ndim),
            )
        else:
            self.trainer.config.epochs = epochs
            self.trainer.config.lr = lr
        return self.trainer

    def _dataloader(self, images, labels, shuffle=False):
        if self.ndim == 2:
            ds = SegDataset2D(
                images, labels, (self.image_height, self.image_width), self.binary
            )
        else:
            ds = SegDataset3D(images, labels, binary=self.binary)
        return DataLoader(ds, batch_size=self.batch_size, shuffle=shuffle)

    # ------------------------------------------------------------ training
    def trainprocess(
        self,
        trainimage: Sequence[str],
        trainmask: Sequence[str],
        validationimage: Sequence[str],
        validationmask: Sequence[str],
        model_dir: str,
        epochs: int = 50,
        lr: float = 1e-3,
        showwind=(8, 8),
        resume: bool = False,
    ):
        print("[INFO] training the network...")
        os.makedirs(model_dir, exist_ok=True)
        trainer = self._ensure_trainer(epochs, lr)
        from tpuseg.tools.summary import print_summary

        print_summary(trainer.state["params"], type(self).__name__)
        trainer.viz_fn = make_seg_viz(self.numclass, self.ndim, tuple(showwind))
        train_loader = self._dataloader(trainimage, trainmask, shuffle=True)
        val_loader = self._dataloader(validationimage, validationmask, shuffle=False)
        history = trainer.fit(
            lambda: iter(train_loader),
            lambda: iter(val_loader),
            model_dir,
            resume=resume,
        )
        plot_result(
            model_dir, history["train_loss"], history["valdation_loss"],
            "train_loss", "valdation_loss", "loss",
        )
        plot_result(
            model_dir, history["train_accuracy"], history["valdation_accuracy"],
            "train_accuracy", "valdation_accuracy", "accuracy",
        )
        self.clear_GPU_cache()
        return history

    # ----------------------------------------------------------- inference
    # Space-to-depth packed 3D execution (models/{unet,vnet}_packed.py):
    # exact compile-time weight transforms of the same parameter tree that
    # put >=128 channels on the vector lanes at the finest levels —
    # measured 1.5-2.6x on chip (BASELINE.md round 3).  Set False on an
    # instance/class to force the plain flax apply.
    packed_inference = True

    def _supports_packed(self, spatial) -> bool:
        if self.ndim != 3 or not self.packed_inference:
            return False
        if self.network == "vnet":
            return all(s > 0 and s % 32 == 0 for s in spatial)
        if self.network == "unet":
            div = 2 ** self.model.levels
            return all(s > 0 and s % div == 0 for s in spatial)
        return False

    # packed-probs channel order handed to the sliding-window merge when
    # return_packed: "class" (k*8+delta) runs the per-delta softmax as
    # contiguous slice arithmetic — no (...,8,K) reshape in the per-patch
    # program (models/vnet_packed.py pack_head_1x1)
    packed_probs_layout = "class"

    def _probs_apply(self, spatial, return_packed: bool = False):
        """(N, *spatial, C) -> probs apply fn for the 3D volume paths.

        Returns ``(fn, jitted_fn, packed)``: the packed forward when the
        spatial shape divides the packing factor, the plain flax apply
        otherwise.  Cached per parameter tree so the sliding-window jit
        (``apply_fn`` is a static argument) reuses its compiled program
        across calls instead of retracing per call."""
        self._ensure_trainer()
        params = self.trainer.state["params"]
        packed = self._supports_packed(spatial)
        layout = self.packed_probs_layout
        key = (packed, bool(return_packed and packed), layout, id(params))
        hit = self._apply_cache.get(key)
        if hit is not None:
            return hit[0], hit[1], packed
        if packed and self.network == "vnet":
            from tpuseg.models.vnet_packed import packed_vnet3d_probs

            nc, f, rp = self.numclass, self.model.features, return_packed

            def fn(x):
                return packed_vnet3d_probs(
                    params, x, num_classes=nc, features=f, return_packed=rp,
                    packed_layout=layout,
                )
        elif packed:
            from tpuseg.models.unet_packed import packed_unet3d_apply

            nc, f, rp = self.numclass, self.model.features, return_packed
            lv = self.model.levels

            def fn(x):
                _, probs = packed_unet3d_apply(
                    params, x, num_classes=nc, features=f, levels=lv,
                    return_packed=rp, packed_layout=layout,
                )
                return probs
        else:
            model = self.model

            def fn(x):
                _, probs = model.apply(params, x)
                return probs

        # the closure bakes `params` into the compiled program — keep the
        # tree referenced so the id() key can't be recycled after GC; any
        # params update produces a new tree and therefore a new cache row
        entry = (fn, jax.jit(fn), params)
        self._apply_cache[key] = entry
        return entry[0], entry[1], packed

    def _forward_probs(self, batch_chlast: np.ndarray) -> np.ndarray:
        self._ensure_trainer()
        if self._jit_forward is None:
            model = self.model

            @jax.jit
            def fwd(params, x):
                _, probs = model.apply(params, x)
                return probs

            self._jit_forward = fwd
        return np.asarray(
            self._jit_forward(self.trainer.state["params"], jnp.asarray(batch_chlast))
        )

    def predict(self, full_img: np.ndarray, out_threshold: float = 0.5) -> np.ndarray:
        """channel-first (C, *spatial) in → uint8 (*spatial) label map out.

        The threshold/argmax runs on device and only the uint8 mask is
        fetched (the reference pulls the full float probability volume to
        host first, `modelUnet.py:963-966`)."""
        self._ensure_trainer()
        if getattr(self, "_jit_mask_fwd", None) is None:
            model, numclass = self.model, self.numclass

            @jax.jit
            def fwd_mask(params, x, thr):
                _, probs = model.apply(params, x)
                if numclass == 1:
                    return (probs[..., 0] > thr).astype(jnp.uint8)
                return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

            self._jit_mask_fwd = fwd_mask
        img = np.asarray(full_img, np.float32)
        img = np.moveaxis(img, 0, -1)[None]  # (1, *spatial, C)
        mask = self._jit_mask_fwd(
            self.trainer.state["params"], jnp.asarray(img), out_threshold
        )
        return np.asarray(mask)[0]

    def clear_GPU_cache(self):
        # No-op on TPU: XLA owns HBM for the process (the reference calls
        # torch.cuda.empty_cache(), `modelUnet.py:765-767`).
        pass


class _Seg3dMixin:
    inference_normalizer = staticmethod(percentile_zscore)

    def inference(self, imagesitk: Volume, newSize=(96, 96, 96)) -> Volume:
        self._ensure_trainer()

        def forward(batch):
            _, jfn, _ = self._probs_apply(tuple(batch.shape[1:4]))
            return np.asarray(jfn(jnp.asarray(batch)))

        return infer_volume(
            imagesitk,
            forward,
            newSize,
            num_classes=self.numclass,
            normalizer=self.inference_normalizer,
        )

    def inference_patch(
        self,
        imagesitk: Volume,
        newSpacing=(0.5, 0.5, 0.5),
        patch=None,
        batch_size: int = 8,
        transfer_dtype=None,
    ) -> Volume:
        """Batched sliding-window inference (`modelUnet.py:707`).

        ``transfer_dtype="uint8"`` uploads 1-byte HU codes (the
        [-1024,-800] window spans 224 levels, 1 HU each; exact for
        integer HU — after the linear spacing resample interpolated
        voxels quantize at <=0.5 HU, finer than a bf16 upload) — use it
        on link-bound deployments."""
        self._ensure_trainer()
        patch = patch or (self.image_depth, self.image_height, self.image_width)
        apply_fn, _, packed = self._probs_apply(tuple(patch), return_packed=True)

        return infer_volume_patched(
            imagesitk,
            apply_fn,
            patch,
            num_classes=self.numclass,
            new_spacing_xyz=newSpacing,
            hu_window=(-800, -1024, "meanstd"),
            batch_size=batch_size,
            transfer_dtype=transfer_dtype,
            packed_apply=packed,
            packed_layout=self.packed_probs_layout,
        )


class _Seg2dMixin:
    def inference(self, image: np.ndarray) -> np.ndarray:
        """2D path (`modelUnet.py:218-247`): resize → z-score → predict →
        resize back with nearest (reference's transposed-resize defect at
        `modelUnet.py:241` not reproduced)."""
        import cv2

        src_h, src_w = image.shape[:2]
        img = cv2.resize(
            image.astype(np.float32), (self.image_width, self.image_height)
        )
        std = img.std() or 1.0
        img = (img - img.mean()) / std
        if img.ndim == 2:
            img = img[None]
        else:
            img = np.moveaxis(img, -1, 0)
        mask = self.predict(img)
        return cv2.resize(mask, (src_w, src_h), interpolation=cv2.INTER_NEAREST)


def _make_2d(name, net, binary, opt):
    class Model(_Seg2dMixin, _SegModelBase):
        pass

    Model.__name__ = name
    Model.ndim = 2
    Model.binary = binary
    Model.network = net
    Model.ckpt_name = name.replace("Model", "")
    Model.optimizer = opt

    def __init__(
        self, image_height, image_width, image_channel, numclass, batch_size,
        loss_name="BinaryDiceLoss", inference=False, model_path=None,
        use_cuda=True, **kw,
    ):
        _SegModelBase.__init__(
            self,
            image_height=image_height, image_width=image_width,
            image_channel=image_channel, numclass=numclass,
            batch_size=batch_size, loss_name=loss_name, inference=inference,
            model_path=model_path, use_cuda=use_cuda, **kw,
        )

    Model.__init__ = __init__
    return Model


def _make_3d(name, net, binary):
    class Model(_Seg3dMixin, _SegModelBase):
        pass

    Model.__name__ = name
    Model.ndim = 3
    Model.binary = binary
    Model.network = net
    Model.ckpt_name = name.replace("Model", "")
    Model.optimizer = "adam"  # reference 3D models use Adam (`modelUnet.py:849`)

    def __init__(
        self, image_depth, image_height, image_width, image_channel, numclass,
        batch_size, loss_name="BinaryDiceLoss", inference=False,
        model_path=None, use_cuda=True, **kw,
    ):
        _SegModelBase.__init__(
            self,
            image_depth=image_depth, image_height=image_height,
            image_width=image_width, image_channel=image_channel,
            numclass=numclass, batch_size=batch_size, loss_name=loss_name,
            inference=inference, model_path=model_path, use_cuda=use_cuda, **kw,
        )

    Model.__init__ = __init__
    return Model


BinaryUNet2dModel = _make_2d("BinaryUNet2dModel", "unet", True, "adamw")
MutilUNet2dModel = _make_2d("MutilUNet2dModel", "unet", False, "adamw")
BinaryVNet2dModel = _make_2d("BinaryVNet2dModel", "vnet", True, "adamw")
MutilVNet2dModel = _make_2d("MutilVNet2dModel", "vnet", False, "adamw")

BinaryUNet3dModel = _make_3d("BinaryUNet3dModel", "unet", True)
MutilUNet3dModel = _make_3d("MutilUNet3dModel", "unet", False)
BinaryVNet3dModel = _make_3d("BinaryVNet3dModel", "vnet", True)
MutilVNet3dModel = _make_3d("MutilVNet3dModel", "vnet", False)

# VNet3d inference applies the HU-truncation normalizer
# (`modelVNet.py:681`: ConvertitkTrunctedValue(.., 100, -100, 'meanstd')).
for _cls in (BinaryVNet3dModel, MutilVNet3dModel):
    _cls.inference_normalizer = staticmethod(
        lambda a: truncate_and_normalize(a, 100, -100, "meanstd")
    )
