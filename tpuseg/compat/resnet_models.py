"""Reference-compatible ResNet classification Model classes.

API parity with `/root/reference/model/modelResNet.py`:
BinaryResNet2dModel (`:22`), MutilResNet2dModel (`:228`, incl. the
Grad-CAM hook `Grad_CAM_Visual:419`), BinaryResNet3dModel (`:444`),
MutilResNet3dModel (`:654`) — accuracy metric, sigmoid/softmax predict —
as adapters over the generic classification trainer.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.data.dataset import ClassifyDataset2D, ClassifyDataset3D, DataLoader
from tpuseg.models.resnet import ResNetClassifier
from tpuseg.tasks.classification import make_classification_trainer
from tpuseg.tasks.trainer import TrainerConfig
from tpuseg.tools.visualization import plot_result


class _ResNetModelBase:
    ndim = 2
    binary = True

    def __init__(
        self,
        *,
        image_depth: int = 0,
        image_height: int,
        image_width: int,
        image_channel: int,
        numclass: int,
        batch_size: int,
        loss_name: str = "BinaryCrossEntropyLoss",
        inference: bool = False,
        model_path: Optional[str] = None,
        use_cuda: bool = True,
        mesh=None,
    ):
        self.image_depth = image_depth
        self.image_height = image_height
        self.image_width = image_width
        self.image_channel = image_channel
        self.numclass = numclass
        self.batch_size = batch_size
        self.loss_name = loss_name
        self.mesh = mesh

        out = 1 if (self.binary and numclass <= 2) else numclass
        self.out_units = out
        self.model = ResNetClassifier(ndim=self.ndim, num_classes=out)
        spatial = (
            (image_depth, image_height, image_width)
            if self.ndim == 3
            else (image_height, image_width)
        )
        self._example = np.zeros((1, *spatial, image_channel), np.float32)
        self.trainer = None
        self._jit_forward = None

        if inference and model_path:
            self._ensure_trainer()
            if os.path.isfile(model_path) and str(model_path).endswith((".pth", ".pt")):
                self.load_torch_checkpoint(model_path)  # reference .pth
            else:
                load_dir = model_path if os.path.isdir(model_path) else os.path.dirname(model_path)
                self.trainer.load(load_dir, "best")

    def load_torch_checkpoint(self, path_or_state_dict):
        """Load a reference-framework ResNet ``.pth`` state_dict
        (`modelResNet.py` torch.save) — layouts converted by
        `tpuseg.compat.torch_import`, parity pinned by tests."""
        from tpuseg.compat.torch_import import params_from_torch_checkpoint

        self._ensure_trainer()
        params = params_from_torch_checkpoint(path_or_state_dict, "resnet")
        # keep the other variable collections (e.g. Grad-CAM perturbations)
        cur = dict(self.trainer.state["params"])
        cur["params"] = jax.tree_util.tree_map(jnp.asarray, params)
        self.trainer.state["params"] = cur
        self._jit_forward = None

    def _ensure_trainer(self, epochs: int = 1, lr: float = 1e-3):
        if self.trainer is None:
            self.trainer = make_classification_trainer(
                self.model,
                self._example,
                num_classes=self.out_units,
                loss_name=self.loss_name,
                config=TrainerConfig(epochs=epochs, lr=lr, optimizer="adam"),
                mesh=self.mesh,
            )
        else:
            self.trainer.config.epochs = epochs
            self.trainer.config.lr = lr
        return self.trainer

    def _dataloader(self, images, labels, shuffle=False):
        if self.ndim == 2:
            ds = ClassifyDataset2D(
                images, labels, (self.image_height, self.image_width),
                self.image_channel,
            )
        else:
            ds = ClassifyDataset3D(images, labels)
        return DataLoader(ds, batch_size=self.batch_size, shuffle=shuffle)

    def trainprocess(
        self, trainimage, trainlabel, valimage, vallabel, model_dir,
        epochs: int = 50, lr: float = 1e-3, resume: bool = False,
    ):
        print("[INFO] training the network...")
        os.makedirs(model_dir, exist_ok=True)
        trainer = self._ensure_trainer(epochs, lr)
        tl = self._dataloader(trainimage, trainlabel, shuffle=True)
        vl = self._dataloader(valimage, vallabel, shuffle=False)
        history = trainer.fit(lambda: iter(tl), lambda: iter(vl), model_dir, resume=resume)
        plot_result(model_dir, history["train_loss"], history["valdation_loss"],
                    "train_loss", "valdation_loss", "loss")
        plot_result(model_dir, history["train_accuracy"], history["valdation_accuracy"],
                    "train_accuracy", "valdation_accuracy", "accuracy")
        return history

    def predict(self, full_img: np.ndarray):
        """channel-first image in → (label, probability) out
        (`modelResNet.py` sigmoid/softmax predict)."""
        self._ensure_trainer()
        if self._jit_forward is None:
            model = self.model

            @jax.jit
            def fwd(params, x):
                return model.apply(params, x)

            self._jit_forward = fwd
        img = np.moveaxis(np.asarray(full_img, np.float32), 0, -1)[None]
        logits = np.asarray(
            self._jit_forward(self.trainer.state["params"], jnp.asarray(img))
        )[0]
        if self.out_units == 1:
            prob = 1.0 / (1.0 + np.exp(-float(logits[0])))
            return int(prob > 0.5), prob
        e = np.exp(logits - logits.max())
        probs = e / e.sum()
        return int(np.argmax(probs)), probs

    def Grad_CAM_Visual(self, full_img, target_category=None, target_layers=None):
        """`modelResNet.py:419-426`: grayscale class-activation map at input
        resolution for a channel-first image.  ``target_layers`` is accepted
        for signature parity only — tpuseg's ResNetClassifier always sows its
        last conv feature map (the reference passes that same layer)."""
        from tpuseg.tools.gradcam import grad_cam

        self._ensure_trainer()
        img = np.moveaxis(np.asarray(full_img, np.float32), 0, -1)[None]
        return grad_cam(
            self.model, self.trainer.state["params"], img, target_category
        )

    def clear_GPU_cache(self):
        pass


def _make(name, ndim, binary):
    class Model(_ResNetModelBase):
        pass

    Model.__name__ = name
    Model.ndim = ndim
    Model.binary = binary

    if ndim == 2:
        def __init__(self, image_height, image_width, image_channel, numclass,
                     batch_size, loss_name="BinaryCrossEntropyLoss",
                     inference=False, model_path=None, use_cuda=True, **kw):
            _ResNetModelBase.__init__(
                self, image_height=image_height, image_width=image_width,
                image_channel=image_channel, numclass=numclass,
                batch_size=batch_size, loss_name=loss_name,
                inference=inference, model_path=model_path, use_cuda=use_cuda,
                **kw)
    else:
        def __init__(self, image_depth, image_height, image_width,
                     image_channel, numclass, batch_size,
                     loss_name="BinaryCrossEntropyLoss", inference=False,
                     model_path=None, use_cuda=True, **kw):
            _ResNetModelBase.__init__(
                self, image_depth=image_depth, image_height=image_height,
                image_width=image_width, image_channel=image_channel,
                numclass=numclass, batch_size=batch_size, loss_name=loss_name,
                inference=inference, model_path=model_path, use_cuda=use_cuda,
                **kw)

    Model.__init__ = __init__
    return Model


BinaryResNet2dModel = _make("BinaryResNet2dModel", 2, True)
MutilResNet2dModel = _make("MutilResNet2dModel", 2, False)
BinaryResNet3dModel = _make("BinaryResNet3dModel", 3, True)
MutilResNet3dModel = _make("MutilResNet3dModel", 3, False)
