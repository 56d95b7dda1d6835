"""Reference-compatible Pixel2PixelGAN2dModel.

API parity with `/root/reference/model/modelPixel2PixelGAN.py:213-520`:
constructor signature, `trainprocess(trainimage, traintarget, valimage,
valtarget, model_dir, epochs, lr)`, `predict(full_img)`, `inference(img)`,
`clear_GPU_cache()` — over the fused-jit GANTrainer.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from tpuseg.core.mesh import MeshContext
from tpuseg.data.dataset import DataLoader, RegressionDataset2D
from tpuseg.tasks.gan import GANTrainer
from tpuseg.tools.visualization import plot_result, save_images2dregression


class Pixel2PixelGAN2dModel:
    def __init__(
        self,
        image_height: int,
        image_width: int,
        image_channel: int,
        numclass: int,
        batch_size: int,
        inference: bool = False,
        model_path: Optional[str] = None,
        num_cpu: int = 4,
        use_cuda: bool = True,
        mesh: Optional[MeshContext] = None,
        features: int = 16,
    ):
        self.image_height = image_height
        self.image_width = image_width
        self.image_channel = image_channel
        self.numclass = numclass
        self.batch_size = batch_size
        self.accuracyname = ["PSNR", "SSIM"]
        self.alpha = 100  # recon weight (`modelPixel2PixelGAN.py:230`)

        self.trainer = GANTrainer(
            image_channel=image_channel,
            d_out_channels=numclass,
            features=features,
            recon_weight=self.alpha,
            mesh=mesh,
            example_hw=(image_height, image_width),
        )
        if inference and model_path:
            if os.path.isfile(model_path) and str(model_path).endswith((".pth", ".pt")):
                self.load_torch_generator(model_path)  # reference G .pth
            else:
                load_dir = model_path if os.path.isdir(model_path) else os.path.dirname(model_path)
                self.trainer.load(load_dir, "best")

    def load_torch_generator(self, path_or_state_dict):
        """Load a reference-framework generator ``.pth`` (the best-G /
        latest-G files of `modelPixel2PixelGAN.py:459-472`) into this
        model's generator.  Layouts converted by tpuseg.compat.torch_import
        (parity tested); the discriminator is a tpuseg re-design and is
        left untouched (it only matters for further training)."""
        import jax
        import jax.numpy as jnp

        from tpuseg.compat.torch_import import params_from_torch_checkpoint

        params = params_from_torch_checkpoint(
            path_or_state_dict, "pix2pix_generator"
        )
        self.trainer.state["g_params"] = jax.tree_util.tree_map(
            jnp.asarray, {"params": params}
        )

    def _dataloader(self, images, targets, shuffle=False):
        ds = RegressionDataset2D(
            images, targets, (self.image_height, self.image_width)
        )
        return DataLoader(ds, batch_size=self.batch_size, shuffle=shuffle)

    def trainprocess(
        self, trainimage, traintarget, valimage, valtarget, model_dir,
        epochs: int = 100, lr: float = 2e-4,
    ):
        print("[INFO] training the GAN...")
        os.makedirs(model_dir, exist_ok=True)
        tl = self._dataloader(trainimage, traintarget, shuffle=True)
        vl = self._dataloader(valimage, valtarget, shuffle=False)

        def viz(model_dir_, epoch, fake, batch):
            save_images2dregression(
                batch["image"][0], fake[0], batch["target"][0],
                os.path.join(model_dir_, f"{epoch + 1}_Val_EPOCH_"),
            )

        history = self.trainer.fit(
            lambda: iter(tl), lambda: iter(vl), model_dir, epochs=epochs, viz_fn=viz
        )
        plot_result(model_dir, history["g_loss"], history["d_loss"],
                    "g_loss", "d_loss", "loss")
        plot_result(model_dir, history["psnr"], history["ssim"],
                    "psnr", "ssim", "accuracy")
        return history

    def predict(self, full_img: np.ndarray) -> np.ndarray:
        """channel-first (C,H,W) z-scored image → generated image (H,W)."""
        img = np.moveaxis(np.asarray(full_img, np.float32), 0, -1)[None]
        fake = self.trainer.generate(img)[0]
        return fake[..., 0] if fake.shape[-1] == 1 else fake

    def inference(self, image: np.ndarray) -> np.ndarray:
        import cv2

        src_h, src_w = image.shape[:2]
        img = cv2.resize(
            image.astype(np.float32), (self.image_width, self.image_height)
        )
        std = img.std() or 1.0
        mean = img.mean()
        out = self.predict(((img - mean) / std)[None])
        out = out * std + mean  # de-normalize like the dataset's z-score
        return cv2.resize(out, (src_w, src_h))

    def clear_GPU_cache(self):
        pass
