"""Pix2pix GAN trainer — the two-optimizer pattern (SURVEY.md §3.5).

Capability parity with `/root/reference/model/modelPixel2PixelGAN.py:
213-520` (Pixel2PixelGAN2dModel): Adam(β1=0.5, β2=0.999) for both nets,
StepLR(50, γ=0.5), G loss = MSE(D(G(x),x), 1) + 100·L1(G(x), y), D loss =
(MSE(D(y,x),1) + MSE(D(G(x),x),0))/2, PSNR/SSIM validation metrics
(computed on-device with the de-normalization the reference intends —
its 2-arg calls to 4-arg calc_psnr/ssim, `modelPixel2PixelGAN.py:278-280`,
crash; SURVEY §7.4), best-G / best-D / latest checkpoints, early stop
after epochs/3 stale epochs.

TPU-native: the G update and D update are fused into ONE jitted step
(both grads, both optimizer updates), batches sharded over the mesh data
axis.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import checkpoint as ckpt_lib
from tpuseg.core import optim as optim_lib
from tpuseg.core.mesh import MeshContext, single_device_mesh, shard_batch_pytree
from tpuseg.core.prng import step_key
from tpuseg.losses.ssim import ssim as ssim_metric
from tpuseg.metrics.online import psnr as psnr_metric
from tpuseg.models.pix2pix import Discriminator2d, GeneratorUNet2d


class GANTrainer:
    def __init__(
        self,
        image_channel: int = 1,
        d_out_channels: int = 1,
        features: int = 16,
        recon_weight: float = 100.0,
        lr: float = 2e-4,
        lr_step: int = 50,
        lr_gamma: float = 0.5,
        mesh: Optional[MeshContext] = None,
        example_hw=(256, 256),
        seed: int = 0,
    ):
        self.mesh = mesh or MeshContext(single_device_mesh())
        self.recon_weight = recon_weight
        self.generator = GeneratorUNet2d(out_channels=image_channel, features=features)
        self.discriminator = Discriminator2d(out_channels=d_out_channels)

        x = jnp.zeros((1, *example_hw, image_channel), jnp.float32)
        gp = self.generator.init(jax.random.key(seed), x)
        dp = self.discriminator.init(jax.random.key(seed + 1), x, x)

        sched = optim_lib.step_decay_schedule(lr, lr_step, lr_gamma)
        self.tx_g = optim_lib.adam(sched, b1=0.5, b2=0.999)
        self.tx_d = optim_lib.adam(sched, b1=0.5, b2=0.999)
        self.state = {
            "g_params": gp,
            "d_params": dp,
            "g_opt": self.tx_g.init(gp),
            "d_opt": self.tx_d.init(dp),
            "key": jax.random.key_data(jax.random.key(seed)),
            "step": jnp.asarray(0, jnp.int32),
        }
        self._step = None
        self._eval = None

    def _build(self):
        gen, disc = self.generator, self.discriminator
        tx_g, tx_d, alpha = self.tx_g, self.tx_d, self.recon_weight

        def mse(a, b):
            return jnp.mean((a - b) ** 2)

        def gan_step(state, batch):
            x, y = batch["image"], batch["target"]
            rng = step_key(jax.random.wrap_key_data(state["key"]), state["step"])
            r1, r2 = jax.random.split(rng)

            def g_loss_fn(gp):
                fake = gen.apply(gp, x, train=True, rngs={"dropout": r1})
                d_fake = disc.apply(state["d_params"], fake, x)
                loss_gan = mse(d_fake, jnp.ones_like(d_fake))
                loss_rec = jnp.mean(jnp.abs(fake - y))
                return loss_gan + alpha * loss_rec, (fake, loss_gan, loss_rec)

            (g_loss, (fake, loss_gan, loss_rec)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state["g_params"])
            g_upd, g_opt = tx_g.update(g_grads, state["g_opt"], state["g_params"])
            g_params = optim_lib.apply_updates(state["g_params"], g_upd)

            def d_loss_fn(dp):
                fake2 = gen.apply(g_params, x, train=True, rngs={"dropout": r2})
                d_real = disc.apply(dp, y, x)
                d_fake = disc.apply(dp, jax.lax.stop_gradient(fake2), x)
                return 0.5 * (
                    mse(d_real, jnp.ones_like(d_real))
                    + mse(d_fake, jnp.zeros_like(d_fake))
                )

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state["d_params"])
            d_upd, d_opt = tx_d.update(d_grads, state["d_opt"], state["d_params"])
            d_params = optim_lib.apply_updates(state["d_params"], d_upd)

            new_state = {
                "g_params": g_params, "d_params": d_params,
                "g_opt": g_opt, "d_opt": d_opt,
                "key": state["key"], "step": state["step"] + 1,
            }
            return new_state, {
                "g_loss": g_loss, "d_loss": d_loss,
                "gan": loss_gan, "recon": loss_rec,
            }

        def eval_step(state, batch):
            x, y = batch["image"], batch["target"]
            fake = gen.apply(state["g_params"], x)
            mean = batch.get("mean")
            std = batch.get("std")
            return {
                "fake": fake,
                "psnr": psnr_metric(fake, y, mean, std),
                "ssim": ssim_metric(fake, y),
                "l1": jnp.mean(jnp.abs(fake - y)),
            }

        self._step = jax.jit(gan_step, donate_argnums=(0,))
        self._eval = jax.jit(eval_step)

    def fit(self, train_batches, val_batches, model_dir, epochs: int = 100,
            writer=None, viz_fn=None):
        if self._step is None:
            self._build()
        os.makedirs(model_dir, exist_ok=True)
        mgr_g = ckpt_lib.CheckpointManager(os.path.join(model_dir, "G"), mode="min")
        mgr_d = ckpt_lib.CheckpointManager(os.path.join(model_dir, "D"), mode="min")
        if writer is None:
            try:
                from tensorboardX import SummaryWriter
                writer = SummaryWriter(log_dir=model_dir)
            except Exception:
                writer = None
        history = {"g_loss": [], "d_loss": [], "psnr": [], "ssim": []}
        best_epoch, t0 = 0, time.time()
        best_g = None
        for epoch in range(epochs):
            gl = dl = n = 0.0
            for batch in train_batches():
                self.state, m = self._step(
                    self.state, shard_batch_pytree(self.mesh.mesh, batch)
                )
                gl += float(m["g_loss"]); dl += float(m["d_loss"]); n += 1
            gl, dl = gl / max(n, 1), dl / max(n, 1)
            ps = ss = vn = 0.0
            for i, batch in enumerate(val_batches()):
                m = self._eval(self.state, shard_batch_pytree(self.mesh.mesh, batch))
                ps += float(m["psnr"]); ss += float(m["ssim"]); vn += 1
                if i == 0 and viz_fn is not None:
                    viz_fn(model_dir, epoch, np.asarray(m["fake"]), batch)
            ps, ss = ps / max(vn, 1), ss / max(vn, 1)
            history["g_loss"].append(gl); history["d_loss"].append(dl)
            history["psnr"].append(ps); history["ssim"].append(ss)
            print(f"[INFO] EPOCH {epoch + 1}/{epochs} G: {gl:.4f} D: {dl:.4f} "
                  f"PSNR: {ps:.3f} SSIM: {ss:.4f}")
            if writer is not None:
                for k, v in (("Train/G_loss", gl), ("Train/D_loss", dl),
                             ("Valid/PSNR", ps), ("Valid/SSIM", ss)):
                    writer.add_scalar(k, v, epoch + 1)
                writer.flush()
            step = int(jax.device_get(self.state["step"]))
            if mgr_g.maybe_save_best(self.state, step, gl):
                best_epoch = epoch
            mgr_d.maybe_save_best(self.state, step, dl)
            mgr_g.save_latest(self.state, step, gl, epoch=epoch + 1)
            mgr_g.wait(); mgr_d.wait()
            if (epoch - best_epoch) >= max(epochs // 3, 1):
                print(f"[INFO] early stop at epoch {epoch + 1}")
                break
        print(f"[INFO] GAN training took {time.time() - t0:.1f}s")
        return history

    def generate(self, images_chlast: np.ndarray) -> np.ndarray:
        if self._eval is None:
            self._build()
        return np.asarray(
            self.generator.apply(self.state["g_params"], jnp.asarray(images_chlast))
        )

    def load(self, model_dir: str, which: str = "best"):
        mgr = ckpt_lib.CheckpointManager(os.path.join(model_dir, "G"), mode="min")
        restored = mgr.restore(self.state, which)
        if restored is None:
            raise FileNotFoundError(model_dir)
        self.state, meta = restored
        return meta
