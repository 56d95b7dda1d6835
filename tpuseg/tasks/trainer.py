"""Generic Trainer — ONE train loop replacing the reference's 12 copy-paste
Model classes (`/root/reference/model/modelUnet.py`, `modelVNet.py`,
`modelResNet.py` are ~95% identical; SURVEY.md §1).

TPU-native design decisions vs the reference hot loop
(`modelUnet.py:860-943`):
 * the whole per-batch body (forward + loss + grad + optimizer + metrics)
   is ONE jitted ``train_step`` with donated state — no per-batch H2D/D2H
   except the input batch itself;
 * data-parallelism is the default: batches are device_put with the batch
   axis sharded over the mesh ``data`` axis and XLA inserts the gradient
   all-reduce (psum over ICI);
 * dropout keys are derived per step by folding the step counter into a
   base key (no recompiles);
 * metrics are accumulated on device and fetched once per epoch;
 * checkpoints (best + latest, with optimizer state / step / PRNG) are
   written asynchronously — the reference only ever stores the best
   state_dict in place (`modelUnet.py:939-943`).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import checkpoint as ckpt_lib
from tpuseg.core import optim as optim_lib
from tpuseg.core.mesh import MeshContext, single_device_mesh, make_mesh
from tpuseg.core.prng import step_key


# The train state is a plain dict pytree (flax-serializable, shardable).
# The PRNG key is stored as raw uint32 key data so checkpoints serialize.
def make_train_state(params, opt_state, key, step=0):
    return {
        "params": params,
        "opt_state": opt_state,
        "key": jax.random.key_data(key),
        "step": jnp.asarray(step, jnp.int32),
    }


@dataclass
class TrainerConfig:
    epochs: int = 50
    lr: float = 1e-3
    optimizer: str = "adamw"  # reference 2D models use AdamW, 3D use Adam
    weight_decay: float = 1e-2
    grad_clip: Optional[float] = None
    ckpt_mode: str = "max"  # best = highest validation metric
    early_stop_patience: Optional[int] = None
    log_every: int = 0  # steps; 0 = epoch-level only
    donate_state: bool = True
    compute_dtype: Any = jnp.float32


class Trainer:
    """Task-parameterized trainer.

    ``apply_fn(params, batch, train, rng) -> (outputs, aux)`` where
    ``outputs`` feeds ``loss_fn(outputs, batch) -> scalar`` and
    ``metric_fn(outputs, batch) -> scalar``.
    """

    def __init__(
        self,
        apply_fn: Callable,
        loss_fn: Callable,
        metric_fn: Callable,
        params,
        config: TrainerConfig,
        mesh: Optional[MeshContext] = None,
        viz_fn: Optional[Callable] = None,
    ):
        self.apply_fn = apply_fn
        self.loss_fn = loss_fn
        self.metric_fn = metric_fn
        self.config = config
        self.mesh = mesh or MeshContext(single_device_mesh())
        self.viz_fn = viz_fn

        if config.optimizer == "adamw":
            tx = optim_lib.adamw(config.lr, weight_decay=config.weight_decay)
        elif config.optimizer == "adam":
            tx = optim_lib.adam(config.lr)
        elif config.optimizer == "sgd":
            tx = optim_lib.sgd(config.lr, momentum=0.9)
        else:
            raise ValueError(config.optimizer)
        if config.grad_clip:
            clip = optim_lib.clip_by_global_norm(config.grad_clip)
            base = tx
            tx = optim_lib.GradientTransformation(
                init=lambda p: (clip.init(p), base.init(p)),
                update=lambda g, s, p=None: _clipped_update(clip, base, g, s, p),
            )
        self.tx = tx

        key = jax.random.key(0)
        self.state = make_train_state(params, tx.init(params), key)
        # Multi-device placement: params/opt-state replicated (or channel-
        # sharded over the model axis for large kernels); XLA inserts the
        # gradient psum from the batch-axis input sharding.
        if self.mesh.mesh.devices.size > 1:
            from tpuseg.core.mesh import param_sharding_rule_fn

            rule = param_sharding_rule_fn(self.mesh.mesh)
            self.state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rule(x)), self.state
            )
        self._train_step = None
        self._eval_step = None

    # -------------------------------------------------------------- steps
    def _build_steps(self):
        tx = self.tx
        apply_fn, loss_fn, metric_fn = self.apply_fn, self.loss_fn, self.metric_fn
        compute_dtype = self.config.compute_dtype

        def cast_for_compute(tree):
            if compute_dtype == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        def train_step(state, batch):
            rng = step_key(jax.random.wrap_key_data(state["key"]), state["step"])

            def loss_of(params):
                # mixed precision: f32 master params, compute in
                # config.compute_dtype (e.g. bf16 — TPU-native)
                outputs = apply_fn(
                    cast_for_compute(params), cast_for_compute(batch), True, rng
                )
                outputs = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    outputs,
                )
                return loss_fn(outputs, batch), outputs

            (loss, outputs), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state["params"]
            )
            updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
            params = optim_lib.apply_updates(state["params"], updates)
            metric = metric_fn(outputs, batch)
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "key": state["key"],
                "step": state["step"] + 1,
            }
            return new_state, {"loss": loss, "metric": metric}

        def eval_step(state, batch):
            outputs = apply_fn(state["params"], batch, False, None)
            return {
                "loss": loss_fn(outputs, batch),
                "metric": metric_fn(outputs, batch),
                "outputs": outputs,
            }

        donate = (0,) if self.config.donate_state else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)

    # ---------------------------------------------------------------- fit
    def fit(
        self,
        train_batches: Callable[[], Iterable[dict]],
        val_batches: Callable[[], Iterable[dict]],
        model_dir: str,
        writer=None,
        resume: bool = False,
    ) -> Dict[str, list]:
        """Epoch loop; `train_batches`/`val_batches` are callables returning
        a fresh iterator of host batches per epoch."""
        os.makedirs(model_dir, exist_ok=True)
        if self._train_step is None:
            self._build_steps()
        manager = ckpt_lib.CheckpointManager(model_dir, mode=self.config.ckpt_mode)
        start_epoch = 0
        if resume:
            restored = manager.restore(self.state, "latest")
            if restored is not None:
                self.state, meta = restored
                start_epoch = int(meta.get("epoch", 0))
                print(f"[tpuseg] resumed from step {meta.get('step')} epoch {start_epoch}")

        if writer is None:
            writer = _make_writer(model_dir)

        history = {
            "train_loss": [], "train_accuracy": [],
            "valdation_loss": [], "valdation_accuracy": [],
        }
        best_epoch = start_epoch
        t0 = time.time()
        for epoch in range(start_epoch, self.config.epochs):
            te = time.time()
            # metrics accumulate as device scalars; ONE host fetch per epoch.
            # device transfer of batch i+1 overlaps step i (async dispatch).
            tr_loss = tr_met = None
            n = 0
            for dev_batch in self._prefetch_put(train_batches()):
                self.state, m = self._train_step(self.state, dev_batch)
                tr_loss = m["loss"] if tr_loss is None else tr_loss + m["loss"]
                tr_met = m["metric"] if tr_met is None else tr_met + m["metric"]
                n += 1
            tr_loss = float(tr_loss) / n if n else 0.0
            tr_met = float(tr_met) / n if n else 0.0

            va_loss = va_met = None
            vn = 0
            for i, batch in enumerate(val_batches()):
                dev_batch = self._put(batch)
                m = self._eval_step(self.state, dev_batch)
                va_loss = m["loss"] if va_loss is None else va_loss + m["loss"]
                va_met = m["metric"] if va_met is None else va_met + m["metric"]
                vn += 1
                if i == 0 and self.viz_fn is not None:
                    self.viz_fn(model_dir, epoch, m["outputs"], batch)
            va_loss = float(va_loss) / vn if vn else 0.0
            va_met = float(va_met) / vn if vn else 0.0

            history["train_loss"].append(tr_loss)
            history["train_accuracy"].append(tr_met)
            history["valdation_loss"].append(va_loss)
            history["valdation_accuracy"].append(va_met)
            print(
                f"[INFO] EPOCH: {epoch + 1}/{self.config.epochs}  "
                f"Train loss: {tr_loss:.5f}, Train accu: {tr_met:.5f}, "
                f"validation loss: {va_loss:.5f}, validation accu: {va_met:.5f}  "
                f"({time.time() - te:.1f}s)"
            )
            if writer is not None:
                writer.add_scalar("Train/Loss", tr_loss, epoch + 1)
                writer.add_scalar("Train/accu", tr_met, epoch + 1)
                writer.add_scalar("Valid/loss", va_loss, epoch + 1)
                writer.add_scalar("Valid/accu", va_met, epoch + 1)
                writer.flush()

            step = int(jax.device_get(self.state["step"]))
            if manager.maybe_save_best(self.state, step, va_met):
                best_epoch = epoch
            manager.save_latest(self.state, step, va_met, epoch=epoch + 1)
            manager.wait()

            patience = self.config.early_stop_patience
            if patience and (epoch - best_epoch) >= patience:
                print(f"[INFO] early stop at epoch {epoch + 1}")
                break
        print(f"[INFO] total time taken to train the model: {time.time() - t0:.2f}s")
        manager.wait()
        return history

    def fit_resilient(
        self,
        train_batches,
        val_batches,
        model_dir: str,
        max_restarts: int = 3,
        **kw,
    ):
        """Failure detection / elastic recovery (absent in the reference —
        a crash there loses everything but the best .pth, SURVEY.md §5):
        on any exception the run restarts from the `latest` checkpoint
        (params + optimizer + step + PRNG), up to `max_restarts` times."""
        attempt = 0
        while True:
            try:
                return self.fit(
                    train_batches, val_batches, model_dir,
                    resume=(attempt > 0) or kw.pop("resume", False), **kw,
                )
            except KeyboardInterrupt:
                raise
            except Exception as e:
                attempt += 1
                if attempt > max_restarts:
                    raise
                print(f"[tpuseg] training failed ({type(e).__name__}: {e}); "
                      f"restart {attempt}/{max_restarts} from latest checkpoint")

    # ------------------------------------------------------------- helpers
    def _put(self, batch):
        from tpuseg.core.mesh import shard_batch_pytree
        return shard_batch_pytree(self.mesh.mesh, batch)

    def _prefetch_put(self, batches):
        """One-batch lookahead: device_put(i+1) is dispatched while step i
        executes, hiding H2D behind compute."""
        pending = None
        for batch in batches:
            nxt = self._put(batch)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def predict_batch(self, batch):
        if self._eval_step is None:
            self._build_steps()
        return self._eval_step(self.state, self._put(batch))

    def load(self, model_dir: str, which: str = "best"):
        manager = ckpt_lib.CheckpointManager(model_dir, mode=self.config.ckpt_mode)
        restored = manager.restore(self.state, which)
        if restored is None:
            raise FileNotFoundError(f"no '{which}' checkpoint under {model_dir}")
        self.state, meta = restored
        return meta


def _clipped_update(clip, base, grads, state, params):
    clip_state, base_state = state
    grads, clip_state = clip.update(grads, clip_state, params)
    updates, base_state = base.update(grads, base_state, params)
    return updates, (clip_state, base_state)


def _make_writer(model_dir):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir=model_dir)
    except Exception:
        return None
