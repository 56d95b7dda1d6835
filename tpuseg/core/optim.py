"""In-repo optimizer library (optax-style gradient transformations).

The reference delegates optimization to torch.optim (Adam at
`/root/reference/model/modelUnet.py:849`, AdamW at `:103`, and the GAN's
paired Adam(β1=0.5) at `/root/reference/model/modelPixel2PixelGAN.py:376`).
tpuseg implements the optimizers natively as pure pytree transforms so the
whole update fuses into the jitted train step on TPU.

API: ``opt = adamw(1e-3); state = opt.init(params);``
``updates, state = opt.update(grads, state, params);``
``params = apply_updates(params, updates)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]
ScalarOrSchedule = Union[float, Schedule]


@dataclasses.dataclass(frozen=True)
class GradientTransformation:
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple]


def _sched(lr: ScalarOrSchedule) -> Schedule:
    if callable(lr):
        return lr
    return lambda count: jnp.asarray(lr, jnp.float32)


def apply_updates(params, updates):
    return jax.tree_util.tree_map(
        lambda p, u: (p + u.astype(p.dtype)) if u is not None else p, params, updates
    )


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


# ---------------------------------------------------------------- schedules

def constant_schedule(value: float) -> Schedule:
    return lambda count: jnp.asarray(value, jnp.float32)


def step_decay_schedule(init_value: float, step_size: int, gamma: float) -> Schedule:
    """StepLR equivalent (`modelPixel2PixelGAN.py` uses StepLR(50, 0.5))."""
    def fn(count):
        k = jnp.floor(count / step_size)
        return jnp.asarray(init_value, jnp.float32) * (gamma ** k)
    return fn


def cosine_schedule(init_value: float, decay_steps: int, alpha: float = 0.0) -> Schedule:
    def fn(count):
        t = jnp.clip(count / decay_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.asarray(init_value, jnp.float32) * ((1 - alpha) * cos + alpha)
    return fn


def warmup_cosine_schedule(
    init_value: float, warmup_steps: int, decay_steps: int, alpha: float = 0.0
) -> Schedule:
    cos = cosine_schedule(init_value, max(decay_steps - warmup_steps, 1), alpha)
    def fn(count):
        warm = init_value * count / max(warmup_steps, 1)
        return jnp.where(count < warmup_steps, warm, cos(count - warmup_steps))
    return fn


# ------------------------------------------------------------ transformations

class ScaleByAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam(b1=0.9, b2=0.999, eps=1e-8) -> GradientTransformation:
    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32), state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, grads,
        )
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        return updates, ScaleByAdamState(count, mu, nu)

    return GradientTransformation(init, update)


class ScaleByScheduleState(NamedTuple):
    count: jnp.ndarray


def scale_by_neg_lr(lr: ScalarOrSchedule) -> GradientTransformation:
    sched = _sched(lr)

    def init(params):
        return ScaleByScheduleState(jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        step_lr = sched(state.count.astype(jnp.float32))
        updates = jax.tree_util.tree_map(lambda u: -step_lr * u, updates)
        return updates, ScaleByScheduleState(state.count + 1)

    return GradientTransformation(init, update)


def add_decayed_weights(weight_decay: float, mask_fn=None) -> GradientTransformation:
    def init(params):
        return ()

    def update(updates, state, params=None):
        assert params is not None, "weight decay needs params"
        def add(u, p):
            wd = weight_decay
            return u + wd * p.astype(jnp.float32)
        if mask_fn is None:
            updates = jax.tree_util.tree_map(add, updates, params)
        else:
            mask = mask_fn(params)
            updates = jax.tree_util.tree_map(
                lambda u, p, m: add(u, p) if m else u, updates, params, mask
            )
        return updates, state

    return GradientTransformation(init, update)


def clip_by_global_norm(max_norm: float) -> GradientTransformation:
    def init(params):
        return ()

    def update(updates, state, params=None):
        norm = global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
        return updates, state

    return GradientTransformation(init, update)


class TraceState(NamedTuple):
    trace: Any


def trace_momentum(momentum: float, nesterov: bool = False) -> GradientTransformation:
    def init(params):
        return TraceState(
            jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        )

    def update(updates, state, params=None):
        tr = jax.tree_util.tree_map(
            lambda t, u: momentum * t + u.astype(jnp.float32), state.trace, updates
        )
        if nesterov:
            updates = jax.tree_util.tree_map(
                lambda t, u: momentum * t + u.astype(jnp.float32), tr, updates
            )
        else:
            updates = tr
        return updates, TraceState(tr)

    return GradientTransformation(init, update)


def chain(*transforms: GradientTransformation) -> GradientTransformation:
    def init(params):
        return tuple(t.init(params) for t in transforms)

    def update(updates, state, params=None):
        new_state = []
        for t, s in zip(transforms, state):
            updates, s = t.update(updates, s, params)
            new_state.append(s)
        return updates, tuple(new_state)

    return GradientTransformation(init, update)


# ------------------------------------------------------------------ recipes

def adam(lr: ScalarOrSchedule, b1=0.9, b2=0.999, eps=1e-8) -> GradientTransformation:
    return chain(scale_by_adam(b1, b2, eps), scale_by_neg_lr(lr))


def adamw(
    lr: ScalarOrSchedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2, mask_fn=None
) -> GradientTransformation:
    """AdamW with decoupled decay — the reference 2D models' optimizer
    (`modelUnet.py:103` uses torch.optim.AdamW defaults: wd=1e-2)."""
    return chain(
        scale_by_adam(b1, b2, eps),
        add_decayed_weights(weight_decay, mask_fn),
        scale_by_neg_lr(lr),
    )


def sgd(lr: ScalarOrSchedule, momentum: float = 0.0, nesterov=False) -> GradientTransformation:
    if momentum:
        return chain(trace_momentum(momentum, nesterov), scale_by_neg_lr(lr))
    return chain(scale_by_neg_lr(lr))
