"""Tests for the in-repo optimizer library (tpuseg.core.optim)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import optim


def test_adam_converges_quadratic():
    opt = optim.adam(0.1)
    params = {"w": jnp.asarray([5.0, -3.0])}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["w"] - 1.0) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return optim.apply_updates(params, updates), state

    for _ in range(200):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params["w"]), [1.0, 1.0], atol=1e-2)


def test_adamw_decays_weights():
    # with zero gradient, adamw still shrinks params toward 0
    opt = optim.adamw(0.1, weight_decay=0.1)
    params = {"w": jnp.asarray([2.0])}
    state = opt.init(params)
    grads = {"w": jnp.asarray([0.0])}
    updates, state = opt.update(grads, state, params)
    params = optim.apply_updates(params, updates)
    assert float(params["w"][0]) < 2.0


def test_clip_by_global_norm():
    opt = optim.chain(optim.clip_by_global_norm(1.0), optim.scale_by_neg_lr(1.0))
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    grads = {"w": jnp.asarray([3.0, 4.0, 0.0])}  # norm 5
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(updates["w"])), 1.0, rtol=1e-5
    )


def test_step_decay_schedule():
    sched = optim.step_decay_schedule(1.0, step_size=10, gamma=0.5)
    assert float(sched(jnp.asarray(0.0))) == 1.0
    assert float(sched(jnp.asarray(10.0))) == 0.5
    assert float(sched(jnp.asarray(25.0))) == 0.25


def test_sgd_momentum_matches_closed_form():
    opt = optim.sgd(0.1, momentum=0.9)
    params = {"w": jnp.asarray([1.0])}
    state = opt.init(params)
    g = {"w": jnp.asarray([1.0])}
    # step1: trace=1, update=-0.1; step2: trace=1.9, update=-0.19
    updates, state = opt.update(g, state, params)
    np.testing.assert_allclose(float(updates["w"][0]), -0.1, rtol=1e-6)
    updates, state = opt.update(g, state, params)
    np.testing.assert_allclose(float(updates["w"][0]), -0.19, rtol=1e-6)
