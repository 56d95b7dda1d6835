"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference is single-device (SURVEY.md §2.3 marks PP "absent");
tpuseg provides the TPU-native mechanism: stages live on successive
devices of a mesh axis, activations travel over ICI with
`jax.lax.ppermute`, and microbatches fill the pipeline so all stages
compute concurrently after the (S-1)-tick ramp-up.

Scope: stages with identical activation shapes (stacked residual blocks,
LUConv towers, transformer layers) — the standard case where PP pays off.
`pipeline_apply` runs T microbatches through S stages in T+S-1 ticks
inside one jitted shard_map.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def pipeline_apply(
    stage_fn: Callable,  # (stage_params, activation) -> activation
    stacked_params,      # pytree with leading stage axis S
    microbatches,        # (T, *batch_shape) — activation-shaped inputs
    mesh: Mesh,
    axis: str = "model",
):
    """Run microbatches through S pipeline stages sharded over `axis`."""
    n_stages = mesh.shape[axis]
    T = microbatches.shape[0]

    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis), stacked_params
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(params_shard, mb):
        s = jax.lax.axis_index(axis)
        local_params = jax.tree_util.tree_map(lambda p: p[0], params_shard)

        act0 = jnp.zeros_like(mb[0])
        outs0 = jnp.zeros_like(mb)

        def tick(t, carry):
            buf, outs = carry
            # stage 0 injects microbatch t; later stages use the buffer
            inject = jax.lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, T - 1), keepdims=False
            )
            x_in = jnp.where(s == 0, inject, buf)
            act = stage_fn(local_params, x_in)
            # last stage emits microbatch t-(S-1) once the pipe is full
            out_idx = jnp.clip(t - (n_stages - 1), 0, T - 1)
            is_emit = jnp.logical_and(s == n_stages - 1, t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, out_idx, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(is_emit, act, cur), out_idx, 0
            )
            # shift activations one stage to the right over ICI
            buf = jax.lax.ppermute(
                act, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return buf, outs

        _, outs = jax.lax.fori_loop(0, T + n_stages - 1, tick, (act0, outs0))
        # only the last stage holds real outputs; broadcast via psum of
        # the masked contribution
        outs = jnp.where(s == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    return run(stacked_params, microbatches)


def sequential_reference(stage_fn, stacked_params, microbatches):
    """Single-device reference: every microbatch through every stage."""
    n_stages = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

    def one(mb):
        act = mb
        for s in range(n_stages):
            params_s = jax.tree_util.tree_map(lambda p: p[s], stacked_params)
            act = stage_fn(params_s, act)
        return act

    return jax.vmap(one)(microbatches)
