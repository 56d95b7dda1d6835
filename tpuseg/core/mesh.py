"""Device mesh and sharding helpers — the communication layer of tpuseg.

The reference framework is single-process / single-GPU (no
``torch.distributed`` anywhere; `/root/reference/train.py:8` pins
``CUDA_VISIBLE_DEVICES='0'``).  The TPU-native rebuild makes a device mesh
the *default* execution substrate: data-parallel over the ``data`` axis,
optional channel sharding over ``model``, and spatial partitioning of 3D
volumes over ``space`` (see tpuseg.parallel.spatial).  Collectives (psum /
all_gather / ppermute) are inserted by XLA from NamedSharding annotations
and ride the ICI.
"""
from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPACE_AXIS = "space"


def make_mesh(
    data: int = -1,
    model: int = 1,
    space: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data","model","space") mesh.

    ``data=-1`` means "all remaining devices go to the data axis".
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * space) == 0, (n, model, space)
        data = n // (model * space)
    need = data * model * space
    assert need <= n, (data, model, space, n)
    arr = np.asarray(devices[:need]).reshape(data, model, space)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SPACE_AXIS))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    if device is None:
        device = jax.devices()[0]
    return make_mesh(1, 1, 1, devices=[device])


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, tree):
    """Device-put a host pytree with the batch axis sharded over `data`."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(_put, tree)


def param_sharding_rule_fn(mesh: Mesh, model_axis_min_size: int = 256):
    """Per-leaf tensor-parallel rule (see param_sharding_rules)."""
    model_n = mesh.shape[MODEL_AXIS]

    def rule(x):
        if model_n == 1 or x.ndim < 2:
            return NamedSharding(mesh, P())
        out_ch = x.shape[-1]
        if out_ch % model_n == 0 and out_ch >= model_axis_min_size:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return rule


def param_sharding_rules(mesh: Mesh, params, model_axis_min_size: int = 256):
    """Tensor-parallel sharding spec for a conv-net param pytree.

    Conv kernels in tpuseg are channels-last: ``(*window, in_ch, out_ch)``.
    We shard the *output-channel* dimension of large kernels over the
    ``model`` axis (XLA then inserts the all-gathers / reduce-scatters), and
    replicate everything small.  This is the TP component the reference
    lacks entirely (SURVEY.md §2.3).
    """
    return jax.tree_util.tree_map(
        param_sharding_rule_fn(mesh, model_axis_min_size), params
    )


@dataclasses.dataclass
class MeshContext:
    """Bundle of the mesh plus canonical shardings used by the Trainer."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def data(self, ndim: int) -> NamedSharding:
        return batch_sharding(self.mesh, ndim)

    @property
    def repl(self) -> NamedSharding:
        return replicated(self.mesh)

    @contextlib.contextmanager
    def activate(self):
        with self.mesh:
            yield
